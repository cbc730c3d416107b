"""PyTorch-compatible 2D transposed convolution in NHWC for TPU.

The reference's adapter ladders rely on exact torch ConvTranspose2d output
shapes — e.g. 16->31 (k=3,s=2,p=1) then 31->64 (k=3,s=2,output_padding=1)
(reference: src/theia/models/adapter_heads.py:304-315) and the 14->16 pad
deconv (k=3,s=1) (adapter_heads.py:279-289). We reproduce
    out = (in - 1)*stride - 2*padding + kernel + output_padding
via lax.conv_general_dilated with input (lhs) dilation, which XLA lowers to
MXU-friendly convolutions on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# Backward implementation toggle (see _conv_transpose_custom_vjp below):
# "auto" = custom adjoint-based VJP, "xla" = plain autodiff of the dilated
# conv (whose rhs-grad rule reverses the full gradient activations — the
# ~2.5 ms/step `reverse` ops in the round-2 trace).
CONVT_VJP = "auto"

# Forward lowering toggle: "dilated" = lhs-dilated conv (XLA custom-call;
# computes ~4x the essential MACs on the dilation zeros at the s=2 ladder
# geometries), "classes" = stride-2 residue-class decomposition — four
# stride-1 convs doing only the essential MACs, interleaved by one
# stack+reshape pass (NOT the interior-pad+sum of _conv_transpose_subpixel,
# which writes 5x the output bytes and measured 17.5 -> 30.7 ms in the
# micro bench).
CONVT_FWD = "dilated"


def _class_taps(r: int, k: int, s: int, p: int) -> list[tuple[int, int]]:
    """Taps (a, d) of output class o%s==r: contribution x[j-d]*W[a] with
    d = (a - p - r)/s; sorted by d descending (kernel index t <-> dmax-t)."""
    taps = [(a, (a - p - r) // s) for a in range(k) if (a - p) % s == r % s]
    taps.sort(key=lambda ad: -ad[1])
    return taps


def _conv_transpose_s2_classes(
    x: jax.Array,
    kernel: jax.Array,
    padding: int,
    output_padding: int,
    preferred_element_type: jnp.dtype | None = None,
) -> jax.Array:
    """Stride-2 transposed conv as 4 residue-class stride-1 convs + one
    interleave reshape: y[n, 2j+rh, 2k+rw, :] = cls[rh][rw][n, j, k, :]."""
    s = 2
    kh, kw = kernel.shape[0], kernel.shape[1]
    n_h, n_w = x.shape[1], x.shape[2]
    m_h = (n_h - 1) * s - 2 * padding + kh + output_padding
    m_w = (n_w - 1) * s - 2 * padding + kw + output_padding
    mm_h = (m_h + 1) // 2
    mm_w = (m_w + 1) // 2

    rows = []
    for r_h in (0, 1):
        taps_h = _class_taps(r_h, kh, s, padding)
        cnt_h = (m_h - r_h + 1) // 2
        cols = []
        for r_w in (0, 1):
            taps_w = _class_taps(r_w, kw, s, padding)
            cnt_w = (m_w - r_w + 1) // 2
            sub = kernel[np.array([a for a, _ in taps_h])][
                :, np.array([a for a, _ in taps_w])
            ]
            y = lax.conv_general_dilated(
                x,
                sub,
                window_strides=(1, 1),
                padding=(
                    (taps_h[0][1], cnt_h - n_h - taps_h[-1][1]),
                    (taps_w[0][1], cnt_w - n_w - taps_w[-1][1]),
                ),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=preferred_element_type,
            )
            if cnt_h < mm_h or cnt_w < mm_w:
                y = lax.pad(
                    y,
                    jnp.zeros((), y.dtype),
                    [(0, 0, 0), (0, mm_h - cnt_h, 0), (0, mm_w - cnt_w, 0), (0, 0, 0)],
                )
            cols.append(y)
        rows.append(jnp.stack(cols, axis=3))      # [N, mm_h, mm_w, 2, C]
    t = jnp.stack(rows, axis=2)                    # [N, mm_h, 2(rh), mm_w, 2(rw), C]
    y = t.reshape(x.shape[0], 2 * mm_h, 2 * mm_w, t.shape[-1])
    return y[:, :m_h, :m_w]


def conv_transpose_2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    preferred_element_type: jnp.dtype | None = None,
    subpixel: bool = False,
) -> jax.Array:
    """Transposed conv with torch semantics.

    Args:
        x: NHWC input.
        kernel: HWIO layout, (kh, kw, in_ch, out_ch) — i.e. the torch weight
            (in_ch, out_ch, kh, kw) transposed to (2, 3, 0, 1).
        stride/padding/output_padding: torch ConvTranspose2d params.
        subpixel: use the s^2-subkernel decomposition. Measured on v5e: the
            decomposition LOSES to XLA's dilated lowering at the theia ladder
            shapes (many small odd-sized convs underutilize the MXU more than
            the dilated zeros waste), so the default is False; kept as an
            option for other geometries.

    Returns:
        NHWC output of spatial size (in-1)*stride - 2*padding + k + output_padding.
    """
    if stride > 1 and subpixel:
        return _conv_transpose_subpixel(
            x, kernel, stride, padding, output_padding, preferred_element_type
        )
    if CONVT_VJP == "auto" and preferred_element_type is None:
        return _convt_vjp(x, kernel, stride, padding, output_padding)
    return _convt_fwd_impl(x, kernel, stride, padding, output_padding, preferred_element_type)


def _convt_fwd_impl(
    x: jax.Array,
    kernel: jax.Array,
    stride: int,
    padding: int,
    output_padding: int,
    preferred_element_type: jnp.dtype | None = None,
) -> jax.Array:
    if CONVT_FWD == "classes" and stride == 2:
        return _conv_transpose_s2_classes(
            x, kernel, padding, output_padding, preferred_element_type
        )
    kh, kw = kernel.shape[0], kernel.shape[1]
    # transposed conv == conv over input dilated by `stride`, with the kernel
    # spatially flipped, pad (k-1-p) low / (k-1-p+output_padding) high.
    kernel = kernel[::-1, ::-1, :, :]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )


def _adjoint_conv(z: jax.Array, kernel: jax.Array, stride: int, padding: int,
                  output_padding: int) -> jax.Array:
    """The REGULAR strided conv whose input-gradient is conv_transpose_2d:
    torch's ConvTranspose2d(x, W) is by definition the input-grad of
    Conv2d(·, W, stride, padding); with our HWIO kernel (in=x-ch, out=y-ch)
    that conv contracts y channels, i.e. uses kernel transposed on I/O.
    The high-side padding is p - output_padding (may be negative; XLA convs
    accept negative padding)."""
    pad = (padding, padding - output_padding)
    return lax.conv_general_dilated(
        z,
        jnp.transpose(kernel, (0, 1, 3, 2)),
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _convt_vjp(x, kernel, stride, padding, output_padding):
    return _convt_fwd_impl(x, kernel, stride, padding, output_padding)


def _convt_vjp_fwd(x, kernel, stride, padding, output_padding):
    return _convt_fwd_impl(x, kernel, stride, padding, output_padding), (x, kernel)


def _convt_vjp_bwd(stride, padding, output_padding, res, g):
    """Adjoint-based backward: both grads route through REGULAR-conv
    lowerings instead of jax's lhs-dilated transpose rules, whose rhs-grad
    reverses the full gradient activations (~2.5 ms/step of pure copies in
    the round-2 trace).

    With A_W = the regular conv (see _adjoint_conv), convtranspose = A_W^T:
      dx = A_W g                         (a plain strided conv of g)
      dW = weight-grad of A_W at input g with output-cotangent x
    """
    x, kernel = res
    dx = _adjoint_conv(g, kernel, stride, padding, output_padding)
    from theia_tpu.ops import conv_grads

    if conv_grads._use_dots(kernel.shape[2], kernel.shape[3]):
        # per-tap MXU dots instead of the conv-weight-grad lowering
        # (see ops/conv_grads.py); the adjoint conv pads (p, p - op)
        dw_swapped = conv_grads.conv_dw_dots(
            g, x, kernel.shape[0], kernel.shape[1], stride,
            padding, padding - output_padding,
        )
        return dx, jnp.transpose(dw_swapped, (0, 1, 3, 2))
    w_swapped = jnp.transpose(kernel, (0, 1, 3, 2))

    def conv_w(w):
        pad = (padding, padding - output_padding)
        return lax.conv_general_dilated(
            g, w, window_strides=(stride, stride), padding=(pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, wgrad = jax.vjp(conv_w, w_swapped)
    (dw_swapped,) = wgrad(x)
    return dx, jnp.transpose(dw_swapped, (0, 1, 3, 2))


_convt_vjp.defvjp(_convt_vjp_fwd, _convt_vjp_bwd)


def _class_spec(c: int, k: int, s: int, p: int, m: int) -> tuple[list[int], int, int]:
    """1D residue-class spec for the subpixel decomposition.

    Output o takes taps r with (o + p) % s == r % s == c; i = (o + p - r)/s.
    Returns (tap r-values, first output index of this class, output count)."""
    rs = list(range(c, k, s))
    o_first = (c - p) % s
    count = max(0, (m - o_first + s - 1) // s)
    return rs, o_first, count


def _conv_transpose_subpixel(
    x: jax.Array,
    kernel: jax.Array,
    s: int,
    p: int,
    op: int,
    preferred_element_type: jnp.dtype | None,
) -> jax.Array:
    kh, kw, cin, cout = kernel.shape
    n_h, n_w = x.shape[1], x.shape[2]
    m_h = (n_h - 1) * s - 2 * p + kh + op
    m_w = (n_w - 1) * s - 2 * p + kw + op

    pieces = []
    for ch in range(s):
        rs_h, oh0, cnt_h = _class_spec(ch, kh, s, p, m_h)
        if not rs_h or cnt_h == 0:
            continue
        for cw in range(s):
            rs_w, ow0, cnt_w = _class_spec(cw, kw, s, p, m_w)
            if not rs_w or cnt_w == 0:
                continue
            # sub-kernel reversed for correlation form: y[q] = sum_u x[q-u] W[c+s u]
            sub = kernel[rs_h, :, :, :][:, rs_w, :, :][::-1, ::-1]
            kc_h, kc_w = len(rs_h), len(rs_w)
            q0_h = (oh0 + p - ch) // s
            q0_w = (ow0 + p - cw) // s
            a_h = kc_h - 1 - q0_h
            a_w = kc_w - 1 - q0_w
            b_h = cnt_h - 1 + kc_h - a_h - n_h
            b_w = cnt_w - 1 + kc_w - a_w - n_w
            y = lax.conv_general_dilated(
                x,
                sub,
                window_strides=(1, 1),
                padding=((a_h, b_h), (a_w, b_w)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=preferred_element_type,
            )
            # place this class at out[oh0::s, ow0::s] via interior padding
            pad_cfg = [
                (0, 0, 0),
                (oh0, m_h - oh0 - (cnt_h - 1) * s - 1, s - 1),
                (ow0, m_w - ow0 - (cnt_w - 1) * s - 1, s - 1),
                (0, 0, 0),
            ]
            pieces.append(lax.pad(y, jnp.zeros((), y.dtype), pad_cfg))
    out = pieces[0]
    for piece in pieces[1:]:
        out = out + piece
    return out
