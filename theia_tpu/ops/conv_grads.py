"""Conv weight-gradients phrased as per-tap MXU dots.

The round-2 base trace showed XLA lowering the adapter-ladder conv/convT
weight-grads (3x3 kernels, 768x768 channels, 16/31/64 spatial) into VPU
``multiply_reduce`` fusions running at 130-190 GB/s — ~2.4x over the FLOP
floor (PERFORMANCE.md round-2c). A 3x3 weight-grad is 9 independent
channel-contraction matmuls

    dW[a,b,i,o] = sum_{n,p,q} x_pad[n, s*p+a, s*q+b, i] * dy[n,p,q,o]

each a [N*P*Q, I] x [N*P*Q, O] dot — ideal MXU shapes (big contraction,
128-multiple output dims). This module provides that formulation plus a
custom-VJP conv wrapper using it, gated by ``CONV_DW_IMPL`` so the choice
stays an A/B-able toggle (see benchmarks/probe_conv_dw.py).

Replaces the torch autograd conv backward the reference relies on
(reference: src/theia/models/adapter_heads.py ladders are plain
nn.Conv2d/ConvTranspose2d whose grads cuDNN picks per-algorithm; on TPU the
equivalent choice — MXU dots vs VPU reduce fusions — is made here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# "dots" = per-tap MXU dot weight-grads, "xla" = plain autodiff of
# lax.conv_general_dilated. Measured (benchmarks/probe_conv_dw.py A/B/A):
# dots LOSES at tiny C=192 (93.8 -> 99.5 ms: [192,192] dot outputs
# underfill the MXU and the 9 strided slices add traffic) and WINS at base
# C=768 (149.6 -> 148.1 ms), so "dots" only engages above _DOTS_MIN_CH
# channels; "xla"/"dots" force one path for A/B probes.
CONV_DW_IMPL = "auto"
_DOTS_MIN_CH = 512


def _use_dots(in_ch: int, out_ch: int) -> bool:
    if CONV_DW_IMPL == "auto":
        return min(in_ch, out_ch) >= _DOTS_MIN_CH
    return CONV_DW_IMPL == "dots"


def conv_dw_dots(
    lhs: jax.Array,
    dy: jax.Array,
    kh: int,
    kw: int,
    stride: int,
    pad_lo: int,
    pad_hi: int,
) -> jax.Array:
    """Weight-grad of y = conv_general_dilated(lhs, W, stride, pad) in NHWC.

    Args:
        lhs: conv input [N, H, W, I].
        dy: cotangent of the conv output [N, P, Q, O].
        kh/kw: kernel spatial dims.
        stride: spatial stride (same both dims).
        pad_lo/pad_hi: spatial padding (same both dims; pad_hi may be
            negative, as in the conv-transpose adjoint).

    Returns:
        dW [kh, kw, I, O], accumulated in f32, cast back to lhs.dtype.
    """
    n, _, _, i = lhs.shape
    _, p, q, o = dy.shape
    # pad exactly the window the taps will read (per spatial dim — the
    # extents differ for non-square inputs/kernels); lax.pad accepts
    # negative edge padding (crop), which the convT adjoint needs
    need_h = stride * (p - 1) + kh
    need_w = stride * (q - 1) + kw
    x_pad = lax.pad(
        lhs,
        jnp.zeros((), lhs.dtype),
        [(0, 0, 0), (pad_lo, need_h - lhs.shape[1] - pad_lo, 0),
         (pad_lo, need_w - lhs.shape[2] - pad_lo, 0), (0, 0, 0)],
    )
    del pad_hi  # implied by the output extent; kept in the signature for clarity
    taps = []
    for a in range(kh):
        for b in range(kw):
            sl = lax.slice(
                x_pad,
                (0, a, b, 0),
                (n, a + stride * (p - 1) + 1, b + stride * (q - 1) + 1, i),
                (1, stride, stride, 1),
            )
            taps.append(
                lax.dot_general(
                    sl,
                    dy,
                    ((((0, 1, 2), (0, 1, 2))), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    return jnp.stack(taps).reshape(kh, kw, i, o).astype(lhs.dtype)


def _conv_fwd(x, kernel, stride, padding):
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_nhwc(x, kernel, stride=1, padding=0):
    """NHWC conv whose weight-grad runs as per-tap MXU dots (CONV_DW_IMPL)."""
    return _conv_fwd(x, kernel, stride, padding)


def _conv2d_vjp_fwd(x, kernel, stride, padding):
    return _conv_fwd(x, kernel, stride, padding), (x, kernel)


def _conv2d_vjp_bwd(stride, padding, res, g):
    x, kernel = res
    # dx via the standard transpose rule (lhs-dilated conv custom-call)
    dx = jax.vjp(lambda xx: _conv_fwd(xx, kernel, stride, padding), x)[1](g)[0]
    if _use_dots(kernel.shape[2], kernel.shape[3]):
        dw = conv_dw_dots(
            x, g, kernel.shape[0], kernel.shape[1], stride, padding, padding
        )
    else:
        dw = jax.vjp(lambda w: _conv_fwd(x, w, stride, padding), kernel)[1](g)[0]
    return dx, dw


conv2d_nhwc.defvjp(_conv2d_vjp_fwd, _conv2d_vjp_bwd)
