"""Pallas backward for LayerNormSpatial (per-sample LN over a (H,W,C) map).

Autodiff of this op on the conv-ladder maps emits one mega-fusion per site
computing the per-sample sums, dx, and the affine grads in a single pass
that runs at ~150 GB/s at theia-base shapes ([64,64,64,768]:
multiply_reduce_fusion.8/.10 at 4.1 ms/step each vs a ~1.5 ms byte floor;
PERFORMANCE.md round-2c). This splits the backward into two chunked Pallas
kernels that each stream the maps at HBM rate:

  K_stats: one pass over (g, x) computing, per sample, s1 = sum(g*w),
           s2 = sum(g*w*xhat) (VMEM accumulators across row-chunk grid
           steps) and the batch-reduced affine grads dw, db (final per
           chunk — each block holds ALL samples for its rows).
  K_dx:    second pass emitting dx = r*(g*w - (s1 + xhat*s2)/N).

The kernels run in the [S, B, C] view (S = H*W): XLA lays the ladder maps
out batch-minor ({3,0,2,1}), so the transposes at the op boundary are
layout bitcasts, not copies (the first [B,S,C]-view attempt measured 2.2 ms
faster kernels but lost 2.4 ms to boundary relayout copies — see
PERFORMANCE.md). The forward stays plain jnp so XLA keeps fusing the stats
epilogue into the producing conv-transpose. Off-TPU, or when C is not a
multiple of 128, falls back to the plain-jnp backward math.

Replaces the torch autograd LayerNorm backward the reference relies on
(reference: src/theia/models/adapter_heads.py:306,318,330).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# "pallas" = chunked Pallas backward (TPU only), "xla" = plain autodiff.
LN_BWD_IMPL = "pallas"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _chunk_rows(s: int, b: int, c: int, limit: int = 1024 * 1024) -> int | None:
    """Largest 8-divisible divisor of s whose [chunk, b, c] bf16 block fits
    the budget (sublane alignment for the 2D (chunk, c) affine-grad blocks)."""
    best = None
    for ch in range(8, s + 1, 8):
        if s % ch == 0 and ch * b * c * 2 <= limit:
            best = ch
    return best


def _stats_kernel(g_ref, x_ref, w_ref, mu_ref, inv_ref,
                  s1_ref, s2_ref, dw_ref, db_ref, s1_acc, s2_acc):
    import jax.experimental.pallas as pl

    ck = pl.program_id(0)
    ncs = pl.num_programs(0)
    # elementwise in bf16 (the autodiff path's elementwise ops are bf16
    # too), reductions accumulate in f32; keeps kernel temporaries within
    # the 16 MB scoped-VMEM budget
    g = g_ref[...]                          # [CH, B, C] bf16
    x = x_ref[...]
    w = w_ref[...][:, None, :]              # [CH, 1, C] bf16
    mu = mu_ref[...].astype(g.dtype)        # [1, B, 1]
    inv = inv_ref[...].astype(g.dtype)
    xh = (x - mu) * inv
    gw = g * w
    gx = g * xh

    p1 = jnp.sum(gw.astype(jnp.float32), axis=(0, 2), keepdims=True)
    p2 = jnp.sum((gx * w).astype(jnp.float32), axis=(0, 2), keepdims=True)
    prev1 = jnp.where(ck == 0, jnp.zeros_like(p1), s1_acc[...])
    prev2 = jnp.where(ck == 0, jnp.zeros_like(p2), s2_acc[...])
    s1_acc[...] = prev1 + p1
    s2_acc[...] = prev2 + p2

    dw_ref[...] = jnp.sum(gx.astype(jnp.float32), axis=1)
    db_ref[...] = jnp.sum(g.astype(jnp.float32), axis=1)

    @pl.when(ck == ncs - 1)
    def _():
        s1_ref[...] = s1_acc[...]
        s2_ref[...] = s2_acc[...]


def _dx_kernel(g_ref, x_ref, w_ref, mu_ref, inv_ref, s1_ref, s2_ref, dx_ref,
               *, inv_n: float):
    g = g_ref[...]
    x = x_ref[...]
    w = w_ref[...][:, None, :]
    dt = g.dtype
    mu = mu_ref[...].astype(dt)
    inv = inv_ref[...].astype(dt)
    s1 = (s1_ref[...] * inv_n).astype(dt)
    s2 = (s2_ref[...] * inv_n).astype(dt)
    xh = (x - mu) * inv
    dx = inv * (g * w - (s1 + xh * s2))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _bwd_kernels(g, x, w_sc, mean, r, ch, n):
    """g, x: [S, B, C] (S possibly zero-padded); w_sc: [S, C];
    mean/r: [1, B, 1] f32; n = true per-sample element count."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, bsz, c = x.shape
    ncs = s // ch
    # the bf16 block temporaries exceed Mosaic's default 16M scoped budget
    # at awkward chunkings (e.g. S=961 only divides into 31-row chunks)
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    map_spec = lambda: pl.BlockSpec((ch, bsz, c), lambda ck: (ck, 0, 0),
                                    memory_space=pltpu.VMEM)
    w_spec = lambda: pl.BlockSpec((ch, c), lambda ck: (ck, 0),
                                  memory_space=pltpu.VMEM)
    bvec_spec = lambda: pl.BlockSpec((1, bsz, 1), lambda ck: (0, 0, 0),
                                     memory_space=pltpu.VMEM)

    s1, s2, dw, db = pl.pallas_call(
        _stats_kernel,
        grid=(ncs,),
        in_specs=[map_spec(), map_spec(), w_spec(), bvec_spec(), bvec_spec()],
        out_specs=[bvec_spec(), bvec_spec(), w_spec(), w_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((1, bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, c), jnp.float32),
            jax.ShapeDtypeStruct((s, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, bsz, 1), jnp.float32),
            pltpu.VMEM((1, bsz, 1), jnp.float32),
        ],
        compiler_params=params,
    )(g, x, w_sc, mean, r)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, inv_n=1.0 / n),
        grid=(ncs,),
        in_specs=[map_spec(), map_spec(), w_spec(), bvec_spec(), bvec_spec(),
                  bvec_spec(), bvec_spec()],
        out_specs=map_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=params,
    )(g, x, w_sc, mean, r, s1, s2)
    return dx, dw, db


# ---------------------------------------------------------------------------
# public op: plain-jnp forward, Pallas backward
# ---------------------------------------------------------------------------


def _fwd_impl(x, weight, bias, eps, dtype):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
    var = mean_sq - jnp.square(mean)
    r = jax.lax.rsqrt(var + eps)
    y = (x.astype(dtype) - mean.astype(dtype)) * r.astype(dtype)
    y = y * weight.astype(dtype) + bias.astype(dtype)
    return y, (mean, r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ln_spatial_pallas(x, weight, bias, eps, dtype=jnp.bfloat16):
    """x: [B,H,W,C]; weight/bias: [H,W,C] (already transposed from (C,H,W))."""
    return _fwd_impl(x, weight, bias, eps, dtype)[0]


def _vjp_fwd(x, weight, bias, eps, dtype):
    y, (mean, r) = _fwd_impl(x, weight, bias, eps, dtype)
    return y, (x, weight, mean, r)


def _autodiff_bwd(x, weight, mean, r, eps, dtype, g):
    """Reference backward (same math as autodiff of _fwd_impl, f32)."""
    bsz = x.shape[0]
    n = x.size // bsz
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    xh = (xf - mean) * r
    gw = gf * wf
    s1 = jnp.sum(gw, axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum(gw * xh, axis=(1, 2, 3), keepdims=True)
    dx = (r * (gw - (s1 + xh * s2) / n)).astype(x.dtype)
    dw = jnp.sum(gf * xh, axis=0)
    db = jnp.sum(gf, axis=0)
    return dx, dw.astype(weight.dtype), db.astype(weight.dtype)


def _vjp_bwd(eps, dtype, res, g):
    x, weight, mean, r = res
    bsz, h, w_, c = x.shape
    s = h * w_
    s_pad = -(-s // 8) * 8  # zero rows are no-ops for every reduction
    ch = _chunk_rows(s_pad, bsz, c)
    if (
        LN_BWD_IMPL != "pallas"
        or not _on_tpu()
        or ch is None
        or c % 128 != 0
        or bsz % 16 != 0
    ):
        return _autodiff_bwd(x, weight, mean, r, eps, dtype, g)
    # [S, B, C] view: bitcast-compatible with the maps' batch-minor layout
    pad3 = [(0, s_pad - s), (0, 0), (0, 0)]
    g3 = jnp.pad(g.reshape(bsz, s, c).transpose(1, 0, 2), pad3)
    x3 = jnp.pad(x.reshape(bsz, s, c).transpose(1, 0, 2), pad3)
    w2 = jnp.pad(weight.reshape(s, c).astype(x.dtype), [(0, s_pad - s), (0, 0)])
    dx, dw, db = _bwd_kernels(
        g3, x3, w2,
        mean.reshape(1, bsz, 1),
        r.reshape(1, bsz, 1),
        ch,
        s * c,
    )
    return (
        dx[:s].transpose(1, 0, 2).reshape(x.shape),
        dw[:s].reshape(h, w_, c).astype(weight.dtype),
        db[:s].reshape(h, w_, c).astype(weight.dtype),
    )


ln_spatial_pallas.defvjp(_vjp_fwd, _vjp_bwd)
