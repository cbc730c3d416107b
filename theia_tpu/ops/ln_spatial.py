"""LayerNorm over a full (C,H,W) feature map with a custom MXU backward.

The adapter ladders normalize each sample's whole (C,H,W) map with a
per-element affine (reference: src/theia/models/adapter_heads.py:306,318,330).
Autodiff of that op emits two pathological reduction patterns on TPU:

  - the affine grads (dw, db) reduce over the BATCH dim of conv-ladder maps
    whose layout is batch-minor — the round-2 base trace shows these at
    ~150 GB/s ([64,31,31,768]: 4.2 + 3.8 ms/step vs ~0.5 ms roofline);
  - the per-sample sums reduce over all of H*W*C.

This custom VJP phrases all four reductions as dots so they run on the MXU
with f32 accumulation (strictly more accurate than autodiff's bf16 reduce):

  dw = ones[1,B] @ (g * xhat)[B,N]      db = ones[1,B] @ g[B,N]
  s1 = g[B,N] @ w[N,1]                  s2 = (g * xhat)[B,N] @ w[N,1]
  dx = r * (g*w - (s1 + xhat*s2)/N)

Round-2 measured the dots phrasing NEUTRAL: XLA's algebraic simplifier
rewrites dot(ones, X) back into reduces and then merges BOTH reduction
directions (affine grads over batch, per-sample sums over H*W*C) plus the
elementwise dx into one mega-fusion whose loop order thrashes — the round-3
base trace shows those tuple fusions at 133-150 GB/s moving ~3x the minimal
bytes ([64,31,31,768] affine-grad fusions: 4.1 ms vs ~0.3 ms roofline).

"islands" (round 3) keeps the same math but splits the backward into two
`optimization_barrier`-separated islands so XLA forms one clean fusion per
reduction direction, each streaming g/x once at full bandwidth:

  island A: dw, db  (reduce over the batch dim only)
  island B: s1, s2 -> dx  (per-sample reduce, then elementwise)

Toggle LNS_VJP: "islands" | "dots" | "auto" (plain autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LNS_VJP = "dots"


def ln_spatial(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float,
               dtype=jnp.bfloat16) -> jax.Array:
    """x: [B,H,W,C]; weight/bias: [H,W,C]; per-sample stats over (H,W,C)."""
    if LNS_VJP in ("dots", "islands"):
        return _ln_spatial_vjp(x, weight, bias, eps, dtype)
    return _ln_fwd_impl(x, weight, bias, eps, dtype)[0]


def _stats(x: jax.Array, eps: float):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
    var = mean_sq - jnp.square(mean)
    r = jax.lax.rsqrt(var + eps)
    return mean, r


def _ln_fwd_impl(x, weight, bias, eps, dtype):
    mean, r = _stats(x, eps)
    shift = mean.astype(dtype)
    scale = r.astype(dtype)
    y = (x.astype(dtype) - shift) * scale
    y = y * weight.astype(dtype) + bias.astype(dtype)
    return y, (mean, r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_spatial_vjp(x, weight, bias, eps, dtype):
    return _ln_fwd_impl(x, weight, bias, eps, dtype)[0]


def _ln_vjp_fwd(x, weight, bias, eps, dtype):
    y, (mean, r) = _ln_fwd_impl(x, weight, bias, eps, dtype)
    return y, (x, weight, mean, r)


def _ln_vjp_bwd(eps, dtype, res, g):
    if LNS_VJP == "islands":
        return _ln_vjp_bwd_islands(eps, dtype, res, g)
    x, weight, mean, r = res
    b = x.shape[0]
    n = x.size // b
    shift = mean.astype(dtype)
    scale = r.astype(dtype)
    xhat = (x.astype(dtype) - shift) * scale           # recomputed, elementwise
    g = g.astype(dtype)
    gx = g * xhat

    ones = jnp.ones((1, b), dtype)
    g2 = g.reshape(b, n)
    gx2 = gx.reshape(b, n)
    w1 = weight.astype(dtype).reshape(n, 1)

    # batch reductions on the MXU (f32 accumulation)
    dw = jnp.dot(ones, gx2, preferred_element_type=jnp.float32).reshape(x.shape[1:])
    db = jnp.dot(ones, g2, preferred_element_type=jnp.float32).reshape(x.shape[1:])
    # per-sample sums as matvecs with the affine weight
    s1 = jnp.dot(g2, w1, preferred_element_type=jnp.float32).reshape(b, 1, 1, 1)
    s2 = jnp.dot(gx2, w1, preferred_element_type=jnp.float32).reshape(b, 1, 1, 1)

    gw = g * weight.astype(dtype)
    corr = ((s1 / n).astype(dtype) + xhat * (s2 / n).astype(dtype))
    dx = (scale * (gw - corr)).astype(x.dtype)
    return dx, dw.astype(weight.dtype), db.astype(weight.dtype)


def _ln_vjp_bwd_islands(eps, dtype, res, g):
    x, weight, mean, r = res
    b = x.shape[0]
    n = x.size // b
    shift = mean.astype(dtype)
    scale = r.astype(dtype)
    g = g.astype(dtype)

    # island A: affine grads — reduce over batch ONLY. The barrier clones the
    # (x, g) reads so this island cannot multi-output-fuse with island B;
    # XLA forms one fusion streaming x/g once with a VMEM f32 accumulator.
    x_a, g_a = jax.lax.optimization_barrier((x, g))
    xhat_a = (x_a.astype(dtype) - shift) * scale
    dw = jnp.sum((g_a * xhat_a).astype(jnp.float32), axis=0)
    db = jnp.sum(g_a.astype(jnp.float32), axis=0)

    # island B: per-sample sums (reduce over H*W*C), then elementwise dx.
    xhat = (x.astype(dtype) - shift) * scale
    gw = g * weight.astype(dtype)
    s1 = jnp.sum(gw.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum((gw * xhat).astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
    corr = ((s1 / n).astype(dtype) + xhat * (s2 / n).astype(dtype))
    dx = (scale * (gw - corr)).astype(x.dtype)
    return dx, dw.astype(weight.dtype), db.astype(weight.dtype)


_ln_spatial_vjp.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
