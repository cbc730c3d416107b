"""Fused distillation-loss reductions (Pallas TPU kernel).

The distillation loss needs, per teacher, five per-sample reductions over
the flattened features: sum((p-t)^2), smooth-L1 sum, <p,t>, ||p||^2 and
||t||^2 (mse / smoothL1 / cosine are scalar functions of these —
reference math at src/theia/models/rvfm.py:138-185). The XLA lowering reads
pred/target several times across separate reduce fusions; this kernel
produces all five in ONE pass over [B, R, 128]-tiled features, and the
custom backward produces d(pred) in one more pass (targets carry no
gradient).

Falls back to plain jnp off-TPU or for feature dims not divisible by 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128


def _fwd_kernel(p_ref, t_ref, out_ref, *, beta: float):
    import jax.experimental.pallas as pl

    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    d = p - t
    ad = jnp.abs(d)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sums = [
        jnp.sum(d * d),
        jnp.sum(jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)),
        jnp.sum(p * t),
        jnp.sum(p * p),
        jnp.sum(t * t),
    ]
    # scalar VMEM stores are unsupported: scatter the 5 sums into lane slots
    # of an (8, LANE) block via one-hot masks
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    block = jnp.zeros((8, LANE), jnp.float32)
    for i, s in enumerate(sums):
        block = block + jnp.where((sub == 0) & (lane == i), s, 0.0)
    out_ref[0] += block


def _bwd_kernel(p_ref, t_ref, g_ref, dp_ref, *, beta: float):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    d = p - t
    grow = g_ref[i]  # (LANE,) f32; first 4 lanes hold the sum cotangents
    dp = (
        grow[0] * 2.0 * d
        + grow[1] * jnp.clip(d / beta, -1.0, 1.0)
        + grow[2] * t
        + grow[3] * 2.0 * p
    )
    dp_ref[0] = dp.astype(dp_ref.dtype)


def _row_block(rows: int) -> int:
    rb = min(rows, 1024)
    while rows % rb:
        rb //= 2
    return max(rb, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def loss_sums(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """[B, D] pred/target (D % 128 == 0) ->
    [B, 5] f32 (sq_diff, smooth_l1, dot, p_sq, t_sq)."""
    return _loss_sums_fwd(pred, target, beta)[0]


def _loss_sums_impl(pred, target, beta):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = pred.shape
    rows = d // LANE
    rb = _row_block(rows)
    nb = rows // rb
    p3 = pred.reshape(b, rows, LANE)
    t3 = target.reshape(b, rows, LANE)
    in_spec = pl.BlockSpec((1, rb, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, beta=beta),
        grid=(b, nb),
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * d, bytes_accessed=2 * b * d * pred.dtype.itemsize, transcendentals=0
        ),
    )(p3, t3)
    return out[:, 0, :5]


def _loss_sums_fwd(pred, target, beta):
    return _loss_sums_impl(pred, target, beta), (pred, target)


def _loss_sums_bwd(beta, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pred, target = res
    b, d = pred.shape
    rows = d // LANE
    rb = _row_block(rows)
    nb = rows // rb
    p3 = pred.reshape(b, rows, LANE)
    t3 = target.reshape(b, rows, LANE)
    gpad = jnp.zeros((b, LANE), jnp.float32).at[:, :5].set(g.astype(jnp.float32))
    in_spec = pl.BlockSpec((1, rb, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((b, LANE), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    dp = pl.pallas_call(
        functools.partial(_bwd_kernel, beta=beta),
        grid=(b, nb),
        in_specs=[in_spec, in_spec, g_spec],
        out_specs=in_spec,
        out_shape=jax.ShapeDtypeStruct(p3.shape, pred.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * d, bytes_accessed=3 * b * d * pred.dtype.itemsize, transcendentals=0
        ),
    )(p3, t3, gpad)
    return dp.reshape(b, d), None


loss_sums.defvjp(_loss_sums_fwd, _loss_sums_bwd)


def loss_sums_reference(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Plain jnp equivalent (used off-TPU and in tests)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    d = p - t
    ad = jnp.abs(d)
    return jnp.stack(
        [
            jnp.sum(d * d, axis=1),
            jnp.sum(jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta), axis=1),
            jnp.sum(p * t, axis=1),
            jnp.sum(p * p, axis=1),
            jnp.sum(t * t, axis=1),
        ],
        axis=1,
    )
