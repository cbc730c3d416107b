"""Distillation losses as pure jnp functions (no host syncs).

Matches reference RobotVisionFM.get_loss (reference:
src/theia/models/rvfm.py:138-185): per-teacher MSE, SmoothL1 (beta=1) and
cosine-embedding loss (target=+1) on L2-normalized flattened features;
per-teacher weighting (uniform 1/N by default), cosine always weighted 1/N.
The main training loss is 0.9*cos + 0.1*l1 (or MSE)
(reference: src/theia/scripts/train/train_rvfm.py:119-122).

Unlike the reference, per-teacher scalars are returned as device values in a
metrics pytree (the reference calls .item() per teacher per step — a device
sync the TPU build eliminates; rvfm.py:174-176).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target), dtype=jnp.float32)


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    beta = jnp.asarray(beta, d.dtype)
    return jnp.mean(
        jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta), dtype=jnp.float32
    )


def cosine_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-12) -> jax.Array:
    """CosineEmbeddingLoss with target=+1 over flattened per-sample features.

    torch F.normalize(dim=1) uses norm clamped to eps; equivalent here as
    sum(p*t) / (max(|p|,eps) * max(|t|,eps)) — the dot form. Written this
    way all three reductions (p·t, p², t²) share ONE read pass over the big
    prediction maps; the normalize-then-reduce form needs a second pass
    because the product reduce depends on the completed norm reduce
    (measured: the loss section of the cddsv step is pass-count-bound,
    PERFORMANCE.md round-2c). Differs from the normalized form only in f32
    rounding (one division instead of two elementwise ones).
    """
    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    s_pt = jnp.sum(p * t, axis=1, dtype=jnp.float32)
    s_pp = jnp.sum(p * p, axis=1, dtype=jnp.float32)
    s_tt = jnp.sum(t * t, axis=1, dtype=jnp.float32)
    denom = jnp.maximum(jnp.sqrt(s_pp), eps) * jnp.maximum(jnp.sqrt(s_tt), eps)
    return jnp.mean(1.0 - s_pt / denom)


def _losses_fused(pred: jax.Array, target: jax.Array, eps: float = 1e-12):
    """(mse, l1, cos) via the one-pass Pallas reduction kernel (TPU)."""
    from theia_tpu.ops.fused_loss import loss_sums

    b = pred.shape[0]
    d = pred.reshape(b, -1).shape[1]
    sums = loss_sums(pred.reshape(b, -1), jax.lax.stop_gradient(target.reshape(b, -1)))
    mse = jnp.mean(sums[:, 0]) / d
    l1 = jnp.mean(sums[:, 1]) / d
    denom = jnp.maximum(jnp.sqrt(sums[:, 3]), eps) * jnp.maximum(jnp.sqrt(sums[:, 4]), eps)
    cos = jnp.mean(1.0 - sums[:, 2] / denom)
    return mse, l1, cos


def get_loss(
    pred_features: Mapping[str, jax.Array],
    targets: Mapping[str, jax.Array],
    target_loss_weights: Optional[Mapping[str, float] | float] = None,
    loss_masks: Optional[Mapping[str, jax.Array]] = None,
    fused: Optional[bool] = None,
    compute_dtype: Any = jnp.float32,
) -> dict[str, Any]:
    """Compute distillation loss terms for every predicted teacher.

    loss_masks: optional per-teacher scalar {0,1} multipliers — the
    branch-free TPU equivalent of the reference's `random_target_models`
    2-of-N teacher subsampling (train_rvfm.py:102-105): all heads compute,
    masked teachers contribute zero to the averaged losses.

    compute_dtype: elementwise dtype for the big per-teacher loss terms; all
    reductions accumulate in f32 either way. float32 (default) matches torch
    bit-for-bit tolerance (tests/test_losses.py); bfloat16 halves the HBM
    traffic of the loss section AND of the dL/dpred cotangents over the
    [B,4096,C] SAM/depth maps — a fast_math-class lever inside the <1e-3
    feature-MSE parity budget (loss values differ ~1e-3 relative,
    tests/test_losses.py::test_bf16_loss_close_to_f32).
    """
    names = list(pred_features.keys())
    n = len(names)
    mse_avg = jnp.zeros((), jnp.float32)
    cos_avg = jnp.zeros((), jnp.float32)
    l1_avg = jnp.zeros((), jnp.float32)
    mse_per, cos_per, l1_per = {}, {}, {}
    if loss_masks is not None:
        # normalizer = number of active teachers (matches the reference's
        # len(pred_features) when it only forwards the sampled subset)
        n_active = sum(jnp.asarray(loss_masks[t], jnp.float32) for t in names)
        n_active = jnp.maximum(n_active, 1.0)
    else:
        n_active = float(n)

    # fused=None -> False: the Pallas one-pass kernel measured SLOWER than
    # XLA's own reduce fusions at these shapes (92.5 -> 123 ms cddsv step);
    # kept as an opt-in (numerics exact, see tests)
    if fused is None:
        fused = False

    for t in names:
        pred = pred_features[t].astype(compute_dtype)
        target = targets[t].astype(compute_dtype)
        d_flat = pred.size // pred.shape[0]
        if fused and d_flat >= 1024 and d_flat % 128 == 0:
            mse, l1, cos = _losses_fused(pred, target)
        else:
            mse = mse_loss(pred, target)
            l1 = smooth_l1_loss(pred, target)
            cos = cosine_loss(pred, target)
        if target_loss_weights is None:
            weight = 1.0 / n_active
        elif isinstance(target_loss_weights, Mapping):
            weight = target_loss_weights[t]
        else:
            weight = target_loss_weights
        mask = 1.0 if loss_masks is None else jnp.asarray(loss_masks[t], jnp.float32)
        mse_avg = mse_avg + mse * weight * mask
        cos_avg = cos_avg + cos * mask / n_active  # cos always balanced (rvfm.py:171)
        l1_avg = l1_avg + l1 * weight * mask
        mse_per[t], cos_per[t], l1_per[t] = mse, cos, l1

    return {
        "mse_loss": mse_avg,
        "cos_loss": cos_avg,
        "l1_loss": l1_avg,
        "mse_losses_per_model": mse_per,
        "cos_losses_per_model": cos_per,
        "l1_losses_per_model": l1_per,
    }


def main_loss_from_terms(losses: Mapping[str, Any], main_loss: Optional[str]) -> jax.Array:
    """Reference main-loss selection (train_rvfm.py:119-122)."""
    if main_loss == "mse" or main_loss is None:
        return losses["mse_loss"]
    if main_loss == "cos_l1":
        return 0.9 * losses["cos_loss"] + 0.1 * losses["l1_loss"]
    raise NotImplementedError(f"main_loss {main_loss} is not implemented.")
