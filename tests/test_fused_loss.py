"""Fused loss reductions: jnp reference path parity (CPU) incl. gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from theia_tpu.models.losses import cosine_loss, get_loss, mse_loss, smooth_l1_loss
from theia_tpu.ops.fused_loss import loss_sums_reference


def test_loss_sums_reference_reconstructs_losses():
    rng = np.random.RandomState(0)
    p = rng.randn(4, 2048).astype(np.float32)
    t = rng.randn(4, 2048).astype(np.float32)
    sums = np.asarray(loss_sums_reference(jnp.asarray(p), jnp.asarray(t)))
    d = p.shape[1]
    np.testing.assert_allclose(sums[:, 0].mean() / d, float(mse_loss(jnp.asarray(p), jnp.asarray(t))), rtol=1e-5)
    np.testing.assert_allclose(sums[:, 1].mean() / d, float(smooth_l1_loss(jnp.asarray(p), jnp.asarray(t))), rtol=1e-5)
    denom = np.maximum(np.sqrt(sums[:, 3]), 1e-12) * np.maximum(np.sqrt(sums[:, 4]), 1e-12)
    cos = np.mean(1.0 - sums[:, 2] / denom)
    np.testing.assert_allclose(cos, float(cosine_loss(jnp.asarray(p), jnp.asarray(t))), rtol=1e-5)


def test_get_loss_fused_flag_matches_unfused_on_cpu():
    """fused=True falls into the pallas path only on TPU; on CPU both flags
    must agree (fused auto-disables)."""
    rng = np.random.RandomState(1)
    preds = {"a": jnp.asarray(rng.randn(2, 256, 24).astype(np.float32))}
    tgts = {"a": jnp.asarray(rng.randn(2, 256, 24).astype(np.float32))}
    a = get_loss(preds, tgts, fused=False)
    b = get_loss(preds, tgts, fused=None)
    np.testing.assert_allclose(float(a["cos_loss"]), float(b["cos_loss"]), rtol=1e-6)


def test_fused_gradients_match_reference_math():
    """d(0.9cos+0.1l1)/dpred via the sums decomposition == direct autodiff."""
    rng = np.random.RandomState(2)
    p = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    t = jnp.asarray(rng.randn(3, 4096).astype(np.float32))

    def main_direct(p):
        return 0.9 * cosine_loss(p, t) + 0.1 * smooth_l1_loss(p, t)

    def main_sums(p):
        sums = loss_sums_reference(p, t)
        d = p.shape[1]
        l1 = jnp.mean(sums[:, 1]) / d
        denom = jnp.maximum(jnp.sqrt(sums[:, 3]), 1e-12) * jnp.maximum(jnp.sqrt(sums[:, 4]), 1e-12)
        cos = jnp.mean(1.0 - sums[:, 2] / denom)
        return 0.9 * cos + 0.1 * l1

    g1 = jax.grad(main_direct)(p)
    g2 = jax.grad(main_sums)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
