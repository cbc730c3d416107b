"""Loss parity vs the exact torch losses the reference uses
(reference: src/theia/models/rvfm.py:71-74,138-185)."""

import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

from theia_tpu.models.losses import cosine_loss, get_loss, main_loss_from_terms, mse_loss, smooth_l1_loss


def _pairs(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "t/a": (rng.randn(4, 256, 24).astype(np.float32), rng.randn(4, 256, 24).astype(np.float32)),
        "t/b": (rng.randn(4, 4096, 12).astype(np.float32), rng.randn(4, 4096, 12).astype(np.float32)),
        "t/a_cls": (rng.randn(4, 24).astype(np.float32), rng.randn(4, 24).astype(np.float32)),
    }


def _torch_losses(pred, target):
    p, t = torch.from_numpy(pred), torch.from_numpy(target)
    mse = torch.nn.MSELoss()(p, t).item()
    l1 = torch.nn.SmoothL1Loss()(p, t).item()
    pn = F.normalize(p.flatten(start_dim=1), dim=1, p=2)
    tn = F.normalize(t.flatten(start_dim=1), dim=1, p=2)
    ones = torch.ones(p.size(0), dtype=torch.int)
    cos = torch.nn.CosineEmbeddingLoss()(pn, tn, ones).item()
    return mse, l1, cos


def test_individual_losses_match_torch():
    for name, (p, t) in _pairs().items():
        mse, l1, cos = _torch_losses(p, t)
        np.testing.assert_allclose(float(mse_loss(jnp.asarray(p), jnp.asarray(t))), mse, rtol=1e-5)
        np.testing.assert_allclose(float(smooth_l1_loss(jnp.asarray(p), jnp.asarray(t))), l1, rtol=1e-5)
        np.testing.assert_allclose(float(cosine_loss(jnp.asarray(p), jnp.asarray(t))), cos, rtol=1e-5, atol=1e-7)


def test_get_loss_aggregation_matches_reference_math():
    pairs = _pairs(1)
    preds = {k: jnp.asarray(v[0]) for k, v in pairs.items()}
    targets = {k: jnp.asarray(v[1]) for k, v in pairs.items()}
    out = get_loss(preds, targets)

    n = len(pairs)
    want_mse = want_l1 = want_cos = 0.0
    for k, (p, t) in pairs.items():
        mse, l1, cos = _torch_losses(p, t)
        want_mse += mse / n
        want_l1 += l1 / n
        want_cos += cos / n
        np.testing.assert_allclose(float(out["mse_losses_per_model"][k]), mse, rtol=1e-5)
    np.testing.assert_allclose(float(out["mse_loss"]), want_mse, rtol=1e-5)
    np.testing.assert_allclose(float(out["l1_loss"]), want_l1, rtol=1e-5)
    np.testing.assert_allclose(float(out["cos_loss"]), want_cos, rtol=1e-5)

    main = main_loss_from_terms(out, "cos_l1")
    np.testing.assert_allclose(float(main), 0.9 * want_cos + 0.1 * want_l1, rtol=1e-5)
    np.testing.assert_allclose(float(main_loss_from_terms(out, "mse")), want_mse, rtol=1e-5)


def test_loss_masks_subsample_teachers():
    """Branch-free equivalent of random_target_models (train_rvfm.py:102-105):
    masking all but 2 teachers must equal computing with only those 2."""
    pairs = _pairs(2)
    names = list(pairs)
    preds = {k: jnp.asarray(v[0]) for k, v in pairs.items()}
    targets = {k: jnp.asarray(v[1]) for k, v in pairs.items()}
    active = names[:2]
    masks = {k: jnp.asarray(1.0 if k in active else 0.0) for k in names}
    masked = get_loss(preds, targets, loss_masks=masks)
    only = get_loss({k: preds[k] for k in active}, {k: targets[k] for k in active})
    for key in ("mse_loss", "cos_loss", "l1_loss"):
        np.testing.assert_allclose(float(masked[key]), float(only[key]), rtol=1e-5)


def test_bf16_loss_close_to_f32():
    """compute_dtype=bf16 (fast_math-class lever, VERDICT r3 #1b): loss terms
    stay within bf16 elementwise rounding of the f32 values — reductions
    accumulate f32 either way, only the per-element products/diffs round."""
    pairs = _pairs(2)
    preds = {k: jnp.asarray(v[0]) for k, v in pairs.items()}
    targets = {k: jnp.asarray(v[1]) for k, v in pairs.items()}
    f32 = get_loss(preds, targets)
    b16 = get_loss(preds, targets, compute_dtype=jnp.bfloat16)
    for key in ("mse_loss", "cos_loss", "l1_loss"):
        np.testing.assert_allclose(float(b16[key]), float(f32[key]), rtol=2e-2, atol=1e-4)
    # gradient w.r.t. predictions also stays close (this is the cotangent
    # that flows into the translator-head backward)
    import jax

    def loss_of(p, dt):
        out = get_loss({"t/a": p}, {"t/a": targets["t/a"]}, compute_dtype=dt)
        return 0.9 * out["cos_loss"] + 0.1 * out["l1_loss"]

    g32 = jax.grad(lambda p: loss_of(p, jnp.float32))(preds["t/a"])
    g16 = jax.grad(lambda p: loss_of(p, jnp.bfloat16))(preds["t/a"])
    denom = np.abs(np.asarray(g32)).mean()
    assert np.abs(np.asarray(g16, np.float32) - np.asarray(g32)).mean() / denom < 2e-2
