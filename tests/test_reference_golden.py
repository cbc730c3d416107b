"""Parity vs STORED reference-produced tensors (tests/fixtures/).

Round-1 golden tests compared against freshly-instantiated random HF
modules; these assert against tensors produced by RUNNING the actual
reference RobotVisionFM code (/root/reference via tests/reference_loader.py)
and committed to the repo — the full forward_feature + forward + get_loss
chain for the cddsv teacher set (reference check_feature.py:88-154 spirit).

Real published weights need hub access (zero-egress image, no HF cache);
test_published_weights_if_available documents that gate explicitly.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

from golden_reference import (
    BACKBONE,
    CDDSV_SIZES,
    FIXTURE,
    build_reference_rvfm,
    golden_inputs,
    run_reference,
)


@pytest.fixture(scope="module")
def stored():
    assert FIXTURE.exists(), "run tests/golden_reference.py to regenerate"
    with np.load(FIXTURE) as z:
        return {k.replace("|", "/"): z[k] for k in z.files}


@pytest.fixture(scope="module")
def reference_model():
    return build_reference_rvfm()


def test_reference_regeneration_matches_stored(stored, reference_model):
    """Guard: rebuilding the reference model from the fixed seed must
    reproduce the stored fixture bit-for-bit (catches torch/transformers
    RNG or numerics drift before any parity claim is made)."""
    fresh = run_reference(reference_model)
    assert set(fresh) == set(stored)
    for k, v in fresh.items():
        np.testing.assert_allclose(v, stored[k], rtol=1e-6, atol=1e-6, err_msg=k)


def test_our_theia_matches_stored_reference_chain(stored, reference_model):
    """Converted reference weights through OUR Theia: forward_feature,
    per-teacher forward features, and all loss terms vs the stored
    reference-produced tensors (<1e-3 MSE BASELINE target; measured ~1e-9)."""
    import jax

    from theia_tpu.models.hf_convert import convert_theia_checkpoint, state_dict_to_numpy
    from theia_tpu.models.losses import get_loss
    from theia_tpu.models.rvfm import Theia

    sd = state_dict_to_numpy(reference_model.state_dict())
    params = convert_theia_checkpoint(
        sd, num_layers=12, translator_type="lconv", target_feature_sizes=CDDSV_SIZES
    )
    theia = Theia(backbone=BACKBONE, translator="lconv", target_feature_sizes=CDDSV_SIZES)

    images, targets = golden_inputs()
    x = jnp.asarray(images)

    feat = theia.apply({"params": params}, x, method=theia.forward_feature)
    mse = float(np.mean((np.asarray(feat) - stored["forward_feature"]) ** 2))
    assert mse < 1e-3, mse

    preds = theia.apply({"params": params}, x)
    for t in CDDSV_SIZES:
        want = stored[f"pred::{t}"]
        got = np.asarray(preds[t])
        assert got.shape == want.shape
        mse = float(np.mean((got - want) ** 2))
        assert mse < 1e-3, (t, mse)

    losses = get_loss(preds, {k: jnp.asarray(v) for k, v in targets.items()}, None)
    for term in ("mse_loss", "cos_loss", "l1_loss"):
        np.testing.assert_allclose(
            float(losses[term]), float(stored[f"loss::{term}"]), rtol=2e-4, err_msg=term
        )
    for term in ("mse_losses_per_model", "cos_losses_per_model", "l1_losses_per_model"):
        for t in CDDSV_SIZES:
            np.testing.assert_allclose(
                float(losses[term][t]),
                float(stored[f"loss::{term}::{t}"]),
                rtol=2e-4,
                err_msg=f"{term}::{t}",
            )


def test_published_weights_if_available():
    """Real-weight parity (theaiinstitute/theia-tiny-patch16-224-cdiv) —
    requires hub access; this image has zero egress and no HF cache, so the
    gate documents the limitation explicitly rather than failing silently."""
    import os

    if os.environ.get("HF_HUB_OFFLINE", "1") == "1":
        pytest.skip(
            "hub offline: published-weight parity needs network access; "
            "layout parity is covered by the stored reference-run fixtures"
        )
    from transformers import AutoModel  # pragma: no cover

    AutoModel.from_pretrained(
        "theaiinstitute/theia-tiny-patch16-224-cdiv", trust_remote_code=True
    )
