"""Parity vs STORED reference-produced tensors (tests/fixtures/), over the
shipped configuration MATRIX.

Round-1 golden tests compared against freshly-instantiated random HF
modules; these assert against tensors produced by RUNNING the actual
reference RobotVisionFM code (/root/reference via tests/reference_loader.py)
and committed to the repo — the full forward_feature + forward + get_loss
chain (reference check_feature.py:88-154 spirit) for: tiny/base backbones,
cls/nocls/reg variants, lconv/mlp/conv translators, and distill_cls heads.
(The reference transformer translator crashes at runtime — documented
divergence, no reference-run fixture can exist; see golden_reference.py.)

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
    CONFIGS,
    backbone_variant,
    build_reference_rvfm,
    fixture_path,
    golden_inputs,
    run_reference,
)

NAMES = list(CONFIGS)


def load_stored(name: str) -> dict[str, np.ndarray]:
    path = fixture_path(name)
    assert path.exists(), f"run tests/golden_reference.py {name} to regenerate"
    with np.load(path) as z:
        return {k.replace("|", "/"): z[k] for k in z.files}


@pytest.fixture(scope="module")
def reference_models():
    cache: dict[str, object] = {}

    def get(name: str):
        if name not in cache:
            cache[name] = build_reference_rvfm(name)
        return cache[name]

    return get


@pytest.mark.parametrize("name", NAMES)
def test_reference_regeneration_matches_stored(name, reference_models):
    """Guard: rebuilding the reference model from the fixed seed must
    reproduce the stored fixture (catches torch/transformers RNG or
    numerics drift before any parity claim is made).

    Tolerance note: torch CPU kernels are not bit-stable across sessions —
    oneDNN picks reduction orders per-host/per-run (observed 2026-08-18:
    0.55% of fp16-stored elements off by exactly 1 fp16 ULP on identical
    code+seed). RNG drift, the failure this guards against, mismatches
    grossly; so compare fp16-stored arrays at 1 fp16 ULP (rtol 2^-10,
    atol for subnormals) and f32-stored arrays at 1e-6."""
    stored = load_stored(name)
    fresh = run_reference(reference_models(name), name=name)
    assert set(fresh) == set(stored)
    for k, v in fresh.items():
        s = stored[k]
        if s.dtype == np.float16:
            rtol, atol = 2.0**-10, 1e-5
        else:
            rtol, atol = 1e-6, 1e-6
        np.testing.assert_allclose(v, s, rtol=rtol, atol=atol, err_msg=f"{name}:{k}")


@pytest.mark.parametrize("name", NAMES)
def test_our_theia_matches_stored_reference_chain(name, reference_models):
    """Converted reference weights through OUR Theia: forward_feature,
    per-teacher forward features, and all loss terms vs the stored
    reference-produced tensors (<1e-3 MSE BASELINE target; measured ~1e-9
    for f32 fixtures, bounded by fp16 storage (~1e-7) for matrix ones)."""
    from theia_tpu.models.hf_convert import convert_theia_checkpoint, state_dict_to_numpy
    from theia_tpu.models.losses import get_loss
    from theia_tpu.models.rvfm import Theia

    cfg = CONFIGS[name]
    stored = load_stored(name)
    reference_model = reference_models(name)
    variant = backbone_variant(cfg.backbone)

    sd = state_dict_to_numpy(reference_model.state_dict())
    params = convert_theia_checkpoint(
        sd,
        num_layers=12,
        translator_type=cfg.translator,
        target_feature_sizes=cfg.sizes,
        variant=variant,
    )
    theia = Theia(
        backbone=cfg.backbone,
        translator=cfg.translator,
        target_feature_sizes=dict(cfg.sizes),
        num_reg_tokens=cfg.num_reg_tokens,
    )

    images, targets = golden_inputs(name)
    x = jnp.asarray(images)

    feat = theia.apply({"params": params}, x, method=theia.forward_feature)
    mse = float(np.mean((np.asarray(feat, np.float32) - stored["forward_feature"].astype(np.float32)) ** 2))
    assert mse < 1e-3, (name, mse)

    preds = theia.apply({"params": params}, x)
    for t in cfg.sizes:
        want = stored[f"pred::{t}"].astype(np.float32)
        got = np.asarray(preds[t], np.float32)
        assert got.shape == want.shape, (name, t, got.shape, want.shape)
        mse = float(np.mean((got - want) ** 2))
        assert mse < 1e-3, (name, t, mse)

    losses = get_loss(preds, {k: jnp.asarray(v) for k, v in targets.items()}, None)
    for term in ("mse_loss", "cos_loss", "l1_loss"):
        np.testing.assert_allclose(
            float(losses[term]), float(stored[f"loss::{term}"]), rtol=2e-4,
            err_msg=f"{name}:{term}",
        )
    for term in ("mse_losses_per_model", "cos_losses_per_model", "l1_losses_per_model"):
        for t in cfg.sizes:
            np.testing.assert_allclose(
                float(losses[term][t]),
                float(stored[f"loss::{term}::{t}"]),
                rtol=2e-4,
                err_msg=f"{name}:{term}::{t}",
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


PUBLISHED_FIXTURES = sorted(
    (Path(__file__).parent / "fixtures").glob("published_*.npz")
)


@pytest.mark.parametrize(
    "fx",
    PUBLISHED_FIXTURES
    or [
        pytest.param(
            None,
            marks=pytest.mark.skip(
                reason="no published-weight fixture stored; run "
                "`python -m theia_tpu.scripts.verify_published` on a "
                "networked machine and commit tests/fixtures/published_*.npz "
                "(runbook in that script's docstring)"
            ),
        )
    ],
    ids=lambda p: p.stem if p else "absent",
)
def test_published_fixture_parity(fx):
    """Parity vs the PUBLISHED hub weights, via the stored fixture written by
    theia_tpu/scripts/verify_published.py (reference user flow:
    /root/reference/README.md:23-38).

    If the fixture stores the converted param tree (--store-params), our
    outputs are RECOMPUTED here and asserted <1e-3 MSE against the stored
    torch-reference outputs; otherwise the stored pair (ours vs reference,
    both produced at extraction time from the real weights) is re-asserted.
    """
    stored = dict(np.load(fx, allow_pickle=False))
    if "ref::forward_feature" not in stored:
        pytest.skip(f"{fx.name}: extraction ran without a reference torch run")
    ref_feat = stored["ref::forward_feature"].astype(np.float32)

    param_keys = [k for k in stored if k.startswith("param::")]
    if param_keys:
        from theia_tpu.models.hub import parse_model_name
        from theia_tpu.foundation.common import get_model_feature_size
        from theia_tpu.models.rvfm import Theia

        name = str(stored["model_name"])
        backbone, teachers = parse_model_name(name)
        model = Theia(
            backbone=backbone,
            translator="lconv",
            target_feature_sizes={
                t: get_model_feature_size(t, keep_spatial=True) for t in teachers
            },
        )
        images = jnp.asarray(stored["images"])
        import jax

        params = model.init(jax.random.PRNGKey(0), images[:1])["params"]

        def overlay(tree, prefix):
            out = {}
            for k, v in tree.items():
                key = f"{prefix}{k}"
                if isinstance(v, dict):
                    out[k] = overlay(v, key + "/")
                else:
                    out[k] = jnp.asarray(
                        stored[f"param::{key}"].astype(np.float32), v.dtype
                    )
            return out

        params = overlay(params, "")
        feat = np.asarray(
            model.apply({"params": params}, images, method=model.forward_feature),
            np.float32,
        )
        preds = {
            k: np.asarray(v, np.float32)
            for k, v in model.apply({"params": params}, images).items()
        }
    else:
        feat = stored["ours::forward_feature"].astype(np.float32)
        preds = {
            k.removeprefix("ours::pred::"): stored[k].astype(np.float32)
            for k in stored
            if k.startswith("ours::pred::")
        }

    assert float(np.mean((feat - ref_feat) ** 2)) < 1e-3
    for k in stored:
        if k.startswith("ref::pred::"):
            t = k.removeprefix("ref::pred::")
            mse = float(np.mean((preds[t] - stored[k].astype(np.float32)) ** 2))
            assert mse < 1e-3, (t, mse)
