"""Decoding pipeline tests: PCA viz, depth decode, SAM auto-mask generation,
full decode_everything, and reference-checkpoint loading."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def test_decode_dinov2_shapes_and_range():
    from theia_tpu.decoding.dinov2 import decode_dinov2

    feats = np.random.RandomState(0).randn(2, 256, 64).astype(np.float32)
    rgb, pca = decode_dinov2(feats)
    assert rgb.shape == (2, 224, 224, 3)
    # tiny eps: sklearn minmax_scale under multithreaded BLAS can land a
    # hair outside [0,1] in float32
    assert -1e-5 <= rgb.min() and rgb.max() <= 1.0 + 1e-5
    # reusing the pca keeps visualizations consistent
    rgb2, _ = decode_dinov2(feats, pca=pca)
    np.testing.assert_allclose(rgb, rgb2, atol=1e-5)


def test_decode_depth_anything():
    from theia_tpu.decoding.depth_anything import decode_depth_anything

    rng = np.random.RandomState(1)
    decoder = {
        "conv3_kernel": rng.randn(1, 1, 32, 1).astype(np.float32) * 0.1,
        "conv3_bias": np.zeros(1, np.float32),
    }
    feats = rng.randn(2, 4096, 32).astype(np.float32)
    out = decode_depth_anything(feats, decoder)
    assert out.shape == (2, 224, 224, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_sam_auto_mask_generation():
    """With the real-geometry decoder (random weights) the AMG loop must run
    end to end and produce a well-formed result dict."""
    from theia_tpu.decoding.sam import decode_sam, prepare_mask_generator

    gen, _ = prepare_mask_generator()
    gen.points_per_side = 4  # keep the test fast
    feats = np.random.RandomState(2).randn(1, 4096, 256).astype(np.float32) * 0.1
    out = decode_sam(feats, [None], gen, pred_iou_thresh=-10.0, stability_score_thresh=0.0)
    assert out.shape == (1, 224, 224, 3)


def test_decode_everything_pipeline():
    from theia_tpu.decoding import decode_everything
    from theia_tpu.decoding.sam import prepare_mask_generator

    rng = np.random.RandomState(3)
    sizes = {
        "facebook/dinov2-large": (64, 256),
        "facebook/sam-vit-huge": (256, 4096),
        "LiheYoung/depth-anything-large-hf": (32, 4096),
    }

    def theia_forward(images):
        b = images.shape[0]
        return {k: rng.randn(b, n, c).astype(np.float32) for k, (c, n) in sizes.items()}

    means = {k: np.zeros(c, np.float32) for k, (c, _) in sizes.items()}
    stds = {k: np.ones(c, np.float32) for k, (c, _) in sizes.items()}
    gen, _ = prepare_mask_generator()
    gen.points_per_side = 2
    decoder = {
        "conv3_kernel": rng.randn(1, 1, 32, 1).astype(np.float32) * 0.1,
        "conv3_bias": np.zeros(1, np.float32),
    }
    images = rng.randint(0, 256, (2, 224, 224, 3), np.uint8)
    results, gt = decode_everything(theia_forward, means, stds, images, gen, decoder)
    assert gt is None
    assert len(results) == 2
    assert results[0].shape == (224, 4 * 224, 3)  # input | dino | sam | depth


def test_load_reference_checkpoint(tmp_path):
    """Round trip: torch RobotVisionFM-layout state dict -> our params."""
    from reference_loader import load_reference
    from transformers import ViTConfig, ViTModel

    from theia_tpu.models.pretrained import load_theia_checkpoint
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.models import vit as jvit

    rft = load_reference("models.feature_translators")
    targets = {"teacher/a": (24, 16, 16)}

    torch.manual_seed(0)
    hf = ViTModel(
        ViTConfig(hidden_size=192, num_hidden_layers=2, num_attention_heads=3,
                  intermediate_size=768, image_size=224, patch_size=16),
        add_pooling_layer=False,
    )
    tr = rft.LightConvFeatureTranslator(
        backbone_feature_size=torch.Size((192, 14, 14)), target_feature_sizes=targets
    )
    sd = {}
    for k, v in hf.state_dict().items():
        sd[f"backbone.model.{k}"] = v
    for k, v in tr.state_dict().items():
        sd[f"translator.{k}"] = v
    path = tmp_path / "ref_ckpt.pth"
    torch.save(sd, str(path))

    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=targets)
        params = load_theia_checkpoint(str(path), model)
        # loaded backbone params equal the torch weights
        np.testing.assert_allclose(
            np.asarray(params["backbone_module"]["cls_token"]),
            hf.state_dict()["embeddings.cls_token"].numpy(),
        )
        out = model.apply({"params": params}, jnp.zeros((1, 224, 224, 3), jnp.uint8))
        assert out["teacher/a"].shape == (1, 256, 24)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def test_decode_everything_gt_inline(monkeypatch):
    """decode_everything(gt=True) must run the GT teachers on the input
    frames and return a second panel row with the same geometry as the
    predicted row (reference decode.py:126-196). Teacher stand-ins emit the
    real output layouts ([B,C,16,16] dino / [B,256,64,64] sam / [B,32,518,518]
    depth) so run_gt_teachers' rearranges are exercised; the foundation
    modules themselves have their own HF-parity tests."""
    import theia_tpu.foundation.extraction as extraction
    from theia_tpu.decoding import decode_everything
    from theia_tpu.decoding.sam import prepare_mask_generator

    rng = np.random.RandomState(4)
    sizes = {
        "facebook/dinov2-large": (64, 256),
        "facebook/sam-vit-huge": (256, 4096),
        "LiheYoung/depth-anything-large-hf": (32, 4096),
    }

    def theia_forward(images):
        b = images.shape[0]
        return {k: rng.randn(b, n, c).astype(np.float32) for k, (c, n) in sizes.items()}

    def fake_get_model(name, hf_model=None, dtype=jnp.float32):
        if "dinov2" in name:
            # spatially-varying features so the PCA foreground split is
            # non-degenerate
            grid = jnp.sin(jnp.arange(64 * 16 * 16, dtype=jnp.float32)).reshape(
                1, 64, 16, 16
            )
            fn = lambda m, p, x: (
                jnp.zeros((x.shape[0], 1, 64)),
                jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True) * 0.01
                + grid + p["seed"],
                jnp.zeros((x.shape[0], 1, 64)),
            )
        elif "sam" in name:
            fn = lambda m, p, x: (
                jnp.ones((x.shape[0], 256, 64, 64)) * 0.1 + p["seed"], None
            )
        else:  # depth-anything
            fn = lambda m, p, x: jnp.ones((x.shape[0], 32, 518, 518)) * 0.2 + p["seed"]
        return object(), None, fn

    monkeypatch.setattr(extraction, "get_model", fake_get_model)

    means = {k: np.zeros(c, np.float32) for k, (c, _) in sizes.items()}
    stds = {k: np.ones(c, np.float32) for k, (c, _) in sizes.items()}
    gen, _ = prepare_mask_generator()
    gen.points_per_side = 2
    decoder = {
        "conv3_kernel": rng.randn(1, 1, 32, 1).astype(np.float32) * 0.1,
        "conv3_bias": np.zeros(1, np.float32),
    }
    images = rng.randint(0, 256, (2, 224, 224, 3), np.uint8)
    params = {k: {"seed": jnp.float32(0.01)} for k in sizes}
    results, gt = decode_everything(
        theia_forward, means, stds, images, gen, decoder,
        gt=True, gt_teacher_params=params,
    )
    assert gt is not None and len(gt) == len(results) == 2
    assert results[0].shape == gt[0].shape == (224, 4 * 224, 3)
    stacked = np.vstack([results[0], gt[0]])
    assert stacked.shape == (448, 4 * 224, 3)
