"""Fused preprocessing+patch-embed (single strided conv on uint8) vs the
explicit resize/crop/normalize/patchify path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from theia_tpu.models.vit import ViTBackbone, ViTBackboneConfig, _fused_resize_patch_matrix
from theia_tpu.ops.image import bicubic_resize, center_crop


def test_fused_matrix_window_geometry():
    A, lo, k = _fused_resize_patch_matrix(224, 256, 224, 16)
    assert A.shape == (16, k)
    assert lo == 11
    # rows sum to 1 (resize weights are normalized)
    np.testing.assert_allclose(A.sum(1), 1.0, atol=1e-6)
    # stride per patch is exact
    assert 16 * 224 / 256 == 14.0


def test_fused_embed_matches_explicit_linear_path():
    """Fused conv must equal resize(no PIL rounding)+crop+normalize+patchify
    up to f32 accumulation noise."""
    cfg = ViTBackboneConfig(hidden_size=64, num_layers=1, num_heads=2, intermediate_size=128)
    fused = ViTBackbone(cfg, variant="cls", fuse_preprocessing=True)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 224, 224, 3), np.uint8)
    variables = fused.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    got = fused.apply(variables, jnp.asarray(imgs), method=lambda m, x: m._fused_embed(x))

    # explicit path without the PIL inter-pass rounding
    x = jnp.asarray(imgs, jnp.float32)
    x = bicubic_resize(x, 256, 256, a=-0.5, antialias=True)
    x = center_crop(x, 224, 224)
    x = (x / 255.0 - 0.5) / 0.5
    params = variables["params"]
    b = x.shape[0]
    xp = x.reshape(b, 14, 16, 14, 16, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, 196, -1)
    want = xp @ params["patch_kernel"] + params["patch_bias"]

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_fused_full_forward_close_to_unfused():
    """End-to-end tokens with/without fusion agree closely (only the PIL
    uint8 inter-pass rounding differs)."""
    cfg = ViTBackboneConfig(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128)
    imgs = np.random.RandomState(1).randint(0, 256, (2, 224, 224, 3), np.uint8)
    plain = ViTBackbone(cfg, variant="cls", fuse_preprocessing=False)
    variables = plain.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    want = np.asarray(plain.apply(variables, jnp.asarray(imgs)))

    fused = ViTBackbone(cfg, variant="cls", fuse_preprocessing=True)
    got = np.asarray(fused.apply(variables, jnp.asarray(imgs)))
    assert got.shape == want.shape
    mse = float(np.mean((got - want) ** 2))
    assert mse < 5e-4, mse  # sub-LSB pixel divergence only


def test_fused_falls_back_for_other_sizes():
    cfg = ViTBackboneConfig(hidden_size=64, num_layers=1, num_heads=2, intermediate_size=128)
    fused = ViTBackbone(cfg, variant="cls", fuse_preprocessing=True)
    imgs = jnp.zeros((1, 320, 320, 3), jnp.uint8)
    variables = fused.init(jax.random.PRNGKey(0), imgs)
    out = fused.apply(variables, imgs)  # resized 320->256->crop 224 path
    assert out.shape == (1, 197, 64)
