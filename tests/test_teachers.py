"""Teacher tower parity vs HF reference models (random init, offline)."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from theia_tpu.foundation.towers import (
    CLIPVisionTower,
    Dinov2Tower,
    TowerConfig,
    convert_clip_vision,
    convert_dinov2,
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from theia_tpu.models.hf_convert import state_dict_to_numpy

SMALL = dict(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
             patch_size=16, image_size=224)


def test_clip_vision_parity_and_processor():
    from transformers import CLIPImageProcessor, CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=16, image_size=224,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(cfg)
    hf.eval()

    tower = CLIPVisionTower(TowerConfig(**SMALL))
    params = convert_clip_vision(state_dict_to_numpy(hf.state_dict()), 2)

    # pixel-path parity
    pix = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32) * 0.3
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pix))
    tokens, pooled = tower.apply({"params": params}, jnp.asarray(pix), do_preprocess=False)
    np.testing.assert_allclose(np.asarray(tokens), out.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-4)

    # end-to-end uint8 through the processor (shortest-edge 224 + crop)
    proc = CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224},
        image_mean=list(CLIP_MEAN), image_std=list(CLIP_STD),
    )
    imgs = np.random.RandomState(1).randint(0, 256, (2, 256, 256, 3), np.uint8)
    pv = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        want = hf(pixel_values=pv).last_hidden_state.numpy()
    got, _ = tower.apply({"params": params}, jnp.asarray(imgs))
    mse = float(np.mean((np.asarray(got) - want) ** 2))
    assert mse < 1e-3, mse


def test_dinov2_parity_and_processor():
    from transformers import BitImageProcessor, Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=2, patch_size=16, image_size=224,  # mlp 64*2=128
    )
    torch.manual_seed(1)
    hf = Dinov2Model(cfg)
    hf.eval()

    tower = Dinov2Tower(TowerConfig(**SMALL, layer_norm_eps=1e-6, resize_size=256,
                                    image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD))
    params = convert_dinov2(state_dict_to_numpy(hf.state_dict()), 2)

    pix = np.random.RandomState(2).randn(2, 3, 224, 224).astype(np.float32) * 0.3
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pix))
    tokens, pooled = tower.apply({"params": params}, jnp.asarray(pix), do_preprocess=False)
    np.testing.assert_allclose(np.asarray(tokens), out.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-4)

    # end-to-end uint8: facebook/dinov2-large hub processor semantics
    proc = BitImageProcessor(
        size={"shortest_edge": 256}, crop_size={"height": 224, "width": 224},
        do_center_crop=True, resample=3,
        image_mean=list(IMAGENET_MEAN), image_std=list(IMAGENET_STD),
    )
    imgs = np.random.RandomState(3).randint(0, 256, (2, 224, 224, 3), np.uint8)
    pv = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        want = hf(pixel_values=pv).last_hidden_state.numpy()
    got, _ = tower.apply({"params": params}, jnp.asarray(imgs))
    mse = float(np.mean((np.asarray(got) - want) ** 2))
    assert mse < 1e-3, mse


def test_vit_teacher_bilinear_processor():
    from transformers import ViTConfig, ViTImageProcessor, ViTModel

    from theia_tpu.foundation.vit import _ViTTeacher
    from theia_tpu.models.hf_convert import convert_vit_backbone
    from theia_tpu.models.vit import ViTBackboneConfig

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                    intermediate_size=128, image_size=224, patch_size=16)
    torch.manual_seed(2)
    hf = ViTModel(cfg, add_pooling_layer=False)
    hf.eval()
    proc = ViTImageProcessor()  # 224x224 bilinear, mean/std 0.5
    imgs = np.random.RandomState(4).randint(0, 256, (2, 256, 256, 3), np.uint8)
    pv = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        want = hf(pixel_values=pv).last_hidden_state.numpy()

    jcfg = ViTBackboneConfig(hidden_size=64, num_layers=2, num_heads=4,
                             intermediate_size=128, resize_size=224, crop_size=224)
    module = _ViTTeacher(jcfg, variant="cls", resample="linear")
    params = convert_vit_backbone(state_dict_to_numpy(hf.state_dict()), 2)
    got = np.asarray(module.apply({"params": params}, jnp.asarray(imgs)))
    mse = float(np.mean((got - want) ** 2))
    assert mse < 1e-3, mse


def test_feature_getter_shapes():
    from theia_tpu.foundation.clip import get_clip_feature
    from theia_tpu.foundation.dinov2 import get_dinov2_feature

    tower = CLIPVisionTower(TowerConfig(**SMALL))
    imgs = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    params = tower.init(jax.random.PRNGKey(0), imgs)["params"]
    cls_token, visual, pooled = get_clip_feature(tower, params, imgs)
    assert cls_token.shape == (1, 1, 64)
    assert visual.shape == (1, 64, 14, 14)
    assert pooled.shape == (1, 1, 64)

    dtower = Dinov2Tower(TowerConfig(**SMALL, layer_norm_eps=1e-6))
    params = dtower.init(jax.random.PRNGKey(0), imgs)["params"]
    cls_token, visual, pooled = get_dinov2_feature(dtower, params, imgs)
    assert visual.shape == (1, 64, 14, 14)
