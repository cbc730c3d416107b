"""Depth-Anything (DPT neck/head) parity vs HF DepthAnythingForDepthEstimation."""

import dataclasses

import numpy as np
import torch

import jax.numpy as jnp

from theia_tpu.foundation.depth_anything import (
    DepthAnything,
    DepthAnythingConfig,
    convert_depth_anything,
)
from theia_tpu.foundation.towers import TowerConfig, IMAGENET_MEAN, IMAGENET_STD
from theia_tpu.models.hf_convert import state_dict_to_numpy


def _small_pair():
    from transformers import DepthAnythingConfig as HFConfig
    from transformers import DepthAnythingForDepthEstimation, Dinov2Config

    backbone = Dinov2Config(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2, mlp_ratio=2,
        patch_size=14, image_size=126,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        reshape_hidden_states=False,
    )
    cfg = HFConfig(
        backbone_config=backbone,
        reassemble_hidden_size=32,
        neck_hidden_sizes=[8, 16, 32, 32],
        fusion_hidden_size=16,
        head_hidden_size=8,
        patch_size=14,
    )
    torch.manual_seed(0)
    hf = DepthAnythingForDepthEstimation(cfg)
    hf.eval()

    jcfg = DepthAnythingConfig(
        backbone=TowerConfig(
            hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
            patch_size=14, image_size=126, layer_norm_eps=1e-6,
            resize_size=126, crop_size=126,
            image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD,
        ),
        backbone_stage_indices=(1, 2, 3, 4),
        reassemble_hidden_size=32,
        neck_hidden_sizes=(8, 16, 32, 32),
        fusion_hidden_size=16,
        head_hidden_size=8,
    )
    module = DepthAnything(jcfg)
    params = convert_depth_anything(state_dict_to_numpy(hf.state_dict()), jcfg)
    return hf, module, params


def test_depth_anything_depth_parity():
    hf, module, params = _small_pair()
    pix = np.random.RandomState(0).randn(2, 3, 126, 126).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(pix)).predicted_depth.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(pix), do_preprocess=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_depth_anything_head_feature_matches_reference_math():
    """Reference DepthAnythingHeadFeature = conv1 -> bilinear(ac=True) ->
    conv2 (depth_anything.py:551-601). Recompute with torch pieces."""
    import torch.nn.functional as F

    hf, module, params = _small_pair()
    pix = np.random.RandomState(1).randn(1, 3, 126, 126).astype(np.float32) * 0.3
    with torch.no_grad():
        outputs = hf.backbone.forward_with_filtered_kwargs(torch.from_numpy(pix))
        hidden = hf.neck(list(outputs.feature_maps), 9, 9)
        h = hf.head.conv1(hidden[-1])
        h = F.interpolate(h, (126, 126), mode="bilinear", align_corners=True)
        want = hf.head.conv2(h).numpy()

    got = np.asarray(
        module.apply({"params": params}, jnp.asarray(pix), do_preprocess=False,
                     method=module.head_feature)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)
