"""CLIP vision teacher (reference:
src/theia/foundation_models/vision_language_models/clip.py:8-80)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.foundation.towers import CLIP_VIT_LARGE, CLIPVisionTower, convert_clip_vision
from theia_tpu.models.hf_convert import state_dict_to_numpy


def get_clip_model(
    model_name: str = "openai/clip-vit-large-patch14",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
):
    """Build the CLIP vision tower; convert weights from an HF
    CLIPVisionModel when provided (downloads are environment-dependent and
    thus left to the caller). Returns (module, params_or_None)."""
    module = CLIPVisionTower(CLIP_VIT_LARGE, dtype=dtype)
    params = None
    if hf_model is not None:
        params = convert_clip_vision(
            state_dict_to_numpy(hf_model.state_dict()), CLIP_VIT_LARGE.num_layers
        )
    return module, params


def get_clip_feature(module: CLIPVisionTower, params, images: jax.Array):
    """(cls_token [B,1,C], visual_tokens [B,C,16,16], pooled_cls [B,1,C]) —
    matches reference get_clip_feature (clip.py:8-45)."""
    tokens, pooled = module.apply({"params": params}, images)
    cls_token = tokens[:, :1]
    visual = tokens[:, 1:]
    b, n, c = visual.shape
    s = int(n ** 0.5)
    visual = visual.transpose(0, 2, 1).reshape(b, c, s, s)
    return cls_token, visual, pooled[:, None]
