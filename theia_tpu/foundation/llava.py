"""LLaVA visual teacher: the CLIP ViT-L/14-336 tower, features from hidden
layer -2, CLS dropped (reference:
src/theia/foundation_models/vision_language_models/llava.py:24-145).
Excluded from training in the reference (train_rvfm.py:235); provided for
extraction parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.foundation.towers import CLIP_VIT_LARGE, CLIPVisionTower, convert_clip_vision

# llava-1.5's vision tower: CLIP ViT-L/14 at 336px -> 24x24 patches
LLAVA_VISION = dataclasses.replace(CLIP_VIT_LARGE, image_size=336, resize_size=336, crop_size=336)


def get_llava_vision_model(
    model_name: str = "llava-hf/llava-1.5-7b-hf",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
):
    module = CLIPVisionTower(LLAVA_VISION, dtype=dtype)
    params = None
    if hf_model is not None:
        from theia_tpu.models.hf_convert import state_dict_to_numpy

        sd = state_dict_to_numpy(hf_model.state_dict())
        # accept a full LlavaForConditionalGeneration or just the tower
        prefix = "vision_tower." if any(k.startswith("vision_tower.") for k in sd) else ""
        if prefix:
            sd = {k.removeprefix(prefix): v for k, v in sd.items()}
        params = convert_clip_vision(sd, LLAVA_VISION.num_layers)
    return module, params


def get_llava_visual_feature(
    module: CLIPVisionTower, params, images: jax.Array, vision_feature_layer: int = -2
):
    """[B, C, 24, 24] visual tokens from hidden layer -2, CLS dropped
    ("default" select strategy; reference llava.py:66-80)."""
    n = module.cfg.num_layers
    idx = vision_feature_layer % (n + 1)
    _, _, states = module.apply({"params": params}, images, output_hidden_indices=(idx,))
    feat = states[0][:, 1:]
    b, hw, c = feat.shape
    s = int(hw ** 0.5)
    return feat.transpose(0, 2, 1).reshape(b, c, s, s)
