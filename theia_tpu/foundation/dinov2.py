"""DINOv2 teacher (reference:
src/theia/foundation_models/vision_models/dinov2.py:8-76)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.foundation.towers import DINOV2_LARGE, Dinov2Tower, convert_dinov2
from theia_tpu.models.hf_convert import state_dict_to_numpy


def get_dinov2_model(
    model_name: str = "facebook/dinov2-large",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
):
    module = Dinov2Tower(DINOV2_LARGE, dtype=dtype)
    params = None
    if hf_model is not None:
        params = convert_dinov2(
            state_dict_to_numpy(hf_model.state_dict()), DINOV2_LARGE.num_layers
        )
    return module, params


def get_dinov2_feature(module: Dinov2Tower, params, images: jax.Array):
    """(cls_token [B,1,C], visual_tokens [B,C,16,16], pooled_cls [B,1,C])."""
    tokens, pooled = module.apply({"params": params}, images)
    cls_token = tokens[:, :1]
    visual = tokens[:, 1:]
    b, n, c = visual.shape
    s = int(n ** 0.5)
    visual = visual.transpose(0, 2, 1).reshape(b, c, s, s)
    return cls_token, visual, pooled[:, None]
