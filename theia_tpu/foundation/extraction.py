"""Teacher feature extraction core: model dispatch + per-batch outputs.

TPU equivalent of reference preprocessing/feature_extraction_core/models.py:
``get_model`` dispatches by name (:25-40), ``get_feature_outputs`` runs a
teacher batch and packages bf16 safetensors-ready features with the exact
per-teacher key layout (:55-97):
  - google/vit:        {cls_token [C], embedding [C,16,16]}
  - facebook/sam:      {embedding [C,64,64]} (+ a _32 variant interpolated
                       to 32x32)
  - openai/clip:       {embedding, cls_token, pooled_cls_token}
  - facebook/dinov2:   {embedding, cls_token, pooled_cls_token}
  - llava:             {embedding [C,24,24]}
  - depth-anything:    {embedding interpolated to [32,64,64]}
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.data.stats import BFLOAT16
from theia_tpu.ops.image import interpolate_nearest


def get_model(model_name: str, hf_model: Optional[Any] = None, dtype: Any = jnp.float32):
    """(module, params_or_None, feature_fn) by teacher name
    (reference models.py:25-40 dispatch)."""
    from theia_tpu import foundation as f

    if "google/vit" in model_name:
        module, params = f.get_vit_model(model_name, hf_model, dtype)
        return module, params, f.get_vit_feature
    elif "facebook/sam" in model_name:
        module, params = f.get_sam_model(model_name, hf_model, dtype)
        return module, params, f.get_sam_feature
    elif "openai/clip" in model_name:
        module, params = f.get_clip_model(model_name, hf_model, dtype)
        return module, params, f.get_clip_feature
    elif "facebook/dinov2" in model_name:
        module, params = f.get_dinov2_model(model_name, hf_model, dtype)
        return module, params, f.get_dinov2_feature
    elif "llava" in model_name:
        module, params = f.get_llava_vision_model(model_name, hf_model, dtype)
        return module, params, f.get_llava_visual_feature
    elif "depth-anything" in model_name:
        module, params = f.get_depth_anything_model(model_name, hf_model, dtype)
        return module, params, f.get_depth_anything_feature
    raise NotImplementedError(f"{model_name} is not implemented")


def _to_np_bf16(x: jax.Array) -> np.ndarray:
    return np.asarray(jax.device_get(x.astype(jnp.bfloat16))).astype(BFLOAT16)


def get_feature_outputs(
    model_name: str,
    module: Any,
    params: Any,
    batch_images: jax.Array,
    feature_fn: Optional[Callable] = None,
) -> dict[str, dict[str, np.ndarray]]:
    """Run one teacher batch -> {store_name: {key: bf16 np array}} with the
    reference's key layout (models.py:55-97). ``batch_images`` is uint8
    [B,H,W,3]."""
    name = model_name.replace("/", "_")
    if feature_fn is None:
        feature_fn = get_model(model_name)[2]

    features: dict[str, dict[str, np.ndarray]] = {}
    if "google_vit" in name:
        cls_token, feature = feature_fn(module, params, batch_images)
        features[name] = {
            "cls_token": _to_np_bf16(cls_token),
            "embedding": _to_np_bf16(feature),
        }
    elif "facebook_sam" in name:
        feature, _ = feature_fn(module, params, batch_images)  # [B,256,64,64]
        features[name] = {"embedding": _to_np_bf16(feature)}
        nhwc = jnp.transpose(feature, (0, 2, 3, 1))
        f32 = jnp.transpose(interpolate_nearest(nhwc, 32, 32), (0, 3, 1, 2))
        features[name + "_32"] = {"embedding": _to_np_bf16(f32)}
    elif "openai_clip" in name or "facebook_dinov2" in name:
        cls_token, visual_tokens, pooled = feature_fn(module, params, batch_images)
        features[name] = {
            "embedding": _to_np_bf16(visual_tokens),
            "cls_token": _to_np_bf16(cls_token),
            "pooled_cls_token": _to_np_bf16(pooled),
        }
    elif "llava" in name:
        feature = feature_fn(module, params, batch_images)
        features[name] = {"embedding": _to_np_bf16(feature)}
    elif "depth-anything" in name:
        feature = feature_fn(module, params, batch_images)  # [B,32,518,518]
        nhwc = jnp.transpose(feature, (0, 2, 3, 1))
        f64 = jnp.transpose(interpolate_nearest(nhwc, 64, 64), (0, 3, 1, 2))
        features[name] = {"embedding": _to_np_bf16(f64)}
    else:
        raise NotImplementedError(f"model {model_name} is not supported")
    return features
