"""ViT-huge / DeiT teachers — plain HF ViTModel architecture, reusing the
student encoder implementation (reference:
src/theia/foundation_models/vision_models/vit.py:8-71, deit.py:8-52)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.models.hf_convert import convert_vit_backbone, state_dict_to_numpy
from theia_tpu.models.vit import ViTBackbone, ViTBackboneConfig

# google/vit-huge-patch14-224-in21k: ViTImageProcessor resizes straight to
# 224x224 with BILINEAR and normalizes with mean/std 0.5
VIT_HUGE = ViTBackboneConfig(
    hidden_size=1280, num_layers=32, num_heads=16, intermediate_size=5120,
    patch_size=14, image_size=224, resize_size=224, crop_size=224,
)

DEIT_TEACHERS = {
    "facebook/deit-tiny-patch16-224": ViTBackboneConfig(hidden_size=192, num_heads=3, intermediate_size=768),
    "facebook/deit-small-patch16-224": ViTBackboneConfig(hidden_size=384, num_heads=6, intermediate_size=1536),
    "facebook/deit-base-patch16-224": ViTBackboneConfig(hidden_size=768, num_heads=12, intermediate_size=3072),
}


class _ViTTeacher(ViTBackbone):
    """ViTBackbone with a processor resample override (ViT uses bilinear)."""

    resample: str = "cubic"

    def __call__(self, x, **kwargs):  # type: ignore[override]
        from theia_tpu.ops.image import preprocess_images

        cfg = self.cfg
        x = preprocess_images(
            x,
            resize_size=cfg.resize_size,
            crop_size=cfg.crop_size,
            image_mean=cfg.image_mean,
            image_std=cfg.image_std,
            out_dtype=self.dtype,
            resample=self.resample,
        )
        return super().__call__(x, do_resize=False, do_rescale=False, do_normalize=False)


def get_vit_model(
    model_name: str = "google/vit-huge-patch14-224-in21k",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
):
    module = _ViTTeacher(VIT_HUGE, variant="cls", dtype=dtype, resample="linear")
    params = None
    if hf_model is not None:
        params = convert_vit_backbone(
            state_dict_to_numpy(hf_model.state_dict()), VIT_HUGE.num_layers
        )
    return module, params


def get_vit_feature(module, params, images: jax.Array):
    """(cls_token [B,C], feature [B,C,16,16]) (reference vit.py:8-51)."""
    tokens = module.apply({"params": params}, images)
    cls_token = tokens[:, 0]
    rest = tokens[:, 1:]
    b, n, c = rest.shape
    s = int(n ** 0.5)
    return cls_token, rest.transpose(0, 2, 1).reshape(b, c, s, s)


def get_deit_model(
    model_name: str = "facebook/deit-tiny-patch16-224",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
):
    cfg = DEIT_TEACHERS[model_name]
    module = ViTBackbone(cfg, variant="cls", dtype=dtype)
    params = None
    if hf_model is not None:
        params = convert_vit_backbone(state_dict_to_numpy(hf_model.state_dict()), cfg.num_layers)
    return module, params


def get_deit_feature(module, params, images: jax.Array):
    """feature [B,C,14,14] (reference deit.py:8-52)."""
    tokens = module.apply({"params": params}, images)
    rest = tokens[:, 1:]
    b, n, c = rest.shape
    s = int(n ** 0.5)
    return rest.transpose(0, 2, 1).reshape(b, c, s, s)
