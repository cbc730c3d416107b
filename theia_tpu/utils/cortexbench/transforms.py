"""CortexBench input transforms (reference:
src/theia/utils/cortexbench/transforms.py:8-45) as numpy/jax callables."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from theia_tpu.ops.image import bicubic_resize, center_crop


def _resize_shortest(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    if h <= w:
        out_h, out_w = size, int(round(w * size / h))
    else:
        out_h, out_w = int(round(h * size / w)), size
    out = bicubic_resize(jnp.asarray(img, jnp.float32), out_h, out_w, a=-0.5, antialias=True)
    return np.asarray(out)


def rvfm_image_transforms(output_size: int = 224):
    """Resize-only (bicubic); image stays uint8 — normalization happens
    inside the backbone (reference transforms.py:8-23)."""

    def transform(img: np.ndarray) -> np.ndarray:
        out = _resize_shortest(img, output_size)
        h, w = out.shape[:2]
        out = np.asarray(center_crop(jnp.asarray(out), output_size, output_size)) if (h != output_size or w != output_size) else out
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    return transform


def vit_transforms(resize_size: int = 256, output_size: int = 224):
    """Resize -> crop -> scale to [0,1] -> ImageNet normalize (:26-35)."""

    def transform(img: np.ndarray) -> np.ndarray:
        out = _resize_shortest(img, resize_size)
        out = np.asarray(center_crop(jnp.asarray(out), output_size, output_size))
        out = out / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return ((out - mean) / std).astype(np.float32)

    return transform


def r3m_transforms(resize_size: int = 256, output_size: int = 224):
    """Resize -> crop, float32 in [0, 255] (:38-45)."""

    def transform(img: np.ndarray) -> np.ndarray:
        out = _resize_shortest(img, resize_size)
        out = np.asarray(center_crop(jnp.asarray(out), output_size, output_size))
        return out.astype(np.float32)

    return transform
