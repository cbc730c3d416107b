"""DINOv2-style PCA visualization of predicted features
(reference: src/theia/decoding/dinov2.py:12-69). Host-side (sklearn)."""

from __future__ import annotations

import numpy as np


def decode_dinov2(
    features: np.ndarray,
    threshold: float = -100,
    interpolation: bool = False,
    pca=None,
):
    """PCA(3) over tokens -> fg/bg split -> per-channel minmax -> upsample.

    Args:
        features: [B, num_tokens, C] (e.g. [B, 256, 1024]).
        threshold: first-component fg/bg threshold (default includes all).
        interpolation: bilinear upsample instead of nearest block fill.
        pca: reuse a fitted sklearn PCA for stability across samples.

    Returns:
        (images [B, 224, 224, 3] float in [0,1], fitted PCA)
    """
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import minmax_scale

    features = np.asarray(features, np.float32)
    b, n, c = features.shape
    h = w = int(n ** 0.5)
    flat = features.reshape(-1, c)

    if pca is None:
        pca = PCA(n_components=3)
        pca.fit(flat)
    comps = pca.transform(flat)

    bg = comps[:, 0] < threshold
    fg = ~bg
    comps_fg = pca.transform(flat[fg])
    for i in range(3):
        comps_fg[:, i] = minmax_scale(comps_fg[:, i])
    rgb = comps.copy()
    rgb[bg] = 0
    rgb[fg] = comps_fg
    rgb = rgb.reshape(b, h, w, 3)

    out_size = 224
    if not interpolation:
        scale = out_size // h
        rgb = np.repeat(np.repeat(rgb, scale, axis=1), scale, axis=2)
        if rgb.shape[1] != out_size:  # non-divisible fallback
            pad = out_size - rgb.shape[1]
            rgb = np.pad(rgb, ((0, 0), (0, pad), (0, pad), (0, 0)), mode="edge")
    else:
        import jax.numpy as jnp

        from theia_tpu.ops.image import bicubic_resize

        rgb = np.asarray(bicubic_resize(jnp.asarray(rgb), out_size, out_size, kernel="linear"))
    return rgb, pca
