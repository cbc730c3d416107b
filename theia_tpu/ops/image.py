"""On-device image ops: bicubic resize, center crop, uint8 preprocessing.

These replace the reference's host-side HuggingFace image processor
(reference: src/theia/models/backbones.py:337-339, where a DeiT AutoProcessor
runs resize/rescale/normalize on CPU per batch). Here the whole pipeline is
traced into the XLA program and runs on the TPU, fused with the patch embed.

The separable bicubic resize is expressed as two matmuls with precomputed
(static) weight matrices, which XLA maps onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel (Keys). a=-0.5 matches PIL, a=-0.75 matches torch."""
    absx = np.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    w = np.where(
        absx <= 1.0,
        (a + 2.0) * absx3 - (a + 3.0) * absx2 + 1.0,
        np.where(absx < 2.0, a * absx3 - 5.0 * a * absx2 + 8.0 * a * absx - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    """Triangle kernel (PIL/torch bilinear)."""
    return np.clip(1.0 - np.abs(x), 0.0, None)


@functools.lru_cache(maxsize=64)
def _resize_matrix(
    in_size: int,
    out_size: int,
    a: float,
    scale: float | None,
    antialias: bool,
    kernel: str = "cubic",
    align_corners: bool = False,
) -> np.ndarray:
    """Precompute a dense (out_size, in_size) separable bicubic sampling matrix.

    Coordinate mapping is half-pixel (align_corners=False):
        src = (dst + 0.5) / scale - 0.5
    where ``scale`` defaults to out/in but can be overridden, which is needed
    to reproduce the reference's pos-embed interpolation quirk where
    scale_factor=(h0+0.1)/sqrt(N) is passed to F.interpolate
    (reference: src/theia/models/backbones.py:56-66).

    With antialias=True the kernel support is stretched by 1/scale when
    downscaling (PIL semantics; PIL always antialiases).
    """
    if scale is None:
        scale = out_size / in_size
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        # torch align_corners=True: src = dst * (in-1)/(out-1)
        src = dst * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = (dst + 0.5) / scale - 0.5
    if antialias and scale < 1.0:
        support_scale = scale
    else:
        support_scale = 1.0
    base_support = 2.0 if kernel == "cubic" else 1.0
    support = base_support / support_scale
    lo = np.floor(src - support).astype(np.int64)
    max_taps = int(np.ceil(2 * support)) + 2
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    kfn = (lambda x: _cubic_kernel(x, a)) if kernel == "cubic" else _linear_kernel
    for i in range(out_size):
        taps = lo[i] + np.arange(max_taps)
        w = kfn((src[i] - taps) * support_scale)
        s = w.sum()
        if s != 0:
            w = w / s
        # clamp taps to valid range (replicate border, matching torch/PIL)
        taps_c = np.clip(taps, 0, in_size - 1)
        for t, wt in zip(taps_c, w):
            mat[i, t] += wt
    return mat.astype(np.float32)


def bicubic_resize(
    x: jax.Array,
    out_h: int,
    out_w: int,
    *,
    a: float = -0.5,
    scale_h: float | None = None,
    scale_w: float | None = None,
    antialias: bool = True,
    pil_uint8_rounding: bool = False,
    kernel: str = "cubic",
    align_corners: bool = False,
) -> jax.Array:
    """Separable resize of NHWC (or HWC) images via two matmuls.

    kernel="cubic", a=-0.5, antialias=True  -> PIL.Image.BICUBIC semantics.
    kernel="cubic", a=-0.75, antialias=False -> torch bicubic semantics.
    kernel="linear", antialias=True -> PIL.Image.BILINEAR semantics.

    pil_uint8_rounding=True emulates PIL resizing a uint8 image: the
    horizontal pass runs first and the intermediate is rounded and clamped to
    [0, 255] between passes (as PIL stores a uint8 intermediate image).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, in_h, in_w, c = x.shape
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    mh = jnp.asarray(_resize_matrix(in_h, out_h, a, scale_h, antialias, kernel, align_corners), dtype)
    mw = jnp.asarray(_resize_matrix(in_w, out_w, a, scale_w, antialias, kernel, align_corners), dtype)
    hp = jax.lax.Precision.HIGHEST  # these matmuls feed preprocessing parity
    y = x.astype(dtype)
    if pil_uint8_rounding:
        y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=hp)
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
        y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=hp)
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    else:
        y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=hp)
        y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=hp)
    if squeeze:
        y = y[0]
    return y


def center_crop(x: jax.Array, crop_h: int, crop_w: int) -> jax.Array:
    """Center crop NHWC images. Matches HF image-processor center_crop offsets."""
    h, w = x.shape[-3], x.shape[-2]
    top = (h - crop_h) // 2
    left = (w - crop_w) // 2
    return x[..., top : top + crop_h, left : left + crop_w, :]


def interpolate_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-exact-free bilinear resize of NHWC via jax.image (half-pixel).

    Matches torch F.interpolate(mode="nearest") usage sites in the reference
    only where the reference explicitly uses default interpolate() — which is
    mode="nearest" (reference: src/theia/models/adapter_heads.py:25). For
    nearest, use :func:`interpolate_nearest` instead.
    """
    return jax.image.resize(x, (*x.shape[:-3], out_h, out_w, x.shape[-1]), method="bilinear")


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch F.interpolate(mode='nearest') semantics: src = floor(dst * in/out).

    Used by the MLP adapter head's spatial resize
    (reference: src/theia/models/adapter_heads.py:12-25, 94-102).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    idx_h = np.floor(np.arange(out_h) * in_h / out_h).astype(np.int32)
    idx_w = np.floor(np.arange(out_w) * in_w / out_w).astype(np.int32)
    return x[..., idx_h, :, :][..., :, idx_w, :]


def preprocess_images(
    x: jax.Array,
    *,
    do_resize: bool = True,
    do_rescale: bool = True,
    do_normalize: bool = True,
    resize_size: int = 256,
    crop_size: int = 224,
    image_mean: tuple[float, float, float] = (0.5, 0.5, 0.5),
    image_std: tuple[float, float, float] = (0.5, 0.5, 0.5),
    out_dtype: jnp.dtype = jnp.float32,
    resample: str = "cubic",
) -> jax.Array:
    """HF image-processor semantics, on device.

    Accepts uint8 (or float) images in [B,H,W,C] or [B,C,H,W] and returns
    normalized float NHWC. Default pipeline matches DeiTImageProcessor
    (used at reference src/theia/models/backbones.py:285,337-339):
      resize to 256x256 bicubic (PIL a=-0.5) -> center crop 224 ->
      rescale 1/255 -> normalize (mean/std 0.5).
    Other processors are covered by (resize_size, crop_size, mean, std,
    resample): e.g. ViT (224/224 bilinear), CLIP (224/224 bicubic + CLIP
    stats), DINOv2 (256/224 bicubic + ImageNet stats).

    All flags are static so the whole pipeline traces into one XLA program.
    """
    if x.ndim == 3:
        x = x[None]
    # channels-first -> channels-last (reference accepts both; rvfm.py:98-99)
    if x.shape[1] == 3 and x.shape[-1] != 3:
        x = jnp.transpose(x, (0, 2, 3, 1))
    x = x.astype(jnp.float32)
    if do_resize:
        x = bicubic_resize(
            x, resize_size, resize_size, a=-0.5, antialias=True,
            pil_uint8_rounding=True, kernel=resample,
        )
        x = center_crop(x, crop_size, crop_size)
    if do_rescale:
        x = x * (1.0 / 255.0)
    if do_normalize:
        mean = jnp.asarray(image_mean, jnp.float32)
        std = jnp.asarray(image_std, jnp.float32)
        x = (x - mean) / std
    return x.astype(out_dtype)
