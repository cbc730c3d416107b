"""SAM ViT-H vision encoder (reference:
src/theia/foundation_models/vision_models/sam.py:247-393 uses the HF
SamModel vision tower to produce (B, 256, 64, 64) embeddings).

TPU-native port of the HF SamVisionEncoder: 16x16 patch conv on 1024x1024
input -> 64x64 token map, windowed attention (14x14 windows, global layers
at {7,15,23,31} for ViT-H) with decomposed relative position bias, and a
conv neck to 256 channels. All window partitions and rel-pos gathers are
static-shape reshapes/gathers, XLA-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from theia_tpu.foundation.towers import IMAGENET_MEAN, IMAGENET_STD
from theia_tpu.ops.image import preprocess_images


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    image_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: tuple[int, ...] = (7, 15, 23, 31)
    output_channels: int = 256
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


SAM_VIT_HUGE = SamVisionConfig()


def _rel_index(size: int) -> np.ndarray:
    """Static gather indices into a (2*size-1, hd) rel-pos table:
    idx[i, j] = i - j + size - 1 (q_size == k_size path of HF get_rel_pos)."""
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    return (i - j + size - 1).astype(np.int32)


def _decomposed_attn(q, k, v, rel_pos_h, rel_pos_w, num_heads, h, w, dtype):
    """Attention with decomposed relative position bias (HF SamVisionAttention).

    q/k/v: [B', HW, C] where B' includes windows; h, w are the spatial dims.
    """
    bp, hw, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5
    qh = q.reshape(bp, hw, num_heads, hd)
    kh = k.reshape(bp, hw, num_heads, hd)
    vh = v.reshape(bp, hw, num_heads, hd)
    attn = jnp.einsum("bqnc,bknc->bnqk", qh * scale, kh, preferred_element_type=jnp.float32)

    rh = rel_pos_h[jnp.asarray(_rel_index(h))]  # (h, h, hd)
    rw = rel_pos_w[jnp.asarray(_rel_index(w))]  # (w, w, hd)
    qs = qh.reshape(bp, h, w, num_heads, hd)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qs, rh.astype(qs.dtype), preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qs, rw.astype(qs.dtype), preferred_element_type=jnp.float32)
    attn = attn.reshape(bp, num_heads, h, w, h, w)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    attn = attn.reshape(bp, num_heads, hw, hw)
    probs = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", probs, vh).reshape(bp, hw, c)
    return out


class _LayerNorm2d(nn.Module):
    """SamLayerNorm (channels_last here): normalize over channel dim only."""

    features: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


class SamVisionEncoder(nn.Module):
    """Returns the neck output as NHWC [B, 64, 64, 256]."""

    cfg: SamVisionConfig = SAM_VIT_HUGE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, do_preprocess: bool = True) -> jax.Array:
        cfg = self.cfg
        c = cfg.hidden_size
        g = cfg.grid
        win = cfg.window_size
        dense = lambda feats, name: nn.Dense(feats, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name, dtype=self.dtype, param_dtype=jnp.float32)

        if do_preprocess:
            # SamImageProcessor: longest edge -> 1024 (bilinear), rescale,
            # ImageNet normalize, pad to square (square inputs: plain resize)
            x = preprocess_images(
                images, resize_size=cfg.image_size, crop_size=cfg.image_size,
                image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD,
                out_dtype=self.dtype, resample="linear",
            )
        else:
            x = images.astype(self.dtype)
            if x.shape[1] == 3 and x.shape[-1] != 3:
                x = jnp.transpose(x, (0, 2, 3, 1))

        b = x.shape[0]
        p = cfg.patch_size
        patch_kernel = self.param("patch_kernel", nn.initializers.normal(0.02), (p * p * 3, c), jnp.float32)
        patch_bias = self.param("patch_bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g, g, p * p * 3)
        x = jnp.dot(x, patch_kernel.astype(self.dtype)) + patch_bias.astype(self.dtype)

        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, c), jnp.float32)
        x = x + pos.astype(self.dtype)

        pad = (win - g % win) % win
        gp = g + pad
        nwin = gp // win

        for i in range(cfg.num_layers):
            is_global = i in cfg.global_attn_indexes
            size = g if is_global else win
            rel_h = self.param(f"layer_{i}_rel_pos_h", nn.initializers.zeros, (2 * size - 1, c // cfg.num_heads), jnp.float32)
            rel_w = self.param(f"layer_{i}_rel_pos_w", nn.initializers.zeros, (2 * size - 1, c // cfg.num_heads), jnp.float32)
            residual = x
            h1 = ln(f"layer_{i}_ln1")(x)
            if not is_global:
                h1 = jnp.pad(h1, ((0, 0), (0, pad), (0, pad), (0, 0)))
                h1 = h1.reshape(b, nwin, win, nwin, win, c).transpose(0, 1, 3, 2, 4, 5)
                h1 = h1.reshape(b * nwin * nwin, win * win, c)
            else:
                h1 = h1.reshape(b, g * g, c)
            qkv = dense(3 * c, f"layer_{i}_qkv")(h1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = _decomposed_attn(q, k, v, rel_h, rel_w, cfg.num_heads, size, size, self.dtype)
            a = dense(c, f"layer_{i}_proj")(a)
            if not is_global:
                a = a.reshape(b, nwin, nwin, win, win, c).transpose(0, 1, 3, 2, 4, 5)
                a = a.reshape(b, gp, gp, c)[:, :g, :g]
            else:
                a = a.reshape(b, g, g, c)
            x = residual + a
            h2 = ln(f"layer_{i}_ln2")(x)
            h2 = dense(cfg.mlp_dim, f"layer_{i}_lin1")(h2)
            h2 = jax.nn.gelu(h2, approximate=False)
            h2 = dense(c, f"layer_{i}_lin2")(h2)
            x = x + h2

        # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (all convs biasless)
        oc = cfg.output_channels
        w1 = self.param("neck_conv1", nn.initializers.normal(0.02), (1, 1, c, oc), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, w1.astype(self.dtype), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        x = _LayerNorm2d(oc, dtype=self.dtype, name="neck_ln1")(x)
        w2 = self.param("neck_conv2", nn.initializers.normal(0.02), (3, 3, oc, oc), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, w2.astype(self.dtype), (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        x = _LayerNorm2d(oc, dtype=self.dtype, name="neck_ln2")(x)
        return x


def convert_sam_vision(sd: dict[str, np.ndarray], cfg: SamVisionConfig = SAM_VIT_HUGE) -> dict:
    """HF SamModel (or bare vision encoder) state dict -> SamVisionEncoder params."""
    if any(k.startswith("vision_encoder.") for k in sd):
        sd = {k.removeprefix("vision_encoder."): v for k, v in sd.items()}
    proj = sd["patch_embed.projection.weight"]
    c = proj.shape[0]
    params: dict[str, Any] = {
        "patch_kernel": proj.transpose(2, 3, 1, 0).reshape(-1, c),
        "patch_bias": sd["patch_embed.projection.bias"],
        "pos_embed": sd["pos_embed"],
        "neck_conv1": sd["neck.conv1.weight"].transpose(2, 3, 1, 0),
        "neck_conv2": sd["neck.conv2.weight"].transpose(2, 3, 1, 0),
        "neck_ln1": {"weight": sd["neck.layer_norm1.weight"], "bias": sd["neck.layer_norm1.bias"]},
        "neck_ln2": {"weight": sd["neck.layer_norm2.weight"], "bias": sd["neck.layer_norm2.bias"]},
    }
    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        params[f"layer_{i}_ln1"] = {"scale": sd[lp + "layer_norm1.weight"], "bias": sd[lp + "layer_norm1.bias"]}
        params[f"layer_{i}_ln2"] = {"scale": sd[lp + "layer_norm2.weight"], "bias": sd[lp + "layer_norm2.bias"]}
        params[f"layer_{i}_qkv"] = {"kernel": sd[lp + "attn.qkv.weight"].T, "bias": sd[lp + "attn.qkv.bias"]}
        params[f"layer_{i}_proj"] = {"kernel": sd[lp + "attn.proj.weight"].T, "bias": sd[lp + "attn.proj.bias"]}
        params[f"layer_{i}_rel_pos_h"] = sd[lp + "attn.rel_pos_h"]
        params[f"layer_{i}_rel_pos_w"] = sd[lp + "attn.rel_pos_w"]
        params[f"layer_{i}_lin1"] = {"kernel": sd[lp + "mlp.lin1.weight"].T, "bias": sd[lp + "mlp.lin1.bias"]}
        params[f"layer_{i}_lin2"] = {"kernel": sd[lp + "mlp.lin2.weight"].T, "bias": sd[lp + "mlp.lin2.bias"]}
    return params


def get_sam_model(
    model_name: str = "facebook/sam-vit-huge",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
    cfg: SamVisionConfig = SAM_VIT_HUGE,
):
    """(module, params_or_None) — vision-feature path (with_upscaled=False),
    matching reference get_sam_model (sam.py:355-375)."""
    module = SamVisionEncoder(cfg, dtype=dtype)
    params = None
    if hf_model is not None:
        from theia_tpu.models.hf_convert import state_dict_to_numpy

        params = convert_sam_vision(state_dict_to_numpy(hf_model.state_dict()), cfg)
    return module, params


def get_sam_feature(module: SamVisionEncoder, params, images: jax.Array):
    """(image_embeddings [B,256,64,64], None) matching reference
    get_sam_feature with with_upscaled=False (sam.py:329-352)."""
    out = module.apply({"params": params}, images)
    return jnp.transpose(out, (0, 3, 1, 2)), None
