"""Teacher vision towers in flax: CLIP vision and DINOv2.

These are the ViT-variant encoders behind the teacher registry
(reference: src/theia/foundation_models/vision_language_models/clip.py,
vision_models/dinov2.py). The on-device processors reproduce the HF
processor configs:
  - CLIP: shortest-edge 224 bicubic -> crop 224 -> CLIP mean/std;
  - DINOv2: shortest-edge 256 bicubic -> crop 224 -> ImageNet mean/std.

Weight layouts convert 1:1 from HF CLIPVisionModel / Dinov2Model state
dicts (see convert_* below).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from theia_tpu.ops.image import preprocess_images

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    patch_size: int
    image_size: int
    layer_norm_eps: float = 1e-5
    # processor
    resize_size: int = 224
    crop_size: int = 224
    image_mean: tuple = CLIP_MEAN
    image_std: tuple = CLIP_STD
    resample: str = "cubic"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_VIT_LARGE = TowerConfig(
    hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
    patch_size=14, image_size=224,
)
DINOV2_LARGE = TowerConfig(
    hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
    patch_size=14, image_size=224, layer_norm_eps=1e-6,
    resize_size=256, image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD,
)


def _attn(q, k, v, num_heads):
    b, t, c = q.shape
    hd = c // num_heads
    q = q.reshape(b, t, num_heads, hd)
    k = k.reshape(b, k.shape[1], num_heads, hd)
    v = v.reshape(b, v.shape[1], num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)


class CLIPVisionTower(nn.Module):
    """HF CLIPVisionModel numerics: pre-layernorm ViT with quick-gelu MLPs;
    returns (last_hidden_state [B,1+N,C], pooled = post_layernorm(cls))."""

    cfg: TowerConfig = CLIP_VIT_LARGE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        do_preprocess: bool = True,
        output_hidden_indices: tuple[int, ...] = (),
    ):
        cfg = self.cfg
        c = cfg.hidden_size
        dense = lambda feats, name: nn.Dense(feats, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name, dtype=self.dtype, param_dtype=jnp.float32)

        if do_preprocess:
            x = preprocess_images(
                images, resize_size=cfg.resize_size, crop_size=cfg.crop_size,
                image_mean=cfg.image_mean, image_std=cfg.image_std,
                out_dtype=self.dtype, resample=cfg.resample,
            )
        else:
            x = images.astype(self.dtype)
            if x.shape[1] == 3 and x.shape[-1] != 3:
                x = jnp.transpose(x, (0, 2, 3, 1))

        p = cfg.patch_size
        b, h, w, _ = x.shape
        patch_kernel = self.param(
            "patch_kernel", nn.initializers.normal(0.02), (p * p * 3, c), jnp.float32
        )
        nh, nw = h // p, w // p
        x = x.reshape(b, nh, p, nw, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, -1)
        tokens = jnp.dot(x, patch_kernel.astype(self.dtype))  # CLIP patch conv has no bias

        class_emb = self.param("class_embedding", nn.initializers.normal(0.02), (c,), jnp.float32)
        cls = jnp.broadcast_to(class_emb.astype(self.dtype), (b, 1, c))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (1 + cfg.num_patches, c), jnp.float32
        )
        tokens = tokens + pos[None].astype(self.dtype)
        tokens = ln("pre_layrnorm")(tokens)

        hidden_states = [tokens]
        for i in range(cfg.num_layers):
            name = f"layer_{i}"
            h1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_ln1", dtype=self.dtype, param_dtype=jnp.float32)(tokens)
            q = dense(c, f"{name}_q")(h1)
            k = dense(c, f"{name}_k")(h1)
            v = dense(c, f"{name}_v")(h1)
            a = _attn(q, k, v, cfg.num_heads)
            tokens = tokens + dense(c, f"{name}_out")(a)
            h2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_ln2", dtype=self.dtype, param_dtype=jnp.float32)(tokens)
            h2 = dense(cfg.intermediate_size, f"{name}_fc1")(h2)
            h2 = h2 * jax.nn.sigmoid(1.702 * h2)  # quick_gelu
            tokens = tokens + dense(c, f"{name}_fc2")(h2)
            hidden_states.append(tokens)

        pooled = ln("post_layernorm")(tokens[:, 0])
        if output_hidden_indices:
            return tokens, pooled, [hidden_states[i] for i in output_hidden_indices]
        return tokens, pooled


class Dinov2Tower(nn.Module):
    """HF Dinov2Model numerics: pre-LN ViT with LayerScale; returns
    (last_hidden_state = LN(h), pooled = LN(h)[:, 0])."""

    cfg: TowerConfig = DINOV2_LARGE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        do_preprocess: bool = True,
        output_hidden_indices: tuple[int, ...] = (),
    ):
        cfg = self.cfg
        c = cfg.hidden_size
        dense = lambda feats, name: nn.Dense(feats, name=name, dtype=self.dtype, param_dtype=jnp.float32)

        if do_preprocess:
            x = preprocess_images(
                images, resize_size=cfg.resize_size, crop_size=cfg.crop_size,
                image_mean=cfg.image_mean, image_std=cfg.image_std,
                out_dtype=self.dtype, resample=cfg.resample,
            )
        else:
            x = images.astype(self.dtype)
            if x.shape[1] == 3 and x.shape[-1] != 3:
                x = jnp.transpose(x, (0, 2, 3, 1))

        p = cfg.patch_size
        b, h, w, _ = x.shape
        patch_kernel = self.param("patch_kernel", nn.initializers.normal(0.02), (p * p * 3, c), jnp.float32)
        patch_bias = self.param("patch_bias", nn.initializers.zeros, (c,), jnp.float32)
        nh, nw = h // p, w // p
        x = x.reshape(b, nh, p, nw, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, -1)
        tokens = jnp.dot(x, patch_kernel.astype(self.dtype)) + patch_bias.astype(self.dtype)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, c), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, c)), tokens], axis=1
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02), (1, 1 + cfg.num_patches, c), jnp.float32
        )
        tokens = tokens + pos.astype(self.dtype)

        hidden_states = [tokens]
        for i in range(cfg.num_layers):
            name = f"layer_{i}"
            ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_norm1", dtype=self.dtype, param_dtype=jnp.float32)
            ls1 = self.param(f"{name}_lambda1", nn.initializers.ones, (c,), jnp.float32)
            h1 = ln1(tokens)
            q = dense(c, f"{name}_q")(h1)
            k = dense(c, f"{name}_k")(h1)
            v = dense(c, f"{name}_v")(h1)
            a = dense(c, f"{name}_out")(_attn(q, k, v, cfg.num_heads))
            tokens = tokens + a * ls1.astype(self.dtype)
            ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_norm2", dtype=self.dtype, param_dtype=jnp.float32)
            ls2 = self.param(f"{name}_lambda2", nn.initializers.ones, (c,), jnp.float32)
            h2 = ln2(tokens)
            h2 = dense(cfg.intermediate_size, f"{name}_fc1")(h2)
            h2 = jax.nn.gelu(h2, approximate=False)
            h2 = dense(c, f"{name}_fc2")(h2)
            tokens = tokens + h2 * ls2.astype(self.dtype)
            hidden_states.append(tokens)

        final_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="layernorm", dtype=self.dtype, param_dtype=jnp.float32
        )
        out = final_ln(tokens)
        if output_hidden_indices:
            # HF Dinov2Backbone applies the shared final layernorm to each
            # selected stage (apply_layernorm=True); hidden_states[0] is the
            # embedding output, [i] the output of layer i
            return out, out[:, 0], [final_ln(hidden_states[i]) for i in output_hidden_indices]
        return out, out[:, 0]


def _d(sd: dict, prefix: str) -> dict:
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _l(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_clip_vision(sd: dict[str, np.ndarray], num_layers: int) -> dict:
    """HF CLIPVisionModel state dict -> CLIPVisionTower params.
    Accepts keys with or without the 'vision_model.' prefix."""
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k.removeprefix("vision_model."): v for k, v in sd.items()}
    proj = sd["embeddings.patch_embedding.weight"]  # (C, 3, p, p)
    c = proj.shape[0]
    params: dict[str, Any] = {
        "patch_kernel": proj.transpose(2, 3, 1, 0).reshape(-1, c),
        "class_embedding": sd["embeddings.class_embedding"],
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "pre_layrnorm": _l(sd, "pre_layrnorm"),
        "post_layernorm": _l(sd, "post_layernorm"),
    }
    for i in range(num_layers):
        lp = f"encoder.layers.{i}."
        params[f"layer_{i}_ln1"] = _l(sd, lp + "layer_norm1")
        params[f"layer_{i}_ln2"] = _l(sd, lp + "layer_norm2")
        params[f"layer_{i}_q"] = _d(sd, lp + "self_attn.q_proj")
        params[f"layer_{i}_k"] = _d(sd, lp + "self_attn.k_proj")
        params[f"layer_{i}_v"] = _d(sd, lp + "self_attn.v_proj")
        params[f"layer_{i}_out"] = _d(sd, lp + "self_attn.out_proj")
        params[f"layer_{i}_fc1"] = _d(sd, lp + "mlp.fc1")
        params[f"layer_{i}_fc2"] = _d(sd, lp + "mlp.fc2")
    return params


def convert_dinov2(sd: dict[str, np.ndarray], num_layers: int) -> dict:
    """HF Dinov2Model state dict -> Dinov2Tower params."""
    proj = sd["embeddings.patch_embeddings.projection.weight"]
    c = proj.shape[0]
    params: dict[str, Any] = {
        "patch_kernel": proj.transpose(2, 3, 1, 0).reshape(-1, c),
        "patch_bias": sd["embeddings.patch_embeddings.projection.bias"],
        "cls_token": sd["embeddings.cls_token"],
        "position_embeddings": sd["embeddings.position_embeddings"],
        "layernorm": _l(sd, "layernorm"),
    }
    for i in range(num_layers):
        lp = f"encoder.layer.{i}."
        params[f"layer_{i}_norm1"] = _l(sd, lp + "norm1")
        params[f"layer_{i}_norm2"] = _l(sd, lp + "norm2")
        params[f"layer_{i}_q"] = _d(sd, lp + "attention.attention.query")
        params[f"layer_{i}_k"] = _d(sd, lp + "attention.attention.key")
        params[f"layer_{i}_v"] = _d(sd, lp + "attention.attention.value")
        params[f"layer_{i}_out"] = _d(sd, lp + "attention.output.dense")
        params[f"layer_{i}_fc1"] = _d(sd, lp + "mlp.fc1")
        params[f"layer_{i}_fc2"] = _d(sd, lp + "mlp.fc2")
        params[f"layer_{i}_lambda1"] = sd[lp + "layer_scale1.lambda1"]
        params[f"layer_{i}_lambda2"] = sd[lp + "layer_scale2.lambda1"]
    return params
