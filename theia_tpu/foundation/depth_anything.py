"""Depth-Anything teacher: DINOv2 backbone + DPT neck/head.

Port of the behavior in the reference's vendored implementation (reference:
src/theia/foundation_models/vision_models/depth_anything.py:143-601):
  - Dinov2Backbone hidden states at 4 stages (shared final-LN applied);
  - reassemble stage (1x1 proj + resize ladder per stage: deconv x4/x2,
    identity, stride-2 conv), 3x3 biasless convs to fusion width;
  - feature-fusion stage (pre-act residual units, bilinear
    align_corners=True upsampling, 1x1 projections);
  - depth head; the stored teacher feature is the head's conv1->
    bilinear-to-input-res -> conv2 output ("head" feature,
    DepthAnythingHeadFeature :551-601), which extraction nearest-resizes to
    (64, 64) (preprocessing/feature_extraction_core/models.py:91-93).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from theia_tpu.foundation.towers import (
    DINOV2_LARGE,
    Dinov2Tower,
    TowerConfig,
    convert_dinov2,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from theia_tpu.ops.convt import conv_transpose_2d
from theia_tpu.ops.image import bicubic_resize, preprocess_images


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    backbone: TowerConfig = dataclasses.replace(
        DINOV2_LARGE, image_size=518, resize_size=518, crop_size=518
    )
    # hidden_states indices into [embeddings, layer1..layerN]
    backbone_stage_indices: tuple[int, ...] = (5, 12, 18, 24)
    reassemble_hidden_size: int = 1024
    neck_hidden_sizes: tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    head_hidden_size: int = 32
    patch_size: int = 14


DEPTH_ANYTHING_LARGE = DepthAnythingConfig()


def _conv(x, kernel, bias=None, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if bias is None else y + bias


def _bilinear(x, h, w, align_corners):
    return bicubic_resize(x, h, w, kernel="linear", antialias=False, align_corners=align_corners)


class DepthAnything(nn.Module):
    """Returns (predicted_depth [B,H,W], head_feature [B,H,W,head_hidden])."""

    cfg: DepthAnythingConfig = DEPTH_ANYTHING_LARGE
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.backbone_module = Dinov2Tower(self.cfg.backbone, dtype=self.dtype)
        cfg = self.cfg
        f = cfg.fusion_hidden_size
        init = nn.initializers.normal(0.02)
        # reassemble projections + resizes
        proj, resize = [], []
        for i, (ch, factor) in enumerate(zip(cfg.neck_hidden_sizes, cfg.reassemble_factors)):
            proj.append(
                (self.param(f"reassemble_{i}_proj_kernel", init, (1, 1, cfg.reassemble_hidden_size, ch)),
                 self.param(f"reassemble_{i}_proj_bias", nn.initializers.zeros, (ch,)))
            )
            if factor > 1:
                k = int(factor)
                resize.append(
                    (self.param(f"reassemble_{i}_resize_kernel", init, (k, k, ch, ch)),
                     self.param(f"reassemble_{i}_resize_bias", nn.initializers.zeros, (ch,)))
                )
            elif factor < 1:
                resize.append(
                    (self.param(f"reassemble_{i}_resize_kernel", init, (3, 3, ch, ch)),
                     self.param(f"reassemble_{i}_resize_bias", nn.initializers.zeros, (ch,)))
                )
            else:
                resize.append(None)
        self.reassemble_proj = proj
        self.reassemble_resize = resize
        self.neck_convs = [
            self.param(f"neck_conv_{i}_kernel", init, (3, 3, ch, f))
            for i, ch in enumerate(cfg.neck_hidden_sizes)
        ]
        # fusion layers: projection + 2 pre-act residual units (2 convs each)
        fusion = []
        for i in range(len(cfg.neck_hidden_sizes)):
            layer = {
                "proj": (self.param(f"fusion_{i}_proj_kernel", init, (1, 1, f, f)),
                         self.param(f"fusion_{i}_proj_bias", nn.initializers.zeros, (f,))),
            }
            for r in (1, 2):
                for c in (1, 2):
                    layer[f"res{r}_conv{c}"] = (
                        self.param(f"fusion_{i}_res{r}_conv{c}_kernel", init, (3, 3, f, f)),
                        self.param(f"fusion_{i}_res{r}_conv{c}_bias", nn.initializers.zeros, (f,)),
                    )
            fusion.append(layer)
        self.fusion = fusion
        self.head_conv1 = (self.param("head_conv1_kernel", init, (3, 3, f, f // 2)),
                           self.param("head_conv1_bias", nn.initializers.zeros, (f // 2,)))
        self.head_conv2 = (self.param("head_conv2_kernel", init, (3, 3, f // 2, cfg.head_hidden_size)),
                           self.param("head_conv2_bias", nn.initializers.zeros, (cfg.head_hidden_size,)))
        self.head_conv3 = (self.param("head_conv3_kernel", init, (1, 1, cfg.head_hidden_size, 1)),
                           self.param("head_conv3_bias", nn.initializers.zeros, (1,)))

    def _residual_unit(self, x, layer, r):
        h = jax.nn.relu(x)
        k, b = layer[f"res{r}_conv1"]
        h = _conv(h, k.astype(self.dtype), b, padding=1)
        h = jax.nn.relu(h)
        k, b = layer[f"res{r}_conv2"]
        h = _conv(h, k.astype(self.dtype), b, padding=1)
        return h + x

    def neck_features(self, images: jax.Array, do_preprocess: bool = True) -> list[jax.Array]:
        cfg = self.cfg
        if do_preprocess:
            x = preprocess_images(
                images, resize_size=cfg.backbone.image_size, crop_size=cfg.backbone.image_size,
                image_mean=IMAGENET_MEAN, image_std=IMAGENET_STD, out_dtype=self.dtype,
            )
        else:
            x = images.astype(self.dtype)
            if x.shape[1] == 3 and x.shape[-1] != 3:
                x = jnp.transpose(x, (0, 2, 3, 1))
        ph = pw = cfg.backbone.image_size // cfg.patch_size
        _, _, states = self.backbone_module(
            x, do_preprocess=False, output_hidden_indices=cfg.backbone_stage_indices
        )

        # reassemble: drop cls, to NHWC map, 1x1 proj, resize ladder
        feats = []
        for i, h in enumerate(states):
            b, _, c = h.shape
            m = h[:, 1:].reshape(b, ph, pw, c)
            pk, pb = self.reassemble_proj[i]
            m = _conv(m, pk.astype(self.dtype), pb)
            factor = self.cfg.reassemble_factors[i]
            if factor > 1:
                rk, rb = self.reassemble_resize[i]
                m = conv_transpose_2d(m, rk.astype(self.dtype), stride=int(factor)) + rb
            elif factor < 1:
                rk, rb = self.reassemble_resize[i]
                m = _conv(m, rk.astype(self.dtype), rb, stride=int(1 / factor), padding=1)
            m = _conv(m, self.neck_convs[i].astype(self.dtype), padding=1)
            feats.append(m)

        # fusion (reference :252-319): start from deepest
        rev = feats[::-1]
        fused_list = []
        layer = self.fusion[0]
        h0 = self._residual_unit(rev[0], layer, 2)
        h0 = _bilinear(h0, rev[1].shape[1], rev[1].shape[2], align_corners=True)
        pk, pb = layer["proj"]
        fused = _conv(h0, pk.astype(self.dtype), pb)
        fused_list.append(fused)
        for idx in range(1, len(rev)):
            layer = self.fusion[idx]
            residual = rev[idx]
            if fused.shape != residual.shape:
                residual = _bilinear(residual, fused.shape[1], fused.shape[2], align_corners=False)
            h = fused + self._residual_unit(residual, layer, 1)
            h = self._residual_unit(h, layer, 2)
            if idx != len(rev) - 1:
                th, tw = rev[idx + 1].shape[1], rev[idx + 1].shape[2]
            else:
                th, tw = h.shape[1] * 2, h.shape[2] * 2
            h = _bilinear(h, th, tw, align_corners=True)
            pk, pb = layer["proj"]
            fused = _conv(h, pk.astype(self.dtype), pb)
            fused_list.append(fused)
        return fused_list

    def head_feature(self, images: jax.Array, do_preprocess: bool = True) -> jax.Array:
        """DepthAnythingHeadFeature (:551-601): conv1 -> bilinear(ac=True) to
        input res -> conv2. NHWC output [B, H, W, head_hidden]."""
        cfg = self.cfg
        fused = self.neck_features(images, do_preprocess=do_preprocess)
        h = fused[-1]
        k, b = self.head_conv1
        h = _conv(h, k.astype(self.dtype), b, padding=1)
        size = cfg.backbone.image_size
        h = _bilinear(h, size, size, align_corners=True)
        k, b = self.head_conv2
        h = _conv(h, k.astype(self.dtype), b, padding=1)
        return h

    def __call__(self, images: jax.Array, do_preprocess: bool = True) -> jax.Array:
        """Full depth estimation (reference :437-507): head feature ->
        relu -> conv3 -> relu -> [B, H, W] depth."""
        h = self.head_feature(images, do_preprocess=do_preprocess)
        h = jax.nn.relu(h)
        k, b = self.head_conv3
        h = _conv(h, k.astype(self.dtype), b)
        h = jax.nn.relu(h)
        return h[..., 0]


def convert_depth_anything(
    sd: dict[str, np.ndarray], cfg: DepthAnythingConfig = DEPTH_ANYTHING_LARGE
) -> dict:
    """HF DepthAnythingForDepthEstimation state dict -> DepthAnything params."""
    params: dict[str, Any] = {
        "backbone_module": convert_dinov2(
            {k.removeprefix("backbone."): v for k, v in sd.items() if k.startswith("backbone.")},
            cfg.backbone.num_layers,
        )
    }
    for i, factor in enumerate(cfg.reassemble_factors):
        rp = f"neck.reassemble_stage.layers.{i}."
        params[f"reassemble_{i}_proj_kernel"] = sd[rp + "projection.weight"].transpose(2, 3, 1, 0)
        params[f"reassemble_{i}_proj_bias"] = sd[rp + "projection.bias"]
        if factor > 1:
            params[f"reassemble_{i}_resize_kernel"] = sd[rp + "resize.weight"].transpose(2, 3, 0, 1)
            params[f"reassemble_{i}_resize_bias"] = sd[rp + "resize.bias"]
        elif factor < 1:
            params[f"reassemble_{i}_resize_kernel"] = sd[rp + "resize.weight"].transpose(2, 3, 1, 0)
            params[f"reassemble_{i}_resize_bias"] = sd[rp + "resize.bias"]
        params[f"neck_conv_{i}_kernel"] = sd[f"neck.convs.{i}.weight"].transpose(2, 3, 1, 0)
        fp = f"neck.fusion_stage.layers.{i}."
        params[f"fusion_{i}_proj_kernel"] = sd[fp + "projection.weight"].transpose(2, 3, 1, 0)
        params[f"fusion_{i}_proj_bias"] = sd[fp + "projection.bias"]
        for r in (1, 2):
            for c in (1, 2):
                w = sd[fp + f"residual_layer{r}.convolution{c}.weight"]
                params[f"fusion_{i}_res{r}_conv{c}_kernel"] = w.transpose(2, 3, 1, 0)
                params[f"fusion_{i}_res{r}_conv{c}_bias"] = sd[fp + f"residual_layer{r}.convolution{c}.bias"]
    for j in (1, 2, 3):
        params[f"head_conv{j}_kernel"] = sd[f"head.conv{j}.weight"].transpose(2, 3, 1, 0)
        params[f"head_conv{j}_bias"] = sd[f"head.conv{j}.bias"]
    return params


def get_depth_anything_model(
    model_name: str = "LiheYoung/depth-anything-large-hf",
    hf_model: Optional[Any] = None,
    dtype: Any = jnp.float32,
    cfg: DepthAnythingConfig = DEPTH_ANYTHING_LARGE,
    selected_feature: str = "head",
):
    module = DepthAnything(cfg, dtype=dtype)
    params = None
    if hf_model is not None:
        from theia_tpu.models.hf_convert import state_dict_to_numpy

        params = convert_depth_anything(state_dict_to_numpy(hf_model.state_dict()), cfg)
    return module, params


def get_depth_anything_feature(module: DepthAnything, params, images: jax.Array):
    """Head feature in BCHW (reference feature path); extraction resizes to
    (64, 64) nearest before storage (feature_extraction_core/models.py:91-93)."""
    h = module.apply({"params": params}, images, method=module.head_feature)
    return jnp.transpose(h, (0, 3, 1, 2))
