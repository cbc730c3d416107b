"""Theia: the robot-vision foundation-model student (RVFM).

TPU-native equivalent of reference RobotVisionFM
(reference: src/theia/models/rvfm.py:15-185): a ViT/DeiT backbone plus a
feature translator with per-teacher heads. Public API matches the reference:

  - ``forward_feature(x)``: backbone tokens, reduced per
    ``feature_reduce_method`` (rvfm.py:94-113).
  - ``__call__(x, target_model_names)``: dict[teacher -> predicted feature],
    register tokens dropped before translation (rvfm.py:115-136).
  - loss terms live in theia_tpu.models.losses (pure fns, jitted into the
    train step).

Being functional JAX, weights are a separate pytree; use
``theia_tpu.models.pretrained`` to load reference checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from theia_tpu.models.translators import build_feature_translator
from theia_tpu.models.utils import handle_feature_output
from theia_tpu.models.vit import build_backbone


class Theia(nn.Module):
    """Student model: backbone + translator (reference RobotVisionFM)."""

    backbone: str = "facebook/deit-small-patch16-224"
    pretrained: bool = False  # weight loading is external; kept for config parity
    translator: str = "lconv"
    target_feature_sizes: Optional[dict[str, tuple[int, ...]]] = None
    translator_kwargs: Optional[dict[str, Any]] = None
    target_loss_weights: Optional[dict[str, float]] = None
    feature_reduce_method: Optional[str] = None
    image_size: int = 224
    num_reg_tokens: int = 7  # used only by "reg-" backbones
    dtype: Any = jnp.float32
    fuse_preprocessing: bool = False  # fold processor into the patch conv
    fast_math: bool = False  # bf16 softmax + tanh gelu in the backbone

    def setup(self) -> None:
        self.backbone_module = build_backbone(
            self.backbone,
            self.pretrained,
            image_size=self.image_size,
            dtype=self.dtype,
            num_reg_tokens=self.num_reg_tokens,
            fuse_preprocessing=self.fuse_preprocessing,
            fast_math=self.fast_math,
        )
        self.no_cls = self.backbone_module.no_cls
        self.num_reg = self.backbone_module.num_reg_tokens if self.backbone_module.variant == "reg" else 0
        self.final_spatial = self.backbone_module.cfg.spatial
        if self.target_feature_sizes:
            kwargs = dict(self.translator_kwargs or {})
            kwargs["backbone_feature_size"] = self.backbone_module.get_feature_size(keep_spatial=True)
            kwargs["target_feature_sizes"] = dict(self.target_feature_sizes)
            kwargs["dtype"] = self.dtype
            self.translator_module = build_feature_translator(self.translator, **kwargs)

    def forward_feature(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        """Backbone feature only (before translators). Accepts uint8 images
        in [B,H,W,C] or [B,C,H,W], range 0-255 (reference rvfm.py:94-113)."""
        feature = self.backbone_module(x, **kwargs)
        return handle_feature_output(
            feature,
            feature_reduce_method=self.feature_reduce_method,
            num_discard_tokens=self.num_reg,
        )

    def __call__(
        self,
        x: jax.Array,
        target_model_names: Optional[list[str]] = None,
        **kwargs: Any,
    ) -> dict[str, jax.Array]:
        """Predict teacher features: dict[teacher -> [B, H*W, C] or [B, C]]."""
        x = self.backbone_module(x, **kwargs)
        if self.num_reg > 0:
            x = x[:, : x.shape[1] - self.num_reg]
        return self.translator_module(x, target_model_names, backbone_no_cls=self.no_cls)
