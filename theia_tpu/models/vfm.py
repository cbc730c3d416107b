"""Baseline VFM encoder wrappers (reference: src/theia/models/vfm.py:13-204).

Wrap any single teacher (or a concatenation of several) behind the same
``forward_feature`` API as Theia, for baseline comparisons. External
robot-learning baselines (MVP, VIP, R3M, NVIDIA RADIO) are import-gated
exactly like the reference (those packages are optional extras there too).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.models.utils import handle_feature_output


class VFMEncoder:
    """One off-the-shelf teacher behind forward_feature."""

    def __init__(
        self,
        model_name: str,
        feature_reduce_method: Optional[str] = None,
        hf_model: Optional[Any] = None,
        dtype: Any = jnp.float32,
        **kwargs: Any,
    ) -> None:
        from theia_tpu import foundation as f

        self.model_name = model_name
        self.feature_reduce_method = feature_reduce_method
        if "google/vit" in model_name:
            self.module, self.params = f.get_vit_model(model_name, hf_model, dtype)
        elif "facebook/dino" in model_name:
            self.module, self.params = f.get_dinov2_model(model_name, hf_model, dtype)
        elif "facebook/sam" in model_name:
            self.module, self.params = f.get_sam_model(model_name, hf_model, dtype)
        elif "openai/clip" in model_name:
            self.module, self.params = f.get_clip_model(model_name, hf_model, dtype)
        elif "facebook/deit" in model_name:
            self.module, self.params = f.get_deit_model(model_name, hf_model, dtype)
        elif "nvidia" in model_name:
            # RADIO baseline: HF remote-code model (reference vfm.py:43-45);
            # host-side torch, requires hub access — gated like upstream
            from transformers import AutoImageProcessor, AutoModel

            self.module = AutoModel.from_pretrained(model_name, trust_remote_code=True)
            self.params = "torch"  # sentinel: torch-module path
            self._radio_processor = AutoImageProcessor.from_pretrained(model_name)
        elif "mvp" in model_name:
            import mvp  # optional external baseline (reference vfm.py:47-51)

            self.module = mvp.load(model_name.replace("mvp-", ""))
            self.params = None
        elif "vip" in model_name:
            from vip import load_vip

            self.module = load_vip()
            self.params = None
        elif "r3m" in model_name:
            from r3m import load_r3m

            self.module = load_r3m(model_name.replace("r3m-", ""))
            self.params = None
        else:
            raise NotImplementedError(f"{model_name} is not supported in theia_tpu.models.vfm")
        self.image_size = kwargs.get("image_size", 224)
        self.final_spatial = kwargs.get("final_spatial")
        self._fwd = None

    def load_params(self, params: Any) -> None:
        self.params = params

    def get_feature(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        if self.params is None:
            raise RuntimeError(f"no weights loaded for {self.model_name}")
        if "nvidia" in self.model_name:
            import numpy as np
            import torch

            inputs = self._radio_processor(images=list(np.asarray(x)), return_tensors="pt")
            with torch.no_grad():
                summary, feature = self.module(inputs["pixel_values"].to(torch.bfloat16))
            if self.feature_reduce_method == "cls_identity":
                return jnp.asarray(summary.float().numpy())
            return jnp.asarray(feature.float().numpy())
        if "facebook/sam" in self.model_name:
            out = self.module.apply({"params": self.params}, x)  # NHWC [B,64,64,256]
            b, h, w, c = out.shape
            return out.reshape(b, h * w, c)
        if "openai/clip" in self.model_name or "facebook/dino" in self.model_name:
            tokens, _ = self.module.apply({"params": self.params}, x)
            return tokens
        return self.module.apply({"params": self.params}, x)

    def forward(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        feature = self.get_feature(x, **kwargs)
        if "facebook/sam" in self.model_name:
            # spatial-only feature map: no CLS to strip
            return handle_feature_output(feature, "identity" if self.feature_reduce_method is None else self.feature_reduce_method)
        return handle_feature_output(feature, self.feature_reduce_method)

    __call__ = forward

    def forward_feature(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        return self.forward(x, **kwargs)


class ConcatVFMEncoder:
    """Concatenation of several teachers' features along the channel dim
    (reference vfm.py:141-204)."""

    def __init__(
        self,
        model_names: list[str],
        feature_reduce_method: Optional[str] = None,
        hf_models: Optional[dict[str, Any]] = None,
        **kwargs: Any,
    ) -> None:
        hf_models = hf_models or {}
        self.encoders = [
            VFMEncoder(m, feature_reduce_method, hf_models.get(m), **kwargs) for m in model_names
        ]
        self.feature_reduce_method = feature_reduce_method

    def forward(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        feats = [e.forward(x, **kwargs) for e in self.encoders]
        n = min(f.shape[1] for f in feats) if feats[0].ndim == 3 else None
        if n is not None:
            feats = [f[:, :n] for f in feats]
        return jnp.concatenate(feats, axis=-1)

    __call__ = forward

    def forward_feature(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        return self.forward(x, **kwargs)
