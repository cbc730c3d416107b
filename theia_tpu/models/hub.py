"""Published-model API: the equivalent of the reference's
``AutoModel.from_pretrained("theaiinstitute/theia-<size>-patch16-224-<teachers>",
trust_remote_code=True)`` entry point (reference: README.md:23-38).

``from_pretrained`` parses the published name into (backbone size, teacher
set), builds the Theia module and loads weights from a local checkpoint
(orbax dir, reference .pth state dict, or safetensors). Hub downloads are
environment-dependent and attempted only as a fallback via huggingface_hub.

Returned object supports the published usage:
    model = from_pretrained("theaiinstitute/theia-tiny-patch16-224-cdiv", ckpt)
    feature = model.forward_feature(images)            # uint8 [B,H,W,C]
    preds = model(images)                              # dict[teacher, feature]
    model.feature_reduce_method = "mean_pooling"
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp

from theia_tpu.foundation.common import get_model_feature_size

TEACHER_SETS = {
    "cdiv": ["google/vit-huge-patch14-224-in21k", "facebook/dinov2-large", "openai/clip-vit-large-patch14"],
    "cddsv": [
        "google/vit-huge-patch14-224-in21k", "facebook/dinov2-large",
        "openai/clip-vit-large-patch14", "facebook/sam-vit-huge",
        "LiheYoung/depth-anything-large-hf",
    ],
    "cdds": ["facebook/dinov2-large", "openai/clip-vit-large-patch14", "facebook/sam-vit-huge", "LiheYoung/depth-anything-large-hf"],
    "cddv": ["google/vit-huge-patch14-224-in21k", "facebook/dinov2-large", "openai/clip-vit-large-patch14", "LiheYoung/depth-anything-large-hf"],
    "cdis": ["facebook/dinov2-large", "openai/clip-vit-large-patch14", "facebook/sam-vit-huge"],
    "cdisv": ["google/vit-huge-patch14-224-in21k", "facebook/dinov2-large", "openai/clip-vit-large-patch14", "facebook/sam-vit-huge"],
    "cdesv": ["google/vit-huge-patch14-224-in21k", "openai/clip-vit-large-patch14", "facebook/sam-vit-huge", "LiheYoung/depth-anything-large-hf"],
    "ddsv": ["google/vit-huge-patch14-224-in21k", "facebook/dinov2-large", "facebook/sam-vit-huge", "LiheYoung/depth-anything-large-hf"],
}

_NAME_RE = re.compile(r"theia-(tiny|small|base)-patch16-224(?:-([a-z]+))?")


class PretrainedTheia:
    """Stateful convenience wrapper bundling the Theia module and params."""

    def __init__(self, model: Any, params: Any, feature_reduce_method: Optional[str] = None):
        self.model = model
        self.params = params
        self.feature_reduce_method = feature_reduce_method
        self._fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
        self._ff = jax.jit(
            lambda p, x, reduce: model.apply(
                {"params": p}, x, method=model.forward_feature
            ),
            static_argnums=(2,),
        )

    def forward_feature(self, x, **kwargs: Any):
        if self.feature_reduce_method != self.model.feature_reduce_method:
            model = dataclasses.replace(self.model, feature_reduce_method=self.feature_reduce_method)
            return model.apply({"params": self.params}, jnp.asarray(x), method=model.forward_feature)
        return self._ff(self.params, jnp.asarray(x), self.feature_reduce_method)

    def __call__(self, x, **kwargs: Any):
        return self._fwd(self.params, jnp.asarray(x))


def parse_model_name(name: str) -> tuple[str, list[str]]:
    m = _NAME_RE.search(name)
    if not m:
        raise ValueError(f"{name!r} is not a recognized theia model name")
    size, teachers = m.group(1), m.group(2) or "cdiv"
    if teachers not in TEACHER_SETS:
        raise ValueError(f"unknown teacher set {teachers!r} in {name!r}")
    return f"facebook/deit-{size}-patch16-224", TEACHER_SETS[teachers]


def from_pretrained(
    name: str,
    checkpoint_path: Optional[str] = None,
    feature_reduce_method: Optional[str] = None,
    dtype: Any = jnp.float32,
    **kwargs: Any,
) -> PretrainedTheia:
    """Build a published Theia model; load weights from ``checkpoint_path``
    (or try the HF hub when reachable)."""
    from theia_tpu.models.pretrained import load_theia_checkpoint
    from theia_tpu.models.rvfm import Theia

    backbone, teachers = parse_model_name(name)
    sizes = {t: get_model_feature_size(t, keep_spatial=True) for t in teachers}
    model = Theia(
        backbone=backbone,
        translator="lconv",
        target_feature_sizes=sizes,
        feature_reduce_method=feature_reduce_method,
        dtype=dtype,
    )
    if checkpoint_path is None:
        try:  # pragma: no cover - requires network/cache
            from huggingface_hub import hf_hub_download

            checkpoint_path = hf_hub_download(name, "model.safetensors")
        except Exception as e:
            raise FileNotFoundError(
                f"no local checkpoint_path given and hub fetch failed for {name}: {e}"
            ) from e
    params = load_theia_checkpoint(checkpoint_path, model)
    return PretrainedTheia(model, params, feature_reduce_method)
