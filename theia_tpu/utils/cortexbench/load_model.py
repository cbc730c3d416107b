"""CortexBench model loader (reference:
src/theia/utils/cortexbench/load_model.py:13-40): probe the embedding shape
with a dummy image and return (model_fn, (C, H, W), transform, metadata)."""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def load_model(
    model: Any,
    params: Any,
    transform: Callable,
    metadata: Any = None,
    checkpoint_path: Optional[str] = None,
    **kwargs: Any,
):
    """Returns (forward_feature_fn, embedding_dim, transform, metadata).

    ``model`` is a Theia module (or anything with a forward_feature method);
    ``checkpoint_path`` loads weights like the reference's
    load_pretrained_weights hook.
    """
    if checkpoint_path:
        from theia_tpu.models.pretrained import load_theia_checkpoint

        params = load_theia_checkpoint(checkpoint_path, model, init_params=params)

    def forward_feature(x: jax.Array) -> jax.Array:
        return model.apply({"params": params}, x, method=model.forward_feature)

    zero_img = np.zeros((100, 100, 3), np.uint8)
    probe = transform(zero_img)[None]
    emb = forward_feature(jnp.asarray(probe))
    embedding_dim = tuple(emb.shape[1:])  # [H*W, C]
    if len(embedding_dim) > 1:
        h = w = int(math.isqrt(embedding_dim[0]))
        embedding_dim = (embedding_dim[1], h, w)  # [C, H, W]
    return forward_feature, embedding_dim, transform, metadata
