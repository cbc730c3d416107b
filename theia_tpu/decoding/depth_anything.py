"""Depth decoding from predicted depth-anything head features
(reference: src/theia/decoding/depth_anything.py:11-57): interp the 32ch
feature to 224, apply the pretrained head tail (relu -> conv3 -> relu),
min-max normalize per image."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.foundation.depth_anything import (
    DEPTH_ANYTHING_LARGE,
    DepthAnything,
    convert_depth_anything,
)
from theia_tpu.ops.image import interpolate_nearest


def prepare_depth_decoder(
    model_name: str = "LiheYoung/depth-anything-large-hf",
    hf_model: Optional[Any] = None,
) -> tuple[dict, int]:
    """Returns (head-tail params {conv3 kernel/bias}, patch_size). Weights
    come from a converted Depth-Anything checkpoint (hf_model) or must be
    supplied by the caller."""
    if hf_model is not None:
        from theia_tpu.models.hf_convert import state_dict_to_numpy

        params = convert_depth_anything(state_dict_to_numpy(hf_model.state_dict()))
    else:
        module = DepthAnything(DEPTH_ANYTHING_LARGE)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 518, 518), jnp.float32), do_preprocess=False
        )["params"]
    head = {
        "conv3_kernel": np.asarray(params["head_conv3_kernel"]),
        "conv3_bias": np.asarray(params["head_conv3_bias"]),
    }
    return head, DEPTH_ANYTHING_LARGE.patch_size


def decode_depth_anything(features: np.ndarray, decoder: dict) -> np.ndarray:
    """[B, num_tokens, 32] predicted head features -> [B, 224, 224, 3] in [0,1]."""
    features = jnp.asarray(np.asarray(features, np.float32))
    b, n, c = features.shape
    p = int(n ** 0.5)
    x = features.reshape(b, p, p, c)
    x = interpolate_nearest(x, 224, 224)
    x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(decoder["conv3_kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(decoder["conv3_bias"])
    x = jax.nn.relu(x)[..., 0]
    x = np.asarray(x)
    out = np.empty_like(x)
    for i in range(b):
        lo, hi = x[i].min(), x[i].max()
        out[i] = (x[i] - lo) / max(hi - lo, 1e-12)
    return np.repeat(out[..., None], 3, axis=-1)
