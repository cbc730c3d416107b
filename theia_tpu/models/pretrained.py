"""Checkpoint loading for Theia models.

Supports:
  - orbax train-state directories (this framework's native format);
  - reference RobotVisionFM ``torch.save(state_dict())`` .pth files
    (reference: src/theia/models/rvfm.py:77-87 load_pretrained_weights),
    converted on the fly;
  - published HF-hub style theia checkpoints (same state-dict layout).

Like the reference loader, missing/mismatched teacher heads are tolerated:
keys absent from the checkpoint keep their initialized values (strict=False
semantics).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.models.hf_convert import convert_theia_checkpoint, state_dict_to_numpy


def _merge_loose(init: Any, loaded: Any) -> Any:
    """Overlay loaded leaves onto the init tree where paths match."""
    if isinstance(init, dict):
        out = {}
        for k, v in init.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_loose(v, loaded[k])
            else:
                out[k] = v
        return out
    arr = np.asarray(loaded)
    if arr.shape != tuple(init.shape):
        return init
    return jnp.asarray(arr, dtype=init.dtype)


def load_theia_checkpoint(path: str, model: Any, init_params: Optional[Any] = None) -> Any:
    """Load checkpoint at ``path`` into a param tree for ``model`` (a Theia
    module). Returns params."""
    if init_params is None:
        dummy = jnp.zeros((1, model.image_size, model.image_size, 3), jnp.uint8)
        init_params = model.init(jax.random.PRNGKey(0), dummy)["params"]

    if os.path.isdir(path):  # orbax checkpoint dir (TrainState or params)
        from theia_tpu.train.checkpoint import restore_checkpoint
        from theia_tpu.train.state import TrainState

        import optax

        tx = optax.sgd(0.0)
        target = TrainState.create(init_params, tx)
        restored = restore_checkpoint(path, target)
        if restored is not None:
            return restored.params
        raise FileNotFoundError(f"no orbax checkpoint under {path}")

    # torch .pth / .pt / safetensors state dict in the reference layout
    if path.endswith(".safetensors"):
        with open(path, "rb") as f:
            from theia_tpu.data.webdataset import load_safetensors_np

            sd = load_safetensors_np(f.read())
    else:
        import torch

        sd = state_dict_to_numpy(torch.load(path, map_location="cpu", weights_only=True))

    backbone = model.backbone
    variant = "reg" if "reg" in backbone else ("nocls" if "nocls" in backbone else "cls")
    from theia_tpu.models.vit import BACKBONE_CONFIGS

    num_layers = BACKBONE_CONFIGS[backbone].num_layers
    try:
        converted = convert_theia_checkpoint(
            sd,
            num_layers=num_layers,
            translator_type=model.translator,
            target_feature_sizes=model.target_feature_sizes or {},
            variant=variant,
        )
    except KeyError as e:
        raise KeyError(
            f"checkpoint at {path} does not look like a reference RobotVisionFM "
            f"state dict (missing {e})"
        ) from e
    return _merge_loose(init_params, converted)
