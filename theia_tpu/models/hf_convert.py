"""Convert PyTorch/HF ViT weights into theia-tpu param pytrees.

Used for (a) numerics-parity tests against HF `ViTModel` and (b) loading
reference-trained Theia checkpoints (reference checkpoints are
RobotVisionFM.state_dict() with keys like ``backbone.model.embeddings.*`` and
``translator.translator_heads.*`` — reference: src/theia/models/rvfm.py:77-87).

All functions take a flat ``{name: np.ndarray}`` mapping (call ``.numpy()``
on torch tensors first, or use :func:`state_dict_to_numpy`).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def _dense(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """torch Linear (out,in) -> flax Dense kernel (in,out)."""
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_vit_backbone(
    sd: dict[str, np.ndarray],
    num_layers: int,
    variant: str = "cls",
    prefix: str = "",
) -> dict[str, Any]:
    """Convert an HF ViTModel (or reference DeiT*/ViTModelNoCLS/ViTModelReg)
    state dict into a ViTBackbone param tree.

    ``prefix`` selects the submodule, e.g. "" for a bare ViTModel or
    "backbone.model." inside a reference RobotVisionFM checkpoint.
    """
    p = prefix
    params: dict[str, Any] = {}
    proj = sd[f"{p}embeddings.patch_embeddings.projection.weight"]  # (C, 3, kh, kw)
    c = proj.shape[0]
    # conv weight (C,3,kh,kw) -> matmul kernel ((kh,kw,3) flattened, C)
    params["patch_kernel"] = proj.transpose(2, 3, 1, 0).reshape(-1, c)
    params["patch_bias"] = sd[f"{p}embeddings.patch_embeddings.projection.bias"]
    params["position_embeddings"] = sd[f"{p}embeddings.position_embeddings"]
    if variant != "nocls":
        params["cls_token"] = sd[f"{p}embeddings.cls_token"]
    if variant == "reg":
        params["reg_token"] = sd[f"{p}embeddings.reg_token"]
        params["reg_pos_embed"] = sd[f"{p}embeddings.reg_pos_embed"]
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        params[f"block_{i}"] = {
            "layernorm_before": _ln(sd, lp + "layernorm_before"),
            "layernorm_after": _ln(sd, lp + "layernorm_after"),
            "query": _dense(sd, lp + "attention.attention.query"),
            "key": _dense(sd, lp + "attention.attention.key"),
            "value": _dense(sd, lp + "attention.attention.value"),
            "attention_output": _dense(sd, lp + "attention.output.dense"),
            "intermediate": _dense(sd, lp + "intermediate.dense"),
            "output": _dense(sd, lp + "output.dense"),
        }
    params["layernorm"] = _ln(sd, f"{p}layernorm")
    return params
