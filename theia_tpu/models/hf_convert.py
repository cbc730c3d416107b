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


def _conv(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """torch Conv2d (O,I,kh,kw) -> HWIO."""
    return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0), "bias": sd[f"{prefix}.bias"]}


def _deconv(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """torch ConvTranspose2d (I,O,kh,kw) -> HWIO."""
    return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 0, 1), "bias": sd[f"{prefix}.bias"]}


def _ln_spatial(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """torch LayerNorm((C,H,W)) weights kept verbatim (LayerNormSpatial)."""
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _ln_t(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """torch LayerNorm(C) -> LayerNormTorch (torch param naming)."""
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _legit(name: str) -> str:
    return name.replace(".", "_").replace("/", "_")


def convert_light_conv_head(
    sd: dict[str, np.ndarray], prefix: str, source_spatial: int, target_spatial: int
) -> dict[str, Any]:
    """Convert one LightConvAdapterHead (reference adapter_heads.py:232-359)."""
    out: dict[str, Any] = {}
    s = source_spatial
    if f"{prefix}pad.1.weight" in sd:
        out["pad"] = {"pad_1": _deconv(sd, f"{prefix}pad.1")}
        s = 16
    if s == 16 and target_spatial == 64:
        conv_fns = {1: _deconv, 4: _deconv}
    elif target_spatial == 7:
        out["adapter_0"] = _ln_spatial(sd, f"{prefix}adapter.0")
        out["adapter_1"] = _conv(sd, f"{prefix}adapter.1")
        out["adapter_3"] = _ln_spatial(sd, f"{prefix}adapter.3")
        out["adapter_5"] = _dense(sd, f"{prefix}adapter.5")
        return out
    else:
        conv_fns = {1: _conv, 4: _conv}
    out["adapter_0"] = _ln_spatial(sd, f"{prefix}adapter.0")
    out["adapter_1"] = conv_fns[1](sd, f"{prefix}adapter.1")
    out["adapter_3"] = _ln_spatial(sd, f"{prefix}adapter.3")
    out["adapter_4"] = conv_fns[4](sd, f"{prefix}adapter.4")
    out["adapter_6"] = _ln_spatial(sd, f"{prefix}adapter.6")
    out["adapter_8"] = _dense(sd, f"{prefix}adapter.8")
    return out


def convert_conv_head(
    sd: dict[str, np.ndarray], prefix: str, source_spatial: int, target_spatial: int
) -> dict[str, Any]:
    """Convert one ConvAdapterHead (reference adapter_heads.py:130-229)."""
    out: dict[str, Any] = {}
    s = source_spatial
    if f"{prefix}pad.1.weight" in sd:
        out["pad"] = {"pad_1": _deconv(sd, f"{prefix}pad.1")}
        s = 16
    fns = {1: _deconv, 4: _deconv, 7: _deconv} if s < target_spatial else {1: _conv, 4: _conv, 7: _conv}
    out["adapter_0"] = _ln_spatial(sd, f"{prefix}adapter.0")
    out["adapter_1"] = fns[1](sd, f"{prefix}adapter.1")
    out["adapter_3"] = _ln_spatial(sd, f"{prefix}adapter.3")
    out["adapter_4"] = fns[4](sd, f"{prefix}adapter.4")
    out["adapter_6"] = _ln_spatial(sd, f"{prefix}adapter.6")
    out["adapter_7"] = fns[7](sd, f"{prefix}adapter.7")
    return out


def convert_mlp_head(sd: dict[str, np.ndarray], prefix: str) -> dict[str, Any]:
    """Convert one MLPAdapterHead (all Linear layers at adapter.{even})."""
    out: dict[str, Any] = {}
    i = 0
    while f"{prefix}adapter.{i}.weight" in sd:
        out[f"adapter_{i}"] = _dense(sd, f"{prefix}adapter.{i}")
        i += 1
        while f"{prefix}adapter.{i}.weight" not in sd and i < 64:
            i += 1
    return out


def convert_translator(
    sd: dict[str, np.ndarray],
    translator_type: str,
    target_feature_sizes: Mapping[str, tuple[int, ...]],
    backbone_spatial: int = 14,
    prefix: str = "translator.",
    translator_n_layers: int = 2,
) -> dict[str, Any]:
    """Convert a reference FeatureTranslator state dict subtree."""
    params: dict[str, Any] = {}
    if translator_type in ("mlp", "conv", "transformer", "trans"):
        params["backbone_adapter"] = {
            "adapter_0": _ln_t(sd, f"{prefix}backbone_adapter.0"),
            "adapter_1": _dense(sd, f"{prefix}backbone_adapter.1"),
        }
    for t, size in target_feature_sizes.items():
        hp = f"{prefix}translator_heads.{t.replace('.', '_')}."
        name = f"head_{_legit(t)}"
        if translator_type == "lconv":
            if "_cls" in t:
                params[name] = {"adapter_0": _dense(sd, hp + "adapter.0")}
            else:
                params[name] = convert_light_conv_head(sd, hp, backbone_spatial, size[1])
        elif translator_type == "conv":
            params[name] = convert_conv_head(sd, hp, backbone_spatial, size[1])
        else:
            params[name] = convert_mlp_head(sd, hp)
    if translator_type in ("transformer", "trans"):
        params["decode_tokens"] = sd[f"{prefix}decode_tokens"]
        for t in target_feature_sizes:
            params[f"target_model_emb_{_legit(t)}"] = sd[
                f"{prefix}target_model_emb.{t.replace('.', '_')}"
            ]
        for i in range(translator_n_layers):
            lp = f"{prefix}translator_stem.layers.{i}."
            layer: dict[str, Any] = {}
            for attn in ("self_attn", "multihead_attn"):
                layer[attn] = {
                    "in_proj_weight": sd[lp + attn + ".in_proj_weight"],
                    "in_proj_bias": sd[lp + attn + ".in_proj_bias"],
                    "out_proj": _dense(sd, lp + attn + ".out_proj"),
                }
            for m in ("norm1", "norm2", "norm3"):
                layer[m] = _ln_t(sd, lp + m)
            for m in ("linear1", "linear2"):
                layer[m] = _dense(sd, lp + m)
            params[f"stem_layer_{i}"] = layer
    return params


def export_vit_backbone(params: Mapping[str, Any], variant: str = "cls", prefix: str = "") -> dict[str, np.ndarray]:
    """Inverse of convert_vit_backbone: ViTBackbone params -> HF-layout
    state dict (for publishing / interop with the reference loader)."""
    p = {k: np.asarray(v) for k, v in params.items()}
    sd: dict[str, np.ndarray] = {}
    kernel = p["patch_kernel"]
    c = kernel.shape[1]
    ps = int((kernel.shape[0] // 3) ** 0.5)
    sd[f"{prefix}embeddings.patch_embeddings.projection.weight"] = (
        kernel.reshape(ps, ps, 3, c).transpose(3, 2, 0, 1)
    )
    sd[f"{prefix}embeddings.patch_embeddings.projection.bias"] = p["patch_bias"]
    sd[f"{prefix}embeddings.position_embeddings"] = p["position_embeddings"]
    if variant != "nocls":
        sd[f"{prefix}embeddings.cls_token"] = p["cls_token"]
    if variant == "reg":
        sd[f"{prefix}embeddings.reg_token"] = p["reg_token"]
        sd[f"{prefix}embeddings.reg_pos_embed"] = p["reg_pos_embed"]
    i = 0
    while f"block_{i}" in params:
        blk = params[f"block_{i}"]
        lp = f"{prefix}encoder.layer.{i}."
        for src, dst in [
            ("query", "attention.attention.query"), ("key", "attention.attention.key"),
            ("value", "attention.attention.value"), ("attention_output", "attention.output.dense"),
            ("intermediate", "intermediate.dense"), ("output", "output.dense"),
        ]:
            sd[lp + dst + ".weight"] = np.asarray(blk[src]["kernel"]).T
            sd[lp + dst + ".bias"] = np.asarray(blk[src]["bias"])
        for src, dst in [("layernorm_before", "layernorm_before"), ("layernorm_after", "layernorm_after")]:
            sd[lp + dst + ".weight"] = np.asarray(blk[src]["scale"])
            sd[lp + dst + ".bias"] = np.asarray(blk[src]["bias"])
        i += 1
    sd[f"{prefix}layernorm.weight"] = np.asarray(params["layernorm"]["scale"])
    sd[f"{prefix}layernorm.bias"] = np.asarray(params["layernorm"]["bias"])
    return sd


def export_theia_checkpoint(
    params: Mapping[str, Any],
    target_feature_sizes: Mapping[str, tuple[int, ...]],
    variant: str = "cls",
    backbone_spatial: int = 14,
) -> dict[str, np.ndarray]:
    """Theia params -> reference RobotVisionFM state-dict layout (lconv
    translator). Enables publishing checkpoints loadable by the reference's
    load_pretrained_weights (rvfm.py:77-87)."""
    sd = export_vit_backbone(params["backbone_module"], variant, prefix="backbone.model.")
    tr = params["translator_module"]
    for t, size in target_feature_sizes.items():
        name = f"head_{_legit(t)}"
        head = tr[name]
        hp = f"translator.translator_heads.{t.replace('.', '_')}."
        if "_cls" in t:
            sd[hp + "adapter.0.weight"] = np.asarray(head["adapter_0"]["kernel"]).T
            sd[hp + "adapter.0.bias"] = np.asarray(head["adapter_0"]["bias"])
            continue
        if "pad" in head:
            sd[hp + "pad.1.weight"] = np.asarray(head["pad"]["pad_1"]["kernel"]).transpose(2, 3, 0, 1)
            sd[hp + "pad.1.bias"] = np.asarray(head["pad"]["pad_1"]["bias"])
            s_eff = 16
        else:
            s_eff = backbone_spatial
        deconv_ladder = s_eff == 16 and size[1] == 64
        for idx, sub in [(0, "adapter_0"), (3, "adapter_3")] + (
            [(6, "adapter_6")] if f"adapter_6" in head else []
        ):
            sd[hp + f"adapter.{idx}.weight"] = np.asarray(head[sub]["weight"])
            sd[hp + f"adapter.{idx}.bias"] = np.asarray(head[sub]["bias"])
        for idx in (1, 4):
            sub = f"adapter_{idx}"
            if sub not in head:
                continue
            k = np.asarray(head[sub]["kernel"])
            if deconv_ladder:
                sd[hp + f"adapter.{idx}.weight"] = k.transpose(2, 3, 0, 1)  # HWIO -> (I,O,kh,kw)
            else:
                sd[hp + f"adapter.{idx}.weight"] = k.transpose(3, 2, 0, 1)  # HWIO -> (O,I,kh,kw)
            sd[hp + f"adapter.{idx}.bias"] = np.asarray(head[sub]["bias"])
        for idx in (5, 8):
            sub = f"adapter_{idx}"
            if sub in head:
                sd[hp + f"adapter.{idx}.weight"] = np.asarray(head[sub]["kernel"]).T
                sd[hp + f"adapter.{idx}.bias"] = np.asarray(head[sub]["bias"])
    return sd


def convert_theia_checkpoint(
    sd: dict[str, np.ndarray],
    num_layers: int,
    translator_type: str,
    target_feature_sizes: Mapping[str, tuple[int, ...]],
    variant: str = "cls",
    backbone_spatial: int = 14,
) -> dict[str, Any]:
    """Convert a full reference RobotVisionFM.state_dict() (rvfm.py:77-87) to
    a Theia param tree ({"backbone_module": ..., "translator_module": ...})."""
    reg_sd = dict(sd)
    if variant == "reg":
        # reference stores reg params under embeddings.* of the inner model
        reg_sd["backbone.model.embeddings.reg_token"] = sd["backbone.model.embeddings.reg_token"]
    return {
        "backbone_module": convert_vit_backbone(
            reg_sd, num_layers, variant=variant, prefix="backbone.model."
        ),
        "translator_module": convert_translator(
            sd, translator_type, target_feature_sizes, backbone_spatial, prefix="translator."
        ),
    }
