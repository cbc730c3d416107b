"""Build the ACTUAL reference RobotVisionFM offline and produce golden
fixtures (stored reference-produced tensors) for parity tests — one fixture
per shipped configuration (backbone size x variant x translator x
distill_cls), so the <1e-3 BASELINE parity surface covers the config
matrix, not one cell.

The reference constructs its backbone with AutoModel.from_pretrained
(reference: src/theia/models/backbones.py:276) and its processor/config from
the hub — unavailable offline (zero egress, no HF cache) — so those entry
points are patched to equivalent local constructions (the published
facebook/deit-* checkpoints are ViTModel + the stock DeiTImageProcessor
defaults). Everything else — RobotVisionFM, build_backbone wiring, the
translators, handle_feature_output, get_loss — is the reference's own code
executed via tests/reference_loader.py.

Weights are NOT stored (60+ MB each); they are reconstructed at test time
from the fixed torch seed, and the test asserts the regenerated reference
outputs are bitwise-close to the stored fixture first — any environment/RNG
drift fails loudly before any parity claim is made.

The legacy tiny/cddsv fixture keeps float32 storage (bit-compat with the
round-2 fixture); new matrix fixtures store features/preds as float16
(quantization ~1e-7 MSE, three orders below the 1e-3 parity bar) to keep
the repo small. Losses are always float32.

NOTE the deliberate matrix hole: the reference's TRANSFORMER translator
crashes at runtime (einops 195!=196, documented divergence in TODO.md), so
no reference-run fixture can exist for it; its parity coverage stays at the
module level (test_translators vs the reference math).
"""

from __future__ import annotations

import dataclasses
import sys
import types
from contextlib import contextmanager
from pathlib import Path
from typing import Mapping

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

SEED = 1234
IMAGE_SEED = 7
TARGET_SEED = 11
FIXTURE_DIR = Path(__file__).parent / "fixtures"

# cddsv teacher set (reference configs/training/target_models/cddsv.yaml)
CDDSV_SIZES = {
    "google/vit-huge-patch14-224-in21k": (1280, 16, 16),
    "facebook/dinov2-large": (1024, 16, 16),
    "openai/clip-vit-large-patch14": (1024, 16, 16),
    "facebook/sam-vit-huge": (256, 64, 64),
    "LiheYoung/depth-anything-large-hf": (32, 64, 64),
}
# cdiv set (reference configs/training/target_models/cdiv.yaml) — the small
# 16x16-only set keeps per-config fixtures ~2 MB
CDIV_SIZES = {
    "google/vit-huge-patch14-224-in21k": (1280, 16, 16),
    "facebook/dinov2-large": (1024, 16, 16),
    "openai/clip-vit-large-patch14": (1024, 16, 16),
}
# distill_cls adds <teacher>_cls targets sized [C]
# (reference train_rvfm.py:238-246)
CDIV_CLS_SIZES = dict(CDIV_SIZES) | {f"{t}_cls": (s[0],) for t, s in CDIV_SIZES.items()}


@dataclasses.dataclass(frozen=True)
class GoldenConfig:
    backbone: str
    translator: str
    sizes: Mapping[str, tuple[int, ...]]
    num_reg_tokens: int = 7
    store_dtype: str = "float16"  # features/preds; losses always float32


CONFIGS: dict[str, GoldenConfig] = {
    # legacy round-2 fixture: full cddsv chain, float32 (kept bit-compatible)
    "tiny_cddsv_lconv": GoldenConfig(
        "facebook/deit-tiny-patch16-224", "lconv", CDDSV_SIZES, store_dtype="float32"
    ),
    # deit-base backbone (the perf-flagship geometry)
    "base_cdiv_lconv": GoldenConfig("facebook/deit-base-patch16-224", "lconv", CDIV_SIZES),
    # FULL flagship geometry: deit-base x the 5-teacher cddsv set — the exact
    # model bench.py measures and the published theia-base-cddsv ships
    # (VERDICT r4 #8: the offline stand-in for executed hub-weight parity)
    "base_cddsv_lconv": GoldenConfig("facebook/deit-base-patch16-224", "lconv", CDDSV_SIZES),
    # no-CLS backbone variant (reference backbones.py:344-421)
    "tiny_nocls_cdiv_lconv": GoldenConfig(
        "nocls-facebook/deit-tiny-patch16-224", "lconv", CDIV_SIZES
    ),
    # register-token backbone variant (reference backbones.py:424-503)
    "tiny_reg_cdiv_lconv": GoldenConfig(
        "reg-facebook/deit-tiny-patch16-224", "lconv", CDIV_SIZES
    ),
    # mlp + conv translator types (reference feature_translators.py:91-156)
    "tiny_cdiv_mlp": GoldenConfig("facebook/deit-tiny-patch16-224", "mlp", CDIV_SIZES),
    "tiny_cdiv_conv": GoldenConfig("facebook/deit-tiny-patch16-224", "conv", CDIV_SIZES),
    # distill_cls: LinearAdapterHead targets (reference train_rvfm.py:238-246)
    "tiny_cdiv_cls_lconv": GoldenConfig(
        "facebook/deit-tiny-patch16-224", "lconv", CDIV_CLS_SIZES
    ),
}

# legacy aliases (pre-matrix API)
BACKBONE = CONFIGS["tiny_cddsv_lconv"].backbone
FIXTURE = FIXTURE_DIR / "reference_theia_tiny_cddsv.npz"

_VIT_CFGS = {
    "facebook/deit-tiny-patch16-224": dict(hidden_size=192, num_attention_heads=3, intermediate_size=768),
    "facebook/deit-small-patch16-224": dict(hidden_size=384, num_attention_heads=6, intermediate_size=1536),
    "facebook/deit-base-patch16-224": dict(hidden_size=768, num_attention_heads=12, intermediate_size=3072),
}


def fixture_path(name: str) -> Path:
    if name == "tiny_cddsv_lconv":
        return FIXTURE  # keep the round-2 filename
    return FIXTURE_DIR / f"reference_theia_{name}.npz"


def backbone_variant(backbone: str) -> str:
    if backbone.startswith("nocls-"):
        return "nocls"
    if backbone.startswith("reg-"):
        return "reg"
    return "cls"


def _hub_name(name: str) -> str:
    return name.replace("nocls-", "").replace("reg-", "")


def _ensure_omegaconf_stub() -> None:
    """reference rvfm.py imports OmegaConf only for to_container on translator
    kwargs; a minimal stub suffices offline."""
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")

    class OmegaConf:  # noqa: D401 - stub
        @staticmethod
        def to_container(x):
            return dict(x)

    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


@contextmanager
def _offline_hub():
    """Patch AutoModel/AutoConfig/AutoProcessor.from_pretrained to local
    constructions (the nocls/reg paths use AutoConfig,
    reference backbones.py:353,437)."""
    import transformers
    from transformers import DeiTImageProcessor, ViTConfig, ViTModel

    orig_model = transformers.AutoModel.from_pretrained
    orig_cfg = transformers.AutoConfig.from_pretrained
    orig_proc = transformers.AutoProcessor.from_pretrained

    def fake_cfg(name, *a, **k):
        return ViTConfig(image_size=224, patch_size=16, **_VIT_CFGS[_hub_name(name)])

    def fake_model(name, *a, **k):
        return ViTModel(fake_cfg(name), add_pooling_layer=True)

    def fake_proc(name, *a, **k):
        return DeiTImageProcessor()

    transformers.AutoModel.from_pretrained = fake_model
    transformers.AutoConfig.from_pretrained = fake_cfg
    transformers.AutoProcessor.from_pretrained = fake_proc
    try:
        yield
    finally:
        transformers.AutoModel.from_pretrained = orig_model
        transformers.AutoConfig.from_pretrained = orig_cfg
        transformers.AutoProcessor.from_pretrained = orig_proc


def build_reference_rvfm(name: str = "tiny_cddsv_lconv"):
    """The reference RobotVisionFM for one matrix config, fixed seed."""
    import torch

    from reference_loader import load_reference

    cfg = CONFIGS[name]
    _ensure_omegaconf_stub()
    rvfm_mod = load_reference("models.rvfm")
    torch.manual_seed(SEED)
    kwargs = {}
    if backbone_variant(cfg.backbone) == "reg":
        kwargs["num_reg_tokens"] = cfg.num_reg_tokens
    with _offline_hub():
        model = rvfm_mod.RobotVisionFM(
            backbone=cfg.backbone,
            pretrained=False,
            translator=cfg.translator,
            target_feature_sizes={k: tuple(v) for k, v in cfg.sizes.items()},
            **kwargs,
        )
    model.eval()
    return model


def golden_inputs(name: str = "tiny_cddsv_lconv"):
    cfg = CONFIGS[name]
    images = np.random.RandomState(IMAGE_SEED).randint(
        0, 256, size=(1, 224, 224, 3), dtype=np.uint8
    )
    rng = np.random.RandomState(TARGET_SEED)
    targets = {}
    for k, s in cfg.sizes.items():
        shape = (1, s[0]) if len(s) == 1 else (1, s[1] * s[2], s[0])
        targets[k] = rng.randn(*shape).astype(np.float32)
    return images, targets


def run_reference(model=None, name: str = "tiny_cddsv_lconv") -> dict[str, np.ndarray]:
    """forward_feature + forward + get_loss chain on the reference model.
    Features/preds are cast to the config's store dtype so a regenerated run
    compares bitwise against the stored fixture."""
    import torch

    cfg = CONFIGS[name]
    dt = np.dtype(cfg.store_dtype)
    model = model if model is not None else build_reference_rvfm(name)
    images, targets = golden_inputs(name)
    x = torch.from_numpy(images)
    with torch.no_grad():
        feat = model.forward_feature(x)
        preds = model(x)
        losses = model.get_loss(preds, {k: torch.from_numpy(v) for k, v in targets.items()})
    out = {"forward_feature": feat.numpy().astype(dt)}
    for k, v in preds.items():
        out[f"pred::{k}"] = v.numpy().astype(dt)
    for term in ("mse_loss", "cos_loss", "l1_loss"):
        out[f"loss::{term}"] = np.asarray(float(losses[term]), np.float32)
    for term in ("mse_losses_per_model", "cos_losses_per_model", "l1_losses_per_model"):
        for k, v in losses[term].items():
            out[f"loss::{term}::{k}"] = np.asarray(float(v), np.float32)
    return out


def main() -> None:
    only = sys.argv[1:] or list(CONFIGS)
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    for name in only:
        path = fixture_path(name)
        out = run_reference(name=name)
        np.savez_compressed(path, **{k.replace("/", "|"): v for k, v in out.items()})
        print(f"wrote {path} ({path.stat().st_size/1e6:.1f} MB, {len(out)} tensors)")


if __name__ == "__main__":
    main()
