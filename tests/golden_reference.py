"""Build the ACTUAL reference RobotVisionFM offline and produce golden
fixtures (stored reference-produced tensors) for parity tests.

The reference constructs its backbone with AutoModel.from_pretrained
(reference: src/theia/models/backbones.py:276) and its processor from the
hub — unavailable offline (zero egress, no HF cache) — so those two entry
points are patched to equivalent local constructions (the published
facebook/deit-* checkpoints are ViTModel + the stock DeiTImageProcessor
defaults). Everything else — RobotVisionFM, build_backbone wiring,
LightConv translator, handle_feature_output, get_loss — is the reference's
own code executed via tests/reference_loader.py.

Weights are NOT stored (60+ MB); they are reconstructed at test time from
the fixed torch seed, and the test asserts the regenerated reference outputs
are bitwise-close to the stored fixture first — any environment/RNG drift
fails loudly before any parity claim is made.
"""

from __future__ import annotations

import sys
import types
from contextlib import contextmanager
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

SEED = 1234
IMAGE_SEED = 7
TARGET_SEED = 11
BACKBONE = "facebook/deit-tiny-patch16-224"
# cddsv teacher set (reference configs/training/target_models/cddsv.yaml)
CDDSV_SIZES = {
    "google/vit-huge-patch14-224-in21k": (1280, 16, 16),
    "facebook/dinov2-large": (1024, 16, 16),
    "openai/clip-vit-large-patch14": (1024, 16, 16),
    "facebook/sam-vit-huge": (256, 64, 64),
    "LiheYoung/depth-anything-large-hf": (32, 64, 64),
}
FIXTURE = Path(__file__).parent / "fixtures" / "reference_theia_tiny_cddsv.npz"

_VIT_CFGS = {
    "facebook/deit-tiny-patch16-224": dict(hidden_size=192, num_attention_heads=3, intermediate_size=768),
    "facebook/deit-small-patch16-224": dict(hidden_size=384, num_attention_heads=6, intermediate_size=1536),
    "facebook/deit-base-patch16-224": dict(hidden_size=768, num_attention_heads=12, intermediate_size=3072),
}


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
    """Patch AutoModel/AutoProcessor.from_pretrained to local constructions."""
    import transformers
    from transformers import DeiTImageProcessor, ViTConfig, ViTModel

    orig_model = transformers.AutoModel.from_pretrained
    orig_proc = transformers.AutoProcessor.from_pretrained

    def fake_model(name, *a, **k):
        cfg = ViTConfig(image_size=224, patch_size=16, **_VIT_CFGS[name])
        return ViTModel(cfg, add_pooling_layer=True)

    def fake_proc(name, *a, **k):
        return DeiTImageProcessor()

    transformers.AutoModel.from_pretrained = fake_model
    transformers.AutoProcessor.from_pretrained = fake_proc
    try:
        yield
    finally:
        transformers.AutoModel.from_pretrained = orig_model
        transformers.AutoProcessor.from_pretrained = orig_proc


def build_reference_rvfm():
    """The reference RobotVisionFM (deit-tiny, lconv, cddsv), fixed seed."""
    import torch

    from reference_loader import load_reference

    _ensure_omegaconf_stub()
    rvfm_mod = load_reference("models.rvfm")
    torch.manual_seed(SEED)
    with _offline_hub():
        model = rvfm_mod.RobotVisionFM(
            backbone=BACKBONE,
            pretrained=False,
            translator="lconv",
            target_feature_sizes={k: tuple(v) for k, v in CDDSV_SIZES.items()},
        )
    model.eval()
    return model


def golden_inputs():
    images = np.random.RandomState(IMAGE_SEED).randint(
        0, 256, size=(1, 224, 224, 3), dtype=np.uint8
    )
    rng = np.random.RandomState(TARGET_SEED)
    targets = {
        k: rng.randn(1, s[1] * s[2], s[0]).astype(np.float32) for k, s in CDDSV_SIZES.items()
    }
    return images, targets


def run_reference(model=None) -> dict[str, np.ndarray]:
    """forward_feature + forward + get_loss chain on the reference model."""
    import torch

    model = model or build_reference_rvfm()
    images, targets = golden_inputs()
    x = torch.from_numpy(images)
    with torch.no_grad():
        feat = model.forward_feature(x)
        preds = model(x)
        losses = model.get_loss(preds, {k: torch.from_numpy(v) for k, v in targets.items()})
    out = {"forward_feature": feat.numpy()}
    for k, v in preds.items():
        out[f"pred::{k}"] = v.numpy()
    for term in ("mse_loss", "cos_loss", "l1_loss"):
        out[f"loss::{term}"] = np.asarray(float(losses[term]), np.float32)
    for term in ("mse_losses_per_model", "cos_losses_per_model", "l1_losses_per_model"):
        for k, v in losses[term].items():
            out[f"loss::{term}::{k}"] = np.asarray(float(v), np.float32)
    return out


def main() -> None:
    out = run_reference()
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(FIXTURE, **{k.replace("/", "|"): v for k, v in out.items()})
    print(f"wrote {FIXTURE} ({FIXTURE.stat().st_size/1e6:.1f} MB, {len(out)} tensors)")


if __name__ == "__main__":
    main()
