"""End-to-end Theia (RVFM) parity: HF ViT backbone + reference translator
composed exactly as reference RobotVisionFM.forward (rvfm.py:115-136), vs our
Theia module with converted weights."""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from reference_loader import load_reference
from theia_tpu.models.rvfm import Theia
from theia_tpu.models.hf_convert import convert_theia_checkpoint, state_dict_to_numpy

rft = load_reference("models.feature_translators")
rutils = load_reference("models.utils")

TARGETS = {
    "teacher/a": (24, 16, 16),
    "teacher/b": (12, 64, 64),
}


def _tiny_hf_vit():
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        hidden_size=192, num_hidden_layers=2, num_attention_heads=3,
        intermediate_size=768, image_size=224, patch_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    m = ViTModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


def test_theia_forward_parity_lconv():
    from transformers import DeiTImageProcessor

    hf_backbone = _tiny_hf_vit()
    torch.manual_seed(1)
    ref_translator = rft.LightConvFeatureTranslator(
        backbone_feature_size=torch.Size((192, 14, 14)), target_feature_sizes=TARGETS
    )
    ref_translator.eval()

    imgs = np.random.RandomState(0).randint(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    proc = DeiTImageProcessor()
    pix = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        tokens = hf_backbone(pixel_values=pix).last_hidden_state
        want = {k: v.numpy() for k, v in ref_translator(tokens, backbone_no_cls=False).items()}

    # assemble a reference-format RobotVisionFM state dict
    sd = {}
    for k, v in state_dict_to_numpy(hf_backbone.state_dict()).items():
        sd[f"backbone.model.{k}"] = v
    for k, v in state_dict_to_numpy(ref_translator.state_dict()).items():
        sd[f"translator.{k}"] = v

    # our model (deit-tiny geometry: hidden 192); override layer count via config
    import dataclasses
    from theia_tpu.models import vit as jvit

    theia = Theia(
        backbone="facebook/deit-tiny-patch16-224",
        translator="lconv",
        target_feature_sizes=TARGETS,
    )
    # patch the registry entry to 2 layers for this test
    orig = jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"]
    jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"] = dataclasses.replace(orig, num_layers=2)
    try:
        params = convert_theia_checkpoint(sd, num_layers=2, translator_type="lconv",
                                          target_feature_sizes=TARGETS)
        got = theia.apply({"params": params}, jnp.asarray(imgs))
    finally:
        jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"] = orig

    for k in want:
        g = np.asarray(got[k])
        assert g.shape == want[k].shape
        mse = float(np.mean((g - want[k]) ** 2))
        assert mse < 1e-3, (k, mse)  # BASELINE.md per-teacher feature MSE target


def test_forward_feature_reduce_methods_match_reference():
    x = np.random.RandomState(3).randn(2, 1 + 196 + 7, 32).astype(np.float32)
    for method in ["mean_pooling", "max_pooling", "cls", "identity", None]:
        want = rutils.handle_feature_output(
            torch.from_numpy(x), feature_reduce_method=method, num_discard_tokens=7
        ).numpy()
        from theia_tpu.models.utils import handle_feature_output

        got = np.asarray(handle_feature_output(jnp.asarray(x), method, num_discard_tokens=7))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(method))


def test_theia_forward_feature_and_reg_token_drop():
    theia = Theia(
        backbone="reg-facebook/deit-tiny-patch16-224",
        translator="lconv",
        target_feature_sizes=TARGETS,
        feature_reduce_method="mean_pooling",
        num_reg_tokens=7,
    )
    imgs = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    params = theia.init(jax.random.PRNGKey(0), imgs)
    # forward: reg tokens dropped before translator (rvfm.py:133-134)
    out = theia.apply(params, imgs)
    assert out["teacher/a"].shape == (1, 256, 24)
    assert out["teacher/b"].shape == (1, 4096, 12)
    # forward_feature: mean over spatial tokens, excluding CLS and reg tokens
    feat = theia.apply(params, imgs, method=Theia.forward_feature)
    assert feat.shape == (1, 192)
