"""Published-model API + checkpoint export round trip."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from theia_tpu.models import vit as jvit
from theia_tpu.models.hub import TEACHER_SETS, from_pretrained, parse_model_name


def test_parse_model_name():
    b, t = parse_model_name("theaiinstitute/theia-tiny-patch16-224-cdiv")
    assert b == "facebook/deit-tiny-patch16-224"
    assert t == TEACHER_SETS["cdiv"]
    b, t = parse_model_name("theia-base-patch16-224-cddsv")
    assert b == "facebook/deit-base-patch16-224"
    assert len(t) == 5
    # no suffix defaults to cdiv
    _, t = parse_model_name("theaiinstitute/theia-small-patch16-224")
    assert t == TEACHER_SETS["cdiv"]
    with pytest.raises(ValueError):
        parse_model_name("not-a-theia-model")


def test_from_pretrained_with_exported_checkpoint(tmp_path):
    """Export a random-init Theia to the reference state-dict layout, reload
    through the published API, and check bit-identical predictions."""
    from theia_tpu.data.webdataset import save_safetensors_np
    from theia_tpu.models.hf_convert import export_theia_checkpoint
    from theia_tpu.models.hub import from_pretrained
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.foundation.common import get_model_feature_size

    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        teachers = TEACHER_SETS["cdiv"]
        sizes = {t: get_model_feature_size(t, keep_spatial=True) for t in teachers}
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=sizes)
        imgs = (np.random.RandomState(0).rand(2, 224, 224, 3) * 255).astype(np.uint8)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
        want = {k: np.asarray(v) for k, v in model.apply({"params": params}, jnp.asarray(imgs)).items()}

        sd = export_theia_checkpoint(params, sizes)
        ckpt = tmp_path / "model.safetensors"
        ckpt.write_bytes(save_safetensors_np(sd))

        published = from_pretrained("theaiinstitute/theia-tiny-patch16-224-cdiv", str(ckpt))
        got = published(imgs)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=1e-5, err_msg=k)

        feat = published.forward_feature(imgs)
        assert feat.shape == (2, 196, 192)  # None -> spatial tokens (CLS stripped)
        published.feature_reduce_method = "mean_pooling"
        assert published.forward_feature(imgs).shape == (2, 192)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def test_export_loadable_by_reference_loader(tmp_path):
    """The exported state dict must load into the reference torch modules."""
    import torch
    from reference_loader import load_reference
    from transformers import ViTConfig, ViTModel

    from theia_tpu.models.hf_convert import export_theia_checkpoint
    from theia_tpu.models.rvfm import Theia

    rft = load_reference("models.feature_translators")
    targets = {"teacher/a": (24, 16, 16), "teacher/b": (12, 64, 64)}

    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=targets)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.uint8))["params"]
        sd = export_theia_checkpoint(params, targets)

        hf = ViTModel(
            ViTConfig(hidden_size=192, num_hidden_layers=2, num_attention_heads=3,
                      intermediate_size=768, image_size=224, patch_size=16),
            add_pooling_layer=False,
        )
        torch_backbone_sd = {
            k.removeprefix("backbone.model."): torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items() if k.startswith("backbone.model.")
        }
        missing, unexpected = hf.load_state_dict(torch_backbone_sd, strict=False)
        assert not unexpected
        assert all("pooler" in m for m in missing)

        tr = rft.LightConvFeatureTranslator(
            backbone_feature_size=torch.Size((192, 14, 14)), target_feature_sizes=targets
        )
        torch_tr_sd = {
            k.removeprefix("translator."): torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items() if k.startswith("translator.")
        }
        missing, unexpected = tr.load_state_dict(torch_tr_sd, strict=False)
        assert not unexpected, unexpected
        assert not missing, missing
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig
