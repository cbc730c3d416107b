"""AOT artifacts: export a Theia forward to StableHLO and run it back
without the model source (theia_tpu/export.py). The reference deploys by
importing the torch module (reference: README.md:23-38); here the artifact
is the compiled program itself."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theia_tpu import export as texport
from theia_tpu.models import vit as jvit
from theia_tpu.models.rvfm import Theia

TARGETS = {"facebook/dinov2-large": (1024, 16, 16)}


@pytest.fixture()
def model_and_params():
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)
        x = jnp.zeros((1, 224, 224, 3), jnp.uint8)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        yield model, params
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def _images(n, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (n, 224, 224, 3), np.uint8)


def test_artifact_round_trip(model_and_params, tmp_path):
    model, params = model_and_params
    path = str(tmp_path / "theia.stablehlo")
    texport.save_artifact(path, model, params, platforms=("cpu",))
    pred = texport.load_artifact(path)
    assert pred.meta["method"] == "forward_feature"
    direct = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=model.forward_feature)
    )
    for n in (1, 3):  # batch-polymorphic: distinct sizes, one artifact
        imgs = _images(n, seed=n)
        got = pred(imgs)
        want = np.asarray(direct(params, jnp.asarray(imgs)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_artifact_predict_dict_and_bf16(model_and_params, tmp_path):
    model, params = model_and_params
    path = str(tmp_path / "theia_predict.stablehlo")
    texport.save_artifact(
        path, model, params, method="predict",
        out_dtype=jnp.bfloat16, platforms=("cpu",),
    )
    pred = texport.load_artifact(path)
    out = pred(_images(2))
    assert set(out) == set(TARGETS)
    y = out["facebook/dinov2-large"]
    assert y.dtype == np.float32 and y.shape[0] == 2
    want = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.asarray(_images(2))
    )["facebook/dinov2-large"]
    np.testing.assert_allclose(y, np.asarray(want), rtol=2 ** -7, atol=2 ** -7)


def test_artifact_rejects_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="AOT artifact"):
        texport.load_artifact(str(p))


def test_hub_wrapper_accepted(model_and_params, tmp_path):
    """PretrainedTheia-style wrappers (model+params attrs) export directly."""
    model, params = model_and_params

    class W:
        pass

    w = W()
    w.model, w.params = model, params
    blob = texport.export_model(w, None, platforms=("cpu",))
    pred = texport.ExportedPredictor(blob)
    np.testing.assert_allclose(
        pred(_images(1)),
        Predictor_ref(model, params)(_images(1)),
        atol=1e-5,
    )


def Predictor_ref(model, params):
    from theia_tpu.serving import Predictor

    return Predictor(model, params, buckets=(1,))
