"""Every translator type and backbone variant must train end to end."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from theia_tpu.models import vit as jvit
from theia_tpu.models.rvfm import Theia
from theia_tpu.train.optim import make_optimizer
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_train_step

TARGETS = {"teacher/a": (24, 16, 16), "teacher/b": (12, 64, 64)}


def _one_step(model):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (2, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(2, s[1] * s[2], s[0]).astype(np.float32))
        for k, s in TARGETS.items()
    }
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    tx = make_optimizer(1e-3)
    step = make_train_step(model, tx, donate=False)
    state = TrainState.create(params, tx)
    new_state, metrics = step(state, imgs, targets)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_state.params)
    assert max(jax.tree.leaves(moved)) > 0.0
    return loss


@pytest.fixture(autouse=True)
def tiny_layers():
    patched = {}
    for name in list(jvit.BACKBONE_CONFIGS):
        patched[name] = jvit.BACKBONE_CONFIGS[name]
        jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(patched[name], num_layers=2)
    yield
    jvit.BACKBONE_CONFIGS.update(patched)


@pytest.mark.parametrize("translator,kwargs", [
    ("lconv", {"hidden_size_factor": 1.0}),
    ("mlp", {"translator_n_layer": 2, "translator_hidden_size": 64}),
    ("conv", {"translator_hidden_size": 64}),
    ("transformer", {"translator_n_layers": 1, "translator_n_heads": 4, "translator_hidden_size": 64}),
])
def test_all_translator_types_train(translator, kwargs):
    model = Theia(
        backbone="facebook/deit-tiny-patch16-224",
        translator=translator,
        translator_kwargs=kwargs,
        target_feature_sizes=TARGETS,
    )
    _one_step(model)


@pytest.mark.parametrize("backbone", [
    "nocls-facebook/deit-tiny-patch16-224",
    "reg-facebook/deit-tiny-patch16-224",
])
def test_backbone_variants_train(backbone):
    model = Theia(backbone=backbone, translator="lconv", target_feature_sizes=TARGETS)
    _one_step(model)
