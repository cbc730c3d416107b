"""Tensor parallelism over the mesh "model" axis (parallel/tp.py).

DP(8,1), DP+TP(4,2) and DP+TP(2,4) must produce the same losses and the
same updated params for identical inputs — the sharding annotations change
only the partitioning, not the math. Runs on the 8-device virtual CPU mesh
(conftest.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec
from theia_tpu.models import vit as jvit
from theia_tpu.models.rvfm import Theia
from theia_tpu.parallel.mesh import make_mesh, shard_batch
from theia_tpu.parallel.tp import tp_specs, train_state_shardings, validate_tp
from theia_tpu.train.optim import constant_with_warmup, make_optimizer
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_train_step

# dinov2 spatial head (full col/row/LN-shard ladder) + a _cls Linear head;
# the SAM 64x64 ladder shards identically but would triple the CPU compile
# time of these tests without touching new TP surface
TARGETS = {
    "facebook/dinov2-large": (1024, 16, 16),
    "facebook/dinov2-large_cls": (1024,),
}


def _make_targets(rng, b):
    out = {}
    for k, s in TARGETS.items():
        shape = (b, s[0]) if len(s) == 1 else (b, s[1] * s[2], s[0])
        out[k] = jnp.asarray(rng.randn(*shape).astype(np.float32))
    return out


@pytest.fixture()
def small_backbone():
    # deit-base geometry (12 heads -> model axis 2 and 4 divide), 2 layers
    name = "facebook/deit-base-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    yield name
    jvit.BACKBONE_CONFIGS[name] = orig


def _run_two_steps(name, n_model):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (8, 224, 224, 3), np.uint8))
    targets = _make_targets(rng, 8)
    model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)
    params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
    tx = make_optimizer(constant_with_warmup(1e-3, 10), weight_decay=0.01)
    state = TrainState.create(params, tx)

    mesh = make_mesh(n_model=n_model)
    state_sh = None
    if n_model > 1:
        validate_tp(12, 3072, n_model)
        specs = tp_specs(params, n_model)
        state_sh = train_state_shardings(mesh, tx, params, specs)
    step = make_train_step(
        model, tx, main_loss="cos_l1", mesh=mesh, state_shardings=state_sh,
        donate=False,
    )
    images_s, targets_s = shard_batch(mesh, (images, targets))
    losses = []
    for _ in range(2):
        state, metrics = step(state, images_s, targets_s)
        losses.append(float(metrics["loss"]))
    final = jax.device_get(state.params)
    return losses, final


def test_tp_matches_dp(small_backbone):
    ref_losses, ref_params = _run_two_steps(small_backbone, 1)
    for n_model in (2, 4):
        losses, params = _run_two_steps(small_backbone, n_model)
        np.testing.assert_allclose(losses, ref_losses, rtol=2e-5)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_params)[0],
            jax.tree_util.tree_flatten_with_path(params)[0],
        ):
            assert pa == pb
            # f32 collective reduction order differs between partitionings;
            # two Adam steps amplify it to ~1e-4 on a handful of elements
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4,
                err_msg=f"model_axis={n_model} param {pa}",
            )


def test_tp_actually_shards(small_backbone):
    """Block matmul AND translator-head params must really live sharded on
    the model axis (the heads are the step's dominant FLOPs — VERDICT r2)."""
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (8, 224, 224, 3), np.uint8))
    targets = _make_targets(rng, 8)
    model = Theia(backbone=small_backbone, translator="lconv", target_feature_sizes=TARGETS)
    params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
    tx = make_optimizer(constant_with_warmup(1e-3, 10), weight_decay=0.01)
    state = TrainState.create(params, tx)
    mesh = make_mesh(n_model=2)
    specs = tp_specs(params, 2)
    state_sh = train_state_shardings(mesh, tx, params, specs)
    step = make_train_step(
        model, tx, main_loss="cos_l1", mesh=mesh, state_shardings=state_sh,
        donate=False,
    )
    state, _ = step(state, *shard_batch(mesh, (images, targets)))
    qk = state.params["backbone_module"]["block_0"]["query"]["kernel"]
    # sharded over the model axis on the output dim: each shard holds half
    spec = qk.sharding.spec
    assert "model" in tuple(spec), spec
    assert qk.addressable_shards[0].data.shape[1] == qk.shape[1] // 2

    head = state.params["translator_module"]["head_facebook_dinov2-large"]
    # column conv: out-channels halved per shard
    k1 = head["adapter_1"]["kernel"]
    assert k1.addressable_shards[0].data.shape[3] == k1.shape[3] // 2
    # row conv: in-channels halved per shard
    k4 = head["adapter_4"]["kernel"]
    assert k4.addressable_shards[0].data.shape[2] == k4.shape[2] // 2
    # intermediate LN affine sharded on C
    w3 = head["adapter_3"]["weight"]
    assert w3.addressable_shards[0].data.shape[0] == w3.shape[0] // 2
    # final column dense: out features halved
    k8 = head["adapter_8"]["kernel"]
    assert k8.addressable_shards[0].data.shape[1] == k8.shape[1] // 2
    # cls Linear head: column parallel
    kc = state.params["translator_module"]["head_facebook_dinov2-large_cls"]["adapter_0"]["kernel"]
    assert kc.addressable_shards[0].data.shape[1] == kc.shape[1] // 2


def test_head_tp_replicates_indivisible_with_warning(small_backbone):
    """A head whose dims don't divide the model axis must be REPLICATED
    with a warning — not fail a config that trained fine with backbone-only
    TP (round-3 review finding)."""
    model = Theia(
        backbone=small_backbone, translator="lconv",
        target_feature_sizes={"x/odd": (30, 16, 16)},  # 30 % 4 != 0
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.uint8))["params"]
    with pytest.warns(UserWarning, match="replicating this head"):
        specs = tp_specs(params, 4)
    # the odd head is fully replicated ...
    head = specs["translator_module"]["head_x_odd"]
    assert all(s == PartitionSpec() for s in jax.tree.leaves(head, is_leaf=lambda x: isinstance(x, PartitionSpec)))
    # ... while the backbone blocks still shard
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, PartitionSpec))
    assert any("model" in str(s) for s in flat)


def test_validate_tp_rejects_indivisible():
    with pytest.raises(ValueError, match="must divide"):
        validate_tp(3, 768, 2)


def test_state_shardings_plain_optax(small_backbone):
    """train_state_shardings must handle a PLAIN optax tx (chained plain
    tuples of NamedTuple states), not only the in-repo MaskedAdamW."""
    import optax

    model = Theia(backbone=small_backbone, translator="lconv", target_feature_sizes=TARGETS)
    x = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adamw(1e-3, weight_decay=0.01)
    mesh = make_mesh(n_model=2)
    specs = tp_specs(params, 2)
    sh = train_state_shardings(mesh, tx, params, specs)
    # structure must mirror tx.init(params): same treedef, shardings as leaves
    opt_shapes = jax.eval_shape(tx.init, params)
    a = jax.tree_util.tree_structure(sh.opt_state)
    b = jax.tree_util.tree_structure(opt_shapes)
    assert a == b
    mu_qk = sh.opt_state[0].mu["backbone_module"]["block_0"]["query"]["kernel"]
    assert "model" in tuple(mu_qk.spec)


def test_tp_train_from_config_and_resume(tmp_path):
    """model_axis=2 through the full config path: train, orbax-save the
    TP-sharded state, and resume into the sharded template."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from theia_tpu.config import load_config
    from theia_tpu.data.synthetic import generate_synthetic_dataset
    from theia_tpu.train.loop import train_from_config

    name = "facebook/deit-small-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        generate_synthetic_dataset(
            str(tmp_path),
            feature_models={"facebook/dinov2-large": (1024, 16, 16)},
            n_train=16, n_val=8, samples_per_shard=8,
        )

        def cfg(epochs):
            return load_config(
                "train_rvfm_imagenet",
                overrides=[
                    "model/backbone=deit", "training/target_models=dinov2",
                    f"dataset.dataset_root={tmp_path}", "dataset.dataset_ratio=1.0",
                    "dataset.shuffle_buffer_size=8", f"training.epochs={epochs}",
                    "training.batch_size=1", "training.compute_dtype=float32",
                    "training.model_axis=2",
                    f"logging.model_path={tmp_path}/ckpt",
                    f"logging.log_path={tmp_path}/logs",
                    "logging.save_ckpt_interval=0",
                ],
            )

        summary = train_from_config(cfg(1), max_steps=1)
        assert summary["step"] == 1
        # fast-forward resume: restored step 1 completes the 2-epoch
        # schedule (skips done epoch 0, trains epoch 1)
        summary2 = train_from_config(cfg(2), max_steps=1)
        assert summary2["step"] == 2
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig
