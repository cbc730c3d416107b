"""CortexBench adapters, VFM wrappers, OXE registry, preprocessing scripts."""

import dataclasses
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def test_oxe_registry_loaded():
    from theia_tpu.data.oxe import ALL_OXE_DATASETS, OXE_NAMED_MIXES, get_vo_keys, oxe_dsname2path

    assert len(ALL_OXE_DATASETS) == 69
    assert "fractal20220817_data" in ALL_OXE_DATASETS
    assert "oxe_magic_soup" in OXE_NAMED_MIXES
    keys = get_vo_keys("fractal20220817_data")
    assert isinstance(keys, list) and keys
    assert oxe_dsname2path("fractal20220817_data").startswith("gs://gresearch/robotics/")
    # wrist/static filters fall back to defaults when empty
    assert get_vo_keys("fractal20220817_data", "static")


def test_cortexbench_policy_heads():
    from theia_tpu.utils.cortexbench.policy_heads import (
        ConvBatchNormMLP,
        ConvPolicyHead,
        get_action,
        get_action_deterministic,
    )

    c, h, w, t, proprio, a = 8, 14, 14, 2, 5, 4
    policy = ConvBatchNormMLP(
        embedding_dim=(c, h, w), proprio_dim=proprio, history_window=t, action_dim=a
    )
    obs = np.random.RandomState(0).randn(2, t * h * w * c + proprio).astype(np.float32)
    params = policy.init(jax.random.PRNGKey(0), jnp.asarray(obs))
    mean = policy.apply(params, jnp.asarray(obs))
    assert mean.shape == (2, a)

    apply_fn = lambda p, o: policy.apply(p, o)
    act, info = get_action(apply_fn, params, obs[0], np.random.RandomState(1))
    assert act.shape == (a,) and "mean" in info
    act, _ = get_action_deterministic(apply_fn, params, obs[0])
    assert act.shape == (a,)

    small = ConvPolicyHead(embedding_dim=(c, h, w), proprio_dim=0, history_window=1, action_dim=a)
    obs = np.random.RandomState(2).randn(2, h * w * c).astype(np.float32)
    params = small.init(jax.random.PRNGKey(0), jnp.asarray(obs))
    assert small.apply(params, jnp.asarray(obs)).shape == (2, a)


def test_trifinger_policy_and_factory():
    from theia_tpu.utils.cortexbench.trifinger.policy import construct_policy

    policy = construct_policy(
        type="ConvBatchNormMLP", task_state_type="ftpos", train_ft_state_shape=9,
        pretrained_dim=(16, 14, 14), task_goal_type="goal_cond", out_dim=9, max_a=0.1,
    )
    assert policy.in_dim == (32, 14, 14)  # goal_cond doubles channels
    assert policy.extra_dim == 9
    state = np.random.RandomState(0).randn(2, 14 * 14 * 32 + 9).astype(np.float32)
    params = policy.init(jax.random.PRNGKey(0), jnp.asarray(state))
    out = policy.apply(params, jnp.asarray(state))
    assert out.shape == (2, 9)
    clipped = policy.clip_action(out)
    assert float(jnp.max(jnp.abs(clipped))) <= 0.1 + 1e-6

    with pytest.raises(NameError):
        construct_policy(type="ConvBatchNormMLP", task_state_type="bogus",
                         train_ft_state_shape=0, pretrained_dim=(4, 14, 14),
                         task_goal_type="goal_none", out_dim=2, max_a=None)


def test_cortexbench_load_model(tmp_path):
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.utils.cortexbench.load_model import load_model
    from theia_tpu.utils.cortexbench.transforms import rvfm_image_transforms

    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv")
        dummy = jnp.zeros((1, 224, 224, 3), jnp.uint8)
        # no translator heads without target sizes: init via forward_feature
        # (the reference model similarly has no translator then; rvfm.py:64-68)
        params = model.init(jax.random.PRNGKey(0), dummy, method=model.forward_feature)["params"]
        fwd, dim, transform, meta = load_model(model, params, rvfm_image_transforms())
        assert dim == (192, 14, 14)
        out = fwd(jnp.asarray(transform(np.zeros((100, 100, 3), np.uint8))[None]))
        assert out.shape == (1, 196, 192)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def test_transforms_match_reference_semantics():
    from theia_tpu.utils.cortexbench.transforms import r3m_transforms, rvfm_image_transforms, vit_transforms

    img = np.random.RandomState(0).randint(0, 256, (100, 120, 3), np.uint8)
    out = rvfm_image_transforms()(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    out = vit_transforms()(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    assert -3.0 < out.mean() < 3.0  # normalized
    out = r3m_transforms()(img)
    assert out.dtype == np.float32 and out.max() > 2.0  # stays in [0,255]


def test_vfm_encoder_wrapper():
    from theia_tpu.foundation.towers import CLIP_VIT_LARGE, TowerConfig
    from theia_tpu.models import vfm

    # tiny CLIP geometry to keep the test light
    import theia_tpu.foundation.clip as fclip
    import theia_tpu.foundation.towers as towers

    small = TowerConfig(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                        patch_size=16, image_size=224)
    enc = vfm.VFMEncoder.__new__(vfm.VFMEncoder)
    enc.model_name = "openai/clip-vit-large-patch14"
    enc.feature_reduce_method = None
    enc.module = towers.CLIPVisionTower(small)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    enc.params = enc.module.init(jax.random.PRNGKey(0), imgs)["params"]
    out = enc.forward(imgs)
    assert out.shape == (1, 196, 32)  # CLS stripped by handle_feature_output


def test_split_dataset_script(tmp_path):
    from theia_tpu.data.webdataset import ShardWriter, encode_image_npy
    from theia_tpu.scripts.split_dataset import do_dataset_split

    ddir = tmp_path / "vid" / "images"
    os.makedirs(ddir)
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(10):
        with ShardWriter(str(ddir / f"vid-{i:06d}.tar")) as w:
            for j in range(4):
                w.write(f"s{i}_{j}.image", encode_image_npy(img))
    do_dataset_split(str(tmp_path), "vid", samples_per_shard=4)
    import json

    splits = json.load(open(tmp_path / "vid" / "splits.json"))
    assert splits["train"] == 32  # 8 shards x 4
    assert splits["val"] == 4 and splits["test"] == 4
    names = sorted(os.listdir(ddir))
    assert sum("-train.tar" in n for n in names) == 8
    assert sum("-val.tar" in n for n in names) == 1
    assert sum("-test.tar" in n for n in names) == 1


def test_policy_head_bc_fit():
    """Behavior-cloning smoke (VERDICT r3 #8): the cortexbench heads are
    TRAINABLE, not just constructable — a jitted Adam BC loop on a synthetic
    observation->action mapping must cut the MSE loss by >4x. Mirrors the
    reference's mjrl BC usage of these heads (reference
    src/theia/utils/cortexbench/policy_heads.py:16-176)."""
    import optax

    from theia_tpu.utils.cortexbench.policy_heads import ConvBatchNormMLP, ConvPolicyHead

    rng = np.random.RandomState(0)
    c, h, w, t, proprio, a = 4, 14, 14, 1, 3, 4
    n, d = 64, t * h * w * c + proprio
    obs = rng.randn(n, d).astype(np.float32)
    w_true = rng.randn(d, a).astype(np.float32) / np.sqrt(d)
    actions = obs @ w_true + 0.01 * rng.randn(n, a).astype(np.float32)

    for policy in (
        ConvBatchNormMLP(embedding_dim=(c, h, w), proprio_dim=proprio,
                         history_window=t, action_dim=a),
        ConvPolicyHead(embedding_dim=(c, h, w), proprio_dim=proprio,
                       history_window=t, action_dim=a),
    ):
        params = policy.init(jax.random.PRNGKey(0), jnp.asarray(obs[:2]))
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, o, y):
            def loss_fn(p):
                return jnp.mean((policy.apply(p, o) - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        o, y = jnp.asarray(obs), jnp.asarray(actions)
        first = None
        for i in range(120):
            params, opt_state, loss = step(params, opt_state, o, y)
            if first is None:
                first = float(loss)
        last = float(loss)
        assert np.isfinite(last)
        assert last < first / 4, (type(policy).__name__, first, last)
