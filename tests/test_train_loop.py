"""Smoke train (sanity_check_train_rvfm.sh equivalent) + resume test:
full config -> synthetic shards -> jitted DP train -> orbax ckpt."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from theia_tpu.config import load_config
from theia_tpu.data.synthetic import generate_synthetic_dataset
from theia_tpu.models import vit as jvit


@pytest.fixture()
def tiny_backbone():
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    yield name
    jvit.BACKBONE_CONFIGS[name] = orig


def _cfg(tmp_path, epochs=1):
    return load_config(
        "train_rvfm_imagenet",
        overrides=[
            "model/backbone=deit_tiny",
            "training/target_models=dinov2",
            f"dataset.dataset_root={tmp_path}",
            "dataset.dataset_ratio=1.0",
            "dataset.shuffle_buffer_size=8",
            f"training.epochs={epochs}",
            "training.batch_size=1",  # per chip -> global 8 on the test mesh
            "training.grad_clip=true",
            "training.compute_dtype=float32",
            f"logging.model_path={tmp_path}/ckpt",
            f"logging.log_path={tmp_path}/logs",
            "logging.save_ckpt_interval=0",
        ],
    )


def test_smoke_train_and_resume(tmp_path, tiny_backbone):
    generate_synthetic_dataset(
        str(tmp_path),
        feature_models={"facebook/dinov2-large": (1024, 16, 16)},
        n_train=16,
        n_val=8,
        samples_per_shard=8,
    )
    from theia_tpu.train.loop import train_from_config

    cfg = _cfg(tmp_path)
    summary = train_from_config(cfg, max_steps=2)
    assert summary["step"] == 2
    assert "eval" in summary and summary["eval"]["avg_eval_cos_loss"] > 0

    # metrics jsonl written
    logs = list((tmp_path / "logs").glob("*.metrics.jsonl"))
    assert logs

    # resume: second run restores step 2, fast-forwards past the completed
    # epoch 0, and trains only epoch 1 — converging to the 2-epoch
    # schedule's total (preemption-safe resume semantics)
    cfg2 = _cfg(tmp_path, epochs=2)
    summary2 = train_from_config(cfg2, max_steps=2)
    assert summary2["step"] == 4


def test_smoke_train_distill_cls_and_random_targets(tmp_path, tiny_backbone):
    """distill_cls adds <teacher>_cls linear heads (train_rvfm.py:238-246);
    random_target_models masks teachers per step (:102-105)."""
    generate_synthetic_dataset(
        str(tmp_path),
        feature_models={"facebook/dinov2-large": (1024, 16, 16)},
        n_train=16, n_val=8, samples_per_shard=8, with_cls=True,
    )
    from theia_tpu.train.loop import train_from_config

    cfg = _cfg(tmp_path)
    cfg.training.distill_cls = True
    cfg.training.random_target_models = 2
    summary = train_from_config(cfg, resume=False, max_steps=2)
    assert summary["step"] == 2
    assert "avg_eval_facebook/dinov2-large_cls_cos_loss" in summary["eval"]


def _make_packed_oxe_with_val(root, dataset="berkeley_cable_routing", vo_key="image",
                              n_train=16, n_val=8):
    """Packed OXE layout with train AND val shards (reference
    data_utils.py:246-253 layout; decoded through the config system)."""
    import json
    import os

    from theia_tpu.data.stats import BFLOAT16
    from theia_tpu.data.webdataset import ShardWriter, encode_image_npy, save_safetensors_np

    ddir = os.path.join(root, dataset)
    vdir = os.path.join(ddir, vo_key)
    os.makedirs(vdir, exist_ok=True)
    rng = np.random.RandomState(0)
    model = "facebook/dinov2-large"
    c, h, w = 1024, 16, 16
    for split, n in (("train", n_train), ("val", n_val)):
        with ShardWriter(os.path.join(vdir, f"{dataset}-000000-{split}.tar")) as sw:
            for i in range(n):
                key = f"{dataset}_seq{i:06d}_000000"
                img = rng.randint(0, 256, (224, 224, 3), np.uint8)
                sw.write(f"{key}.image", encode_image_npy(img))
                feats = {"embedding": rng.randn(c, h, w).astype(np.float32).astype(BFLOAT16)}
                sw.write(f"{key}.{model.replace('/', '_')}.safetensors",
                         save_safetensors_np(feats))
    with open(os.path.join(ddir, "splits.json"), "w") as f:
        json.dump({"train": n_train, "val": n_val, "test": 0}, f)


def test_oxe_mix_config_trains_end_to_end(tmp_path, tiny_backbone):
    """configs/dataset/oxe_octo_mix.yaml reaches the OXE loader through
    train_from_config (reference configs/dataset/oxe_octo_mix.yaml +
    dataset/oxe/oxe_mixes.py)."""
    _make_packed_oxe_with_val(str(tmp_path))
    from theia_tpu.train.loop import train_from_config

    cfg = load_config(
        "train_rvfm_imagenet",
        overrides=[
            "dataset=oxe_octo_mix",
            "model/backbone=deit_tiny",
            "training/target_models=dinov2",
            f"dataset.dataset_root={tmp_path}",
            "dataset.dataset_mix=[berkeley_cable_routing]",
            "dataset.dataset_ratio=1.0",
            "dataset.shuffle_buffer_size=8",
            "training.epochs=1",
            "training.batch_size=1",
            "training.compute_dtype=float32",
            f"logging.model_path={tmp_path}/ckpt",
            f"logging.log_path={tmp_path}/logs",
            "logging.save_ckpt_interval=0",
        ],
    )
    assert cfg.dataset.type == "oxe"
    summary = train_from_config(cfg, resume=False, max_steps=2)
    assert summary["step"] == 2
    assert "eval" in summary and summary["eval"]["avg_eval_cos_loss"] > 0
