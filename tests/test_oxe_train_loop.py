"""End-to-end OXE training smoke: named-mix packed shards -> loader ->
jitted DP train step -> eval, through the real `train_from_config` entry
point (VERDICT r3 #5). The imagenet-format twin is tests/test_train_loop.py;
this covers the OXE branch of the dataset build (loop.py type=="oxe",
reference data_utils.py:175-339 + configs/dataset/oxe_octo_mix.yaml)."""

import dataclasses
import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from theia_tpu.config import load_config
from theia_tpu.data.webdataset import ShardWriter, encode_image_npy, save_safetensors_np
from theia_tpu.data.stats import BFLOAT16
from theia_tpu.models import vit as jvit

TEACHER = "facebook/dinov2-large"
SHAPE = (1024, 16, 16)  # the real dinov2-large feature geometry
DATASETS = ("berkeley_cable_routing", "nyu_door_opening_surprising_effectiveness")


@pytest.fixture()
def tiny_backbone():
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    yield name
    jvit.BACKBONE_CONFIGS[name] = orig


def _write_packed_oxe(root: str, dataset: str, n_train: int, n_val: int, seed: int):
    """Packed OXE layout: per view dir, one tar per split holding image +
    per-teacher safetensors per sample (reference data_utils.py:246-253)."""
    from theia_tpu.data.oxe import get_vo_keys

    vo_key = get_vo_keys(dataset)[0]
    vdir = os.path.join(root, dataset, vo_key)
    os.makedirs(vdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    c, h, w = SHAPE
    for split, n in (("train", n_train), ("val", n_val)):
        with ShardWriter(os.path.join(vdir, f"{dataset}-000000-{split}.tar")) as wtr:
            for i in range(n):
                key = f"{dataset}_{split}_seq{i:06d}_000000"
                img = rng.randint(0, 256, (224, 224, 3), np.uint8)
                wtr.write(f"{key}.image", encode_image_npy(img))
                feats = {
                    "embedding": rng.randn(c, h, w).astype(np.float32).astype(BFLOAT16)
                }
                wtr.write(
                    f"{key}.{TEACHER.replace('/', '_')}.safetensors",
                    save_safetensors_np(feats),
                )
    with open(os.path.join(root, dataset, "splits.json"), "w") as f:
        json.dump({"train": n_train, "val": n_val, "test": 0}, f)


def test_oxe_mix_train_from_config_e2e(tmp_path, tiny_backbone):
    for i, ds in enumerate(DATASETS):
        _write_packed_oxe(str(tmp_path), ds, n_train=8, n_val=4, seed=i)

    cfg = load_config(
        "train_rvfm_imagenet",
        overrides=[
            "model/backbone=deit_tiny",
            "training/target_models=dinov2",
            "dataset=oxe_octo_mix",
            f"dataset.dataset_root={tmp_path}",
            f"dataset.dataset_mix=[{','.join(DATASETS)}]",
            "dataset.dataset_ratio=1.0",
            "dataset.shuffle_buffer_size=8",
            "training.epochs=1",
            "training.batch_size=1",  # per chip -> global 8 on the test mesh
            "training.compute_dtype=float32",
            f"logging.model_path={tmp_path}/ckpt",
            f"logging.log_path={tmp_path}/logs",
            "logging.save_ckpt_interval=0",
        ],
    )
    assert cfg.dataset.type == "oxe"
    from theia_tpu.train.loop import train_from_config

    summary = train_from_config(cfg, resume=False, max_steps=2)
    assert summary["step"] == 2
    assert "eval" in summary and summary["eval"]["avg_eval_cos_loss"] > 0
    # the logged JSONL trail exists (same observability as the image path)
    logs = list((tmp_path / "logs").rglob("*.jsonl"))
    assert logs
