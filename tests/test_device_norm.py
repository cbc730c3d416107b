"""feature_norm="device" mode: raw bf16 targets, normalization in the step."""

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from theia_tpu.config import load_config
from theia_tpu.data.dataset import get_frame_dataloader, get_image_video_dataset
from theia_tpu.data.synthetic import generate_synthetic_dataset
from theia_tpu.models import vit as jvit
from theia_tpu.train.step import prepare_targets

MODELS = {"facebook/dinov2-large": (32, 16, 16)}


def test_device_mode_loader_ships_raw_chw(tmp_path):
    generate_synthetic_dataset(str(tmp_path), feature_models=MODELS, n_train=8, n_val=4,
                               samples_per_shard=8)
    ds, _ = get_image_video_dataset(
        dataset_root=str(tmp_path), feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", feature_norm="device", stats_root=str(tmp_path), seed=0,
    )
    batch = next(iter(get_frame_dataloader(ds, batch_size=4)))
    raw = batch["facebook/dinov2-large"]["embedding_chw"]
    assert raw.shape == (4, 32, 16, 16)
    assert str(raw.dtype) == "bfloat16"


def test_prepare_targets_matches_host_normalization(tmp_path):
    rng = np.random.RandomState(0)
    raw = rng.randn(4, 32, 16, 16).astype(np.float32)
    mean = rng.randn(32).astype(np.float32)
    std = (np.abs(rng.randn(32)) + 0.5).astype(np.float32)
    # host path (reference semantics): CHW -> (hw)c -> (x-mean)/std
    want = (raw.reshape(4, 32, -1).transpose(0, 2, 1) - mean) / std
    got = prepare_targets(
        {"t": jnp.asarray(raw)}, {"t": (mean, std)}
    )["t"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_smoke_train_device_norm(tmp_path):
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        generate_synthetic_dataset(
            str(tmp_path), feature_models={"facebook/dinov2-large": (1024, 16, 16)},
            n_train=16, n_val=8, samples_per_shard=8,
        )
        from theia_tpu.train.loop import train_from_config

        cfg = load_config(
            "train_rvfm_imagenet",
            overrides=[
                "model/backbone=deit_tiny",
                "training/target_models=dinov2",
                f"dataset.dataset_root={tmp_path}",
                "dataset.dataset_ratio=1.0",
                "dataset.shuffle_buffer_size=8",
                "dataset.feature_norm=device",
                "training.epochs=1",
                "training.batch_size=1",
                "training.compute_dtype=float32",
                f"logging.model_path={tmp_path}/ckpt",
                f"logging.log_path={tmp_path}/logs",
            ],
        )
        summary = train_from_config(cfg, resume=False, max_steps=2)
        assert summary["step"] == 2
        assert summary["eval"]["avg_eval_cos_loss"] > 0
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig
