"""OXE frame-dataset builder over packed multi-feature shards."""

import json
import os

import numpy as np

from theia_tpu.data.dataset import get_frame_dataloader
from theia_tpu.data.oxe import get_oxe_frame_dataset
from theia_tpu.data.webdataset import ShardWriter, encode_image_npy, save_safetensors_np
from theia_tpu.data.stats import BFLOAT16


def _make_packed_oxe(root, dataset="berkeley_cable_routing", vo_key="image", n=8):
    """Packed layout: one shard per view dir holding image + all teacher
    safetensors per sample (reference data_utils.py:246-253)."""
    ddir = os.path.join(root, dataset)
    vdir = os.path.join(ddir, vo_key)
    os.makedirs(vdir, exist_ok=True)
    rng = np.random.RandomState(0)
    models = {"facebook/dinov2-large": (16, 4, 4), "openai/clip-vit-large-patch14": (8, 4, 4)}
    with ShardWriter(os.path.join(vdir, f"{dataset}-000000-train.tar")) as w:
        for i in range(n):
            key = f"{dataset}_seq{i:06d}_000000"
            img = rng.randint(0, 256, (224, 224, 3), np.uint8)
            w.write(f"{key}.image", encode_image_npy(img))
            for m, (c, h, wd) in models.items():
                feats = {"embedding": rng.randn(c, h, wd).astype(np.float32).astype(BFLOAT16)}
                w.write(f"{key}.{m.replace('/', '_')}.safetensors", save_safetensors_np(feats))
    with open(os.path.join(ddir, "splits.json"), "w") as f:
        json.dump({"train": n, "val": 0, "test": 0}, f)
    return list(models)


def test_oxe_packed_dataset(tmp_path):
    models = _make_packed_oxe(str(tmp_path))
    ds, expected = get_oxe_frame_dataset(
        dataset_root=str(tmp_path),
        dataset_mix=["berkeley_cable_routing"],
        feature_models=models,
        split="train",
        image_views={"berkeley_cable_routing": None},
    )
    assert expected == 8
    batch = next(iter(get_frame_dataloader(ds, batch_size=4)))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["facebook/dinov2-large"]["embedding"].shape == (4, 16, 16)
    assert batch["openai/clip-vit-large-patch14"]["embedding"].shape == (4, 16, 8)
