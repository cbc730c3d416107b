"""Extraction subsystem end-to-end: image shards -> teacher features ->
stats -> integrity check -> training dataset."""

import glob
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from theia_tpu.data.synthetic import generate_synthetic_dataset
from theia_tpu.data.webdataset import check_existing_shard, iter_samples, load_safetensors_np
from theia_tpu.foundation.dinov2 import get_dinov2_feature
from theia_tpu.foundation.towers import Dinov2Tower, TowerConfig
from theia_tpu.scripts.feature_extraction import extract_shard, iter_image_shards


@pytest.fixture()
def tiny_dinov2():
    cfg = TowerConfig(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                      patch_size=16, image_size=224, layer_norm_eps=1e-6, resize_size=256)
    module = Dinov2Tower(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.uint8))["params"]
    return module, params


def _make_images_only(tmp_path):
    # synthetic dataset then delete the feature column: images only
    generate_synthetic_dataset(
        str(tmp_path), feature_models={"x/y": (4, 4, 4)}, n_train=12, n_val=6,
        samples_per_shard=6, write_stats=False,
    )
    import shutil

    shutil.rmtree(tmp_path / "imagenet" / "x_y")


def test_extraction_round_trip(tmp_path, tiny_dinov2):
    module, params = tiny_dinov2
    _make_images_only(tmp_path)
    ddir = str(tmp_path / "imagenet")
    model_name = "facebook/dinov2-large"  # stored under this registry name
    legit = model_name.replace("/", "_")
    os.makedirs(os.path.join(ddir, legit), exist_ok=True)

    for split in ("train", "val"):
        for shard in iter_image_shards(ddir, split):
            out = os.path.join(ddir, legit, os.path.basename(shard))
            n = extract_shard(shard, out, model_name, module, params, get_dinov2_feature, batch_size=4)
            assert n > 0
            ok, counts = check_existing_shard(out, [legit])
            assert ok == 1 and counts[legit] == n

    # stored layout: per-sample safetensors with embedding [C,H,W] bf16 + cls
    shard = sorted(glob.glob(os.path.join(ddir, legit, "*-train.tar")))[0]
    key, fields = next(iter_samples(shard))
    sft = load_safetensors_np(fields[f"{legit}.safetensors"])
    assert sft["embedding"].shape == (32, 14, 14)
    assert str(sft["embedding"].dtype) == "bfloat16"
    assert sft["cls_token"].shape == (1, 32)
    assert "pooled_cls_token" in sft

    # integrity check: re-extraction must be bit-exact
    from theia_tpu.scripts.check_feature import check_shard

    ok = check_shard(ddir, model_name, 0, np.array([0, 3, 5]), "train",
                     module, params, get_dinov2_feature)
    assert ok

    # stats computation over the extracted column
    from theia_tpu.scripts.calc_feature_mean import compute_feature_stats

    mean, std = compute_feature_stats(os.path.join(ddir, legit))
    assert mean.shape == (32,) and std.shape == (32,)
    assert np.all(std > 0)
    np.save(tmp_path / f"imagenet_mean_{legit}.npy", mean)
    np.save(tmp_path / f"imagenet_var_{legit}.npy", std)

    # the extracted dataset feeds the training pipeline
    from theia_tpu.data.dataset import get_frame_dataloader, get_image_video_dataset

    ds, expected = get_image_video_dataset(
        dataset_root=str(tmp_path), feature_models=[model_name], dataset_mix=["imagenet"],
        split="train", feature_norm=True, stats_root=str(tmp_path), seed=0,
    )
    batch = next(iter(get_frame_dataloader(ds, batch_size=4)))
    assert batch[model_name]["embedding"].shape == (4, 196, 32)
    # normalized features should be roughly standardized
    arr = np.asarray(batch[model_name]["embedding"], np.float32)
    assert abs(arr.mean()) < 1.0 and 0.2 < arr.std() < 5.0


def test_extraction_resume_skips_complete_shards(tmp_path, tiny_dinov2, capsys):
    module, params = tiny_dinov2
    _make_images_only(tmp_path)
    ddir = str(tmp_path / "imagenet")
    model_name = "facebook/dinov2-large"
    legit = model_name.replace("/", "_")
    os.makedirs(os.path.join(ddir, legit), exist_ok=True)
    shard = iter_image_shards(ddir, "train")[0]
    out = os.path.join(ddir, legit, os.path.basename(shard))
    extract_shard(shard, out, model_name, module, params, get_dinov2_feature, batch_size=4)
    mtime = os.path.getmtime(out)
    ok, _ = check_existing_shard(out, [legit])
    assert ok == 1  # driver would skip regeneration (resume semantics)


def test_llava_extraction_end_to_end(tmp_path, monkeypatch):
    """LLaVA teacher e2e: CLIP-L-336 tower (layer -2, CLS dropped) through
    the extraction driver -> [C,24,24] bf16 shard layout (reference
    vision_language_models/llava.py:24-120 + feature_extraction_core/
    models.py:55-97)."""
    import dataclasses

    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from theia_tpu.foundation import llava as jllava
    from theia_tpu.foundation.llava import get_llava_vision_model, get_llava_visual_feature

    tiny = dataclasses.replace(
        jllava.LLAVA_VISION, hidden_size=32, num_layers=3, num_heads=2, intermediate_size=64
    )
    monkeypatch.setattr(jllava, "LLAVA_VISION", tiny)

    cfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=336,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(cfg)
    hf.eval()

    module, params = get_llava_vision_model(hf_model=hf)

    # numerics: uint8 -> llava processor (336 shortest edge + crop, CLIP
    # normalization) -> hidden layer -2, CLS dropped, [B,C,24,24] layout
    from transformers import CLIPImageProcessor

    from theia_tpu.foundation.towers import CLIP_MEAN, CLIP_STD

    imgs = np.random.RandomState(0).randint(0, 256, (2, 360, 360, 3), np.uint8)
    proc = CLIPImageProcessor(
        size={"shortest_edge": 336}, crop_size={"height": 336, "width": 336},
        image_mean=list(CLIP_MEAN), image_std=list(CLIP_STD),
    )
    pv = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        want = hf(pixel_values=pv, output_hidden_states=True)
    want_feat = want.hidden_states[-2][:, 1:].numpy()  # [B, 576, C]
    got = get_llava_visual_feature(module, params, jnp.asarray(imgs))
    assert got.shape == (2, 32, 24, 24)
    got_tokens = np.asarray(got).reshape(2, 32, -1).transpose(0, 2, 1)
    mse = float(np.mean((got_tokens - want_feat) ** 2))
    assert mse < 1e-3, mse

    # through the extraction driver: image shards -> llava feature shards
    _make_images_only(tmp_path)
    ddir = str(tmp_path / "imagenet")
    model_name = "llava-hf/llava-1.5-7b-hf"
    legit = model_name.replace("/", "_")
    os.makedirs(os.path.join(ddir, legit), exist_ok=True)
    for shard in iter_image_shards(ddir, "train"):
        out = os.path.join(ddir, legit, os.path.basename(shard))
        n = extract_shard(
            shard, out, model_name, module, params, get_llava_visual_feature, batch_size=4
        )
        assert n > 0
        for key, fields in iter_samples(out):
            sft = load_safetensors_np(fields[f"{legit}.safetensors"])
            emb = sft["embedding"]
            assert emb.shape == (32, 24, 24)
            assert str(emb.dtype) == "bfloat16"
