"""Data-integrity check: re-extract random samples and compare with stored
features bit-exactly (reference:
src/theia/scripts/preprocessing/check_feature.py:88-205). Doubles as the
teacher-port numerics test when run against reference-produced shards.

Usage:
    python -m theia_tpu.scripts.check_feature --dataset-root /data/theia \
        --dataset imagenet --split val [--models facebook/dinov2-large ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from theia_tpu.data.webdataset import decode_image_npy, iter_samples, load_safetensors_np
from theia_tpu.utils.seed import seed_everything


def check_shard(
    dataset_dir: str,
    model_name: str,
    shard_idx: int,
    sample_indices: np.ndarray,
    split: str,
    module,
    params,
    feature_fn,
    check_feature_name: bool = True,
) -> bool:
    import jax.numpy as jnp

    from theia_tpu.foundation.extraction import get_feature_outputs

    legit = model_name.replace("/", "_")
    image_shards = sorted(glob.glob(os.path.join(dataset_dir, "images", f"*-{split}.tar")))
    feat_shards = sorted(glob.glob(os.path.join(dataset_dir, legit, f"*-{split}.tar")))
    images = list(iter_samples(image_shards[shard_idx]))
    feats = list(iter_samples(feat_shards[shard_idx]))

    sel_imgs = [(images[i][0], decode_image_npy(images[i][1]["image"])) for i in sample_indices]
    sel_feats = []
    for i in sample_indices:
        key, fields = feats[i]
        sel_feats.append((key, load_safetensors_np(next(iter(fields.values())))["embedding"]))

    batch = jnp.asarray(np.stack([img for _, img in sel_imgs]))
    regen = get_feature_outputs(model_name, module, params, batch, feature_fn)[legit]["embedding"]
    stored = np.stack([f.astype(np.float32) for _, f in sel_feats])
    diff = np.abs(np.asarray(regen, np.float32) - stored)
    bit_exact = bool(np.all(diff == 0))
    print(f"{model_name} shard {shard_idx}: sum|d|={diff.sum():.4g} max|d|={diff.max():.4g}")
    names_ok = all(ik == fk for (ik, _), (fk, _) in zip(sel_imgs, sel_feats))
    return bit_exact and (names_ok or not check_feature_name)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--samples-per-shard", type=int, default=1000)
    parser.add_argument("--models", nargs="*", default=None)
    parser.add_argument("--num-shards", type=int, default=5)
    parser.add_argument("--samples-per-check", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from theia_tpu.foundation.common import MODELS
    from theia_tpu.foundation.extraction import get_model

    seed_everything(args.seed)
    dataset_dir = os.path.join(args.dataset_root, args.dataset)
    with open(os.path.join(dataset_dir, "splits.json")) as f:
        dataset_len = json.load(f)[args.split]
    n_shards = max(dataset_len // args.samples_per_shard, 1)

    model_names = args.models or [m for m in MODELS if "llava" not in m]
    results: dict[str, list[bool]] = {m: [] for m in model_names}
    for model_name in model_names:
        module, params, feature_fn = get_model(model_name)
        if params is None:
            raise RuntimeError(f"no weights available for {model_name}")
        shard_indices = np.random.permutation(n_shards)[: args.num_shards]
        for shard_idx in shard_indices:
            sample_indices = np.random.permutation(args.samples_per_shard)[: args.samples_per_check]
            ok = check_shard(
                dataset_dir, model_name, int(shard_idx), sample_indices, args.split,
                module, params, feature_fn,
            )
            results[model_name].append(ok)
    failed = [m for m, oks in results.items() if not all(oks)]
    for m in failed:
        print(f"{args.dataset} {args.split} {m} check failed!!!")
    if not failed:
        print("all checks passed")


if __name__ == "__main__":
    main()
