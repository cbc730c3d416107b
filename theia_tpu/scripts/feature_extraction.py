"""Offline teacher feature extraction to webdataset shards.

TPU-accelerated equivalent of the reference driver (reference:
src/theia/scripts/preprocessing/feature_extraction.py): streams image shards,
runs the ported teacher on device in batches, and writes per-model
safetensors shards with resume checking (shard-integrity probe before
regeneration, :198-209).

Differences by design: the reference spawns one CUDA worker per GPU over a
shard-index queue (:381-401); on TPU one process per host drives its chip,
and multi-host runs partition shards by (process_index, process_count) —
launch one job per host (a "job array") instead of multiprocessing.

Usage:
    python -m theia_tpu.scripts.feature_extraction \
        --dataset imagenet --split train --model facebook/dinov2-large \
        --dataset-root /data/theia --output-path /data/theia \
        [--batch-size 32] [--dry-run] [--checkpoint /path/to/hf_or_converted]
"""

from __future__ import annotations

import argparse
import glob
import os
from os.path import join

import numpy as np


def iter_image_shards(dataset_dir: str, split: str) -> list[str]:
    return sorted(glob.glob(join(dataset_dir, "images", f"*-{split}.tar")))


def iter_oxe_episodes(dataset_name: str, split: str = "train"):
    """Stream OXE episodes from the public GCS tfds buckets (reference
    feature_extraction.py:51-56,73-97). Requires tensorflow_datasets
    (optional, like the reference's OXE path); yields
    (episode_index, vo_key, uint8 frames [T,H,W,3])."""
    try:
        import tensorflow_datasets as tfds
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "OXE extraction streams tfds episodes from GCS and needs "
            "tensorflow_datasets installed"
        ) from e

    from theia_tpu.data.oxe import get_vo_keys, oxe_dsname2path

    import numpy as np

    builder = tfds.builder_from_directory(builder_dir=oxe_dsname2path(dataset_name))
    ds = builder.as_dataset(split=split)
    vo_keys = get_vo_keys(dataset_name)
    for ep_idx, episode in enumerate(ds):
        for vo_key in vo_keys:
            frames = np.stack(
                [step["observation"][vo_key].numpy() for step in episode["steps"]]
            )
            yield ep_idx, vo_key, frames


def extract_shard(
    shard_path: str,
    out_path: str,
    model_name: str,
    module,
    params,
    feature_fn,
    batch_size: int,
    dry_run: bool = False,
) -> int:
    """Extract one image shard -> one feature shard. Returns sample count."""
    import jax.numpy as jnp

    from theia_tpu.data.webdataset import (
        ShardWriter,
        decode_image_npy,
        iter_samples,
        save_safetensors_np,
    )
    from theia_tpu.foundation.extraction import get_feature_outputs

    legit = model_name.replace("/", "_")
    samples = [(k, decode_image_npy(f["image"])) for k, f in iter_samples(shard_path)]
    if dry_run:
        return len(samples)
    writer = ShardWriter(out_path)
    count = 0
    for i in range(0, len(samples), batch_size):
        batch = samples[i : i + batch_size]
        images = jnp.asarray(np.stack([b[1] for b in batch]))
        feats = get_feature_outputs(model_name, module, params, images, feature_fn)
        for j, (key, _) in enumerate(batch):
            per_sample = {fk: np.asarray(fv[j]) for fk, fv in feats[legit].items()}
            writer.write(f"{key}.{legit}.safetensors", save_safetensors_np(per_sample))
            count += 1
    writer.close()
    return count


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--model", required=True)
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--output-path", default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--rank", type=int, default=None, help="process index override")
    parser.add_argument("--world-size", type=int, default=None)
    args = parser.parse_args(argv)

    import jax

    from theia_tpu.data.webdataset import check_existing_shard
    from theia_tpu.foundation.extraction import get_model

    rank = args.rank if args.rank is not None else jax.process_index()
    world = args.world_size if args.world_size is not None else jax.process_count()

    out_root = args.output_path or args.dataset_root
    dataset_dir = join(args.dataset_root, args.dataset)
    shards = iter_image_shards(dataset_dir, args.split)
    if not shards:
        raise FileNotFoundError(f"no image shards under {dataset_dir}/images for split {args.split}")
    my_shards = shards[rank::world]

    module = params = feature_fn = None
    if not args.dry_run:
        module, params, feature_fn = get_model(args.model)
        if params is None:
            # no weights supplied: try HF (offline cache) else random init for pipeline tests
            try:
                from transformers import AutoModel

                hf = AutoModel.from_pretrained(args.model)
                module, params, feature_fn = get_model(args.model, hf_model=hf)
            except Exception:
                import jax.numpy as jnp

                print(f"WARNING: no pretrained weights for {args.model}; using random init")
                dummy = jnp.zeros((1, 224, 224, 3), jnp.uint8)
                params = module.init(jax.random.PRNGKey(0), dummy)["params"]

    legit = args.model.replace("/", "_")
    out_dir = join(out_root, args.dataset, legit)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for shard_path in my_shards:
        out_name = os.path.basename(shard_path)
        out_path = join(out_dir, out_name)
        ok, _ = check_existing_shard(out_path, [legit])
        if ok:
            print(f"{args.dataset} {legit} {out_name} check pass, skipping")
            continue
        n = extract_shard(
            shard_path, out_path, args.model, module, params, feature_fn,
            args.batch_size, dry_run=args.dry_run,
        )
        total += n
        print(f"{args.dataset} {legit} {out_name} done ({n} samples)")
    print(f"extracted {total} samples across {len(my_shards)} shards")


if __name__ == "__main__":
    main()
