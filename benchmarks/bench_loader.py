"""Host input-pipeline throughput: images/s and MB/s of the cddsv loader.

Generates a synthetic 5-teacher dataset (~4.2 MB/sample like real cddsv
shards) and measures get_frame_dataloader at several worker counts.
Run: python benchmarks/bench_loader.py [n_samples]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from theia_tpu.data.dataset import get_frame_dataloader, get_image_video_dataset
from theia_tpu.data.parallel_loader import measure_loader_throughput
from theia_tpu.data.synthetic import generate_synthetic_dataset

MODELS = {
    "facebook/dinov2-large": (1024, 16, 16),
    "facebook/sam-vit-huge": (256, 64, 64),
    "google/vit-huge-patch14-224-in21k": (1280, 16, 16),
    "openai/clip-vit-large-patch14": (1024, 16, 16),
    "LiheYoung/depth-anything-large-hf": (32, 64, 64),
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    root = tempfile.mkdtemp()
    print(f"generating {n} samples under {root} ...", flush=True)
    generate_synthetic_dataset(root, feature_models=MODELS, n_train=n, n_val=2,
                               samples_per_shard=16)
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", feature_norm="device", stats_root=root, seed=0,
    )
    for nw, transport in ((0, "queue"), (2, "queue"), (2, "shm"), (4, "queue"), (4, "shm")):
        if nw == 0:
            loader = get_frame_dataloader(ds, batch_size=16, num_workers=0)
        else:
            loader = get_frame_dataloader(
                ds, batch_size=16, num_workers=nw, worker_transport=transport
            )
        r = measure_loader_throughput(loader, max_batches=max(n // 16 - 1, 1), warmup=1)
        print(json.dumps({"num_workers": nw, "transport": transport,
                          "host_cores": os.cpu_count(),
                          **{k: round(v, 1) for k, v in r.items()}}), flush=True)


if __name__ == "__main__":
    main()
