"""TPU A/B: attention matmul repacks at base widths (VERDICT r4 lever b).

The round-3 base trace puts attention at ~26 ms spread over ~12 sub-ms
ops/layer (vs an 8-9 ms byte/FLOP floor). Two numerics-identical repacks
(tests/test_r5_levers.py):
  merged_batch — (b, h) merged into one batch dim so XLA tiles one 768-deep
    batched gemm instead of nested (b, h) batch dims.
  dpad128 — q/k/v zero-padded from head_dim 64 to the MXU's 128-lane depth
    (zero products; 2x score FLOPs but full-depth tiles).

Speed-only, same-process A/B/A, baseline re-measured last.

Usage: python benchmarks/probe_attn_repack.py [--sizes base]
       [--layouts bhqd_fused,merged_batch,dpad128,bhqd_fused]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="base,tiny")
    ap.add_argument("--layouts", default="bhqd_fused,merged_batch,dpad128,bhqd_fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    def bench(size: str, batch_size: int, layout: str) -> float:
        jvit.ATTN_LAYOUT = layout
        key = jax.random.PRNGKey(0)
        kimg, *kt = jax.random.split(key, 1 + len(CDDSV_TARGETS))
        images = jax.random.randint(kimg, (batch_size, 224, 224, 3), 0, 256, jnp.uint8)
        targets = {
            k: jax.random.normal(kk, (batch_size, s[1] * s[2], s[0]), jnp.bfloat16)
            for kk, (k, s) in zip(kt, CDDSV_TARGETS.items())
        }
        model = Theia(
            backbone=f"facebook/deit-{size}-patch16-224",
            translator="lconv",
            target_feature_sizes=CDDSV_TARGETS,
            dtype=jnp.bfloat16,
            fuse_preprocessing=True,
            fast_math=True,
        )
        params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
        tx = make_optimizer(
            constant_with_warmup(1e-3, 100), weight_decay=0.01, moment_dtype=jnp.bfloat16
        )
        step = make_train_step(model, tx, main_loss="cos_l1")
        state = TrainState.create(params, tx)
        box = {"state": state}

        def run_n(n: int) -> float:
            t0 = time.perf_counter()
            for _ in range(n):
                box["state"], metrics = step(box["state"], images, targets)
            float(metrics["loss"])
            return time.perf_counter() - t0

        run_n(2)
        t1 = run_n(1)
        tn = run_n(30)
        dt = max((tn - t1) / 29, 1e-9)
        print(json.dumps({
            "variant": f"{size} attn={layout}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        jvit.ATTN_LAYOUT = "bhqd_fused"
        return dt

    sizes = {"tiny": 256, "base": 64}
    for size in args.sizes.split(","):
        for layout in args.layouts.split(","):
            bench(size, sizes[size], layout)


if __name__ == "__main__":
    main()
