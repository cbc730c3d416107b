"""TPU A/B: LayerNormSpatial backward as optimization_barrier'd islands.

Round-3 base trace (benchmarks/analyze_trace.py): the LN-spatial backward
mega-fusions run at 133-150 GB/s moving ~3x the minimal bytes — XLA merges
the batch-dim affine-grad reduction, the per-sample H*W*C reductions and
the elementwise dx into ONE fusion with a thrashing loop order
(multiply_reduce_fusion.8/.10: 4.1 ms each on [64,31,31,768]).
LNS_VJP="islands" (ops/ln_spatial.py) splits the backward into two
barrier-separated islands, one per reduction direction.

A/B/A same-process: baseline (vpu autodiff) -> dots_vjp/islands ->
baseline re-measured.

Usage: python benchmarks/probe_ln_islands.py [--sizes base,tiny]
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
    ap.add_argument("--variants", default="vpu,islands,dots,vpu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    import theia_tpu.models.layers as L
    from theia_tpu.ops import ln_spatial as LS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)

    def bench(size: str, batch_size: int, variant: str) -> float:
        if variant == "vpu":
            L.LN_STATS_IMPL = "vpu"
        else:
            L.LN_STATS_IMPL = "dots_vjp"
            LS.LNS_VJP = variant
        images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8))
        targets = {
            k: jnp.asarray(
                rng.randn(batch_size, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16
            )
            for k, s in CDDSV_TARGETS.items()
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
        tx = make_optimizer(constant_with_warmup(1e-3, 100), weight_decay=0.01)
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
            "variant": f"{size} ln={variant}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        L.LN_STATS_IMPL = "vpu"
        LS.LNS_VJP = "dots"
        return dt

    sizes = {"tiny": 256, "base": 64}
    for size in args.sizes.split(","):
        for variant in args.variants.split(","):
            bench(size, sizes[size], variant)


if __name__ == "__main__":
    main()
