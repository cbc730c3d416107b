"""TPU A/B: numerics-exact 32x32 padding of the 16->64 ladder's 31x31 zone.

VERDICT r4 lever (a): the base trace shows the [.,31,31,.] ladder fusions at
150-250 GB/s vs the ~819 GB/s roofline; hypothesis is the odd 31 spatial dim
tiles badly. adapter_heads.LADDER_PAD carries explicit zero pads through the
31-zone instead ("pre_convt2": only the second deconv runs at 32; "full":
relu+LN+deconv all run at 32). Equivalence proven in
tests/test_r5_levers.py; this measures speed only, same-process A/B/A with
the baseline re-measured last to bound drift.

Usage: python benchmarks/probe_ladder_pad.py [--sizes tiny,base]
       [--modes none,pre_convt2,full,none]
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
    ap.add_argument("--modes", default="none,pre_convt2,full,none")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models import adapter_heads as ah
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    def bench(size: str, batch_size: int, mode: str) -> float:
        ah.LADDER_PAD = mode
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
            "variant": f"{size} ladder_pad={mode}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        ah.LADDER_PAD = "none"
        return dt

    sizes = {"tiny": 256, "base": 64}
    for size in args.sizes.split(","):
        for mode in args.modes.split(","):
            bench(size, sizes[size], mode)


if __name__ == "__main__":
    main()
