"""TPU probe: 1x1-conv head Linear + batch-size sweep (tiny and base).

Round-2 baselines (before this probe): tiny cddsv B=256 96.4 ms
(2655 img/s), base cddsv B=64 150.5 ms (425 img/s).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(backbone: str, batch_size: int, n_long: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(batch_size, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16)
        for k, s in CDDSV_TARGETS.items()
    }
    model = Theia(
        backbone=backbone,
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
    tn = run_n(n_long)
    return max((tn - t1) / (n_long - 1), 1e-9)


DEFAULT_SWEEP = (
    ("facebook/deit-tiny-patch16-224", 256),
    ("facebook/deit-tiny-patch16-224", 512),
    ("facebook/deit-base-patch16-224", 64),
    ("facebook/deit-base-patch16-224", 128),
)

# round-5: pick the best batch for the deit-small bench row (the reference's
# default student backbone; B=128 was a guess in bench.py)
# measured 2026-08-20: small plateaus 1443-1451 img/s at B=32-64, drops to
# 1347-1367 at B=96-128 and ~1253 at B>=192 -> bench.py uses B=64
SMALL_SWEEP = (
    ("facebook/deit-small-patch16-224", 32),
    ("facebook/deit-small-patch16-224", 48),
    ("facebook/deit-small-patch16-224", 64),
    ("facebook/deit-small-patch16-224", 96),
)

BASE_SWEEP = (
    ("facebook/deit-base-patch16-224", 32),
    ("facebook/deit-base-patch16-224", 48),
    ("facebook/deit-base-patch16-224", 64),
)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="sweep deit-small batches")
    ap.add_argument("--base", action="store_true", help="sweep deit-base small batches")
    args = ap.parse_args()
    sweep = SMALL_SWEEP if args.small else (BASE_SWEEP if args.base else DEFAULT_SWEEP)
    for backbone, bs in sweep:
        try:
            dt = bench(backbone, bs)
            print(json.dumps({
                "model": backbone.split("/")[-1], "batch": bs,
                "step_ms": round(dt * 1000, 2), "img_per_s": round(bs / dt, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"model": backbone, "batch": bs, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
