"""TPU A/B: state-donation on/off at base (VERDICT r4 lever c, part 1).

The round-3 trace attributed ~6 ms/step to async copy-start/copy-done pairs.
One candidate source is buffer aliasing: donated TrainState buffers whose
input/output layouts differ force XLA to insert copies to satisfy the alias.
If that is the cause, donate=False should SHIFT or remove them (at the cost
of extra memory, not time, on this non-memory-bound geometry); if the copies
are scheduler prefetches, donation is time-neutral and the 6 ms is hidden
overlap (busy time, not critical path — the round-2 optimizer-fusion
lesson). Same-process A/B/A.

Usage: python benchmarks/probe_donation.py [--sizes base]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="base")
    ap.add_argument("--variants", default="donate,nodonate,donate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    def bench(size: str, batch_size: int, donate: bool) -> float:
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
        step = make_train_step(model, tx, main_loss="cos_l1", donate=donate)
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
            "variant": f"{size} donate={donate}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        return dt

    sizes = {"tiny": 256, "base": 64}
    for size in args.sizes.split(","):
        for v in args.variants.split(","):
            bench(size, sizes[size], v == "donate")


if __name__ == "__main__":
    main()
