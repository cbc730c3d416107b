"""TPU A/B: spending the <1e-3 parity budget on train-step dtypes.

Levers (VERDICT r3 #1b): loss_dtype=bf16 (elementwise loss terms + the
dL/dpred cotangents over the [B,4096,C] SAM/depth maps in bf16, f32
accumulation) and moment_dtype=bf16 (Adam mu/nu stored bf16, update math
f32). Golden feature-parity tests are untouched (forward numerics
unchanged); loss-value deltas are bounded in tests/test_losses.py and
tests/test_train_step.py.

Same-process A/B/A at tiny (B=256) and base (B=64) cddsv fast_math steps;
inputs generated on-device (the relay is too slow for 1 GB of don't-care
bytes). Baseline bracketed first and last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (loss_dtype, moment_dtype, ln_stats_dtype); baseline bracketed first/last
VARIANTS = [
    ("f32", "f32", "f32"),
    ("bf16", "f32", "f32"),
    ("f32", "bf16", "f32"),
    ("bf16", "bf16", "f32"),
    ("f32", "f32", "f32"),
]

# LN-stats lever sweep, bracketed against the adopted moments=bf16 recipe
LN_VARIANTS = [
    ("f32", "bf16", "f32"),
    ("f32", "bf16", "bf16"),
    ("f32", "bf16", "f32"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="tiny,base")
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--ln", action="store_true",
                    help="sweep LN_STATS_DTYPE against the moments=bf16 recipe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models import layers
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    variants = LN_VARIANTS if args.ln else VARIANTS

    BATCH = {"tiny": 256, "base": 64}

    for size in args.sizes.split(","):
        batch_size = BATCH[size.strip()]
        key = jax.random.PRNGKey(0)
        kimg, *kt = jax.random.split(key, 1 + len(CDDSV_TARGETS))
        images = jax.random.randint(kimg, (batch_size, 224, 224, 3), 0, 256, jnp.uint8)
        targets = {
            k: jax.random.normal(kk, (batch_size, s[1] * s[2], s[0]), jnp.bfloat16)
            for kk, (k, s) in zip(kt, CDDSV_TARGETS.items())
        }
        model = Theia(
            backbone=f"facebook/deit-{size.strip()}-patch16-224",
            translator="lconv",
            target_feature_sizes=CDDSV_TARGETS,
            dtype=jnp.bfloat16,
            fuse_preprocessing=True,
            fast_math=True,
        )
        params = model.init(jax.random.PRNGKey(0), images[:2])["params"]

        for loss_dt, mom_dt, ln_dt in variants:
            layers.LN_STATS_DTYPE = "bf16" if ln_dt == "bf16" else "f32"
            tx = make_optimizer(
                constant_with_warmup(1e-3, 100),
                weight_decay=0.01,
                moment_dtype=jnp.bfloat16 if mom_dt == "bf16" else None,
            )
            step = make_train_step(
                model,
                tx,
                main_loss="cos_l1",
                loss_dtype=jnp.bfloat16 if loss_dt == "bf16" else jnp.float32,
            )
            # the step donates its input state; fresh param copies per
            # variant or the donated buffers would be deleted for the next
            box = {"state": TrainState.create(jax.tree.map(jnp.array, params), tx)}

            def run_n(n: int) -> float:
                t0 = time.perf_counter()
                for _ in range(n):
                    box["state"], metrics = step(box["state"], images, targets)
                float(metrics["loss"])
                return time.perf_counter() - t0

            run_n(2)
            t1 = run_n(1)
            tn = run_n(args.chain)
            dt = max((tn - t1) / (args.chain - 1), 1e-9)
            print(
                json.dumps(
                    {
                        "variant": f"{size} loss={loss_dt} moments={mom_dt} ln={ln_dt}",
                        "step_ms": round(dt * 1000, 2),
                        "img_per_s": round(batch_size / dt, 1),
                    }
                ),
                flush=True,
            )
            del box, step, tx


if __name__ == "__main__":
    main()
