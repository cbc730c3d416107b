"""TPU A/B: masked token padding of the 197-token sequence to tile multiples.

Round-2 floor analysis: base attention runs ~17 ms against an 8-9 ms floor
because 197 tokens / 64 head-dim tile badly ([.,197]-minor dims pad to 256
lanes, [197,.] sublane dims leave partial tiles). vit.TOKEN_PAD_MULTIPLE
pads the sequence after the pos-embed add with -inf-masked keys —
numerics-identical for real tokens (tests/test_vit_parity.py) — so this is
a pure layout/tiling lever.

A/B/A same-process pattern (PERFORMANCE.md measurement discipline): each
variant is a fresh jit of the full cddsv train step; baseline re-measured
last to bound drift.

Usage: python benchmarks/probe_token_pad.py [--sizes base] [--mults 0,8,16,64]
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
    ap.add_argument("--sizes", default="tiny,base")
    ap.add_argument("--mults", default="0,8,16,64,0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)

    def bench(size: str, batch_size: int, mult: int) -> float:
        jvit.TOKEN_PAD_MULTIPLE = mult
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
            "variant": f"{size} pad_mult={mult}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        jvit.TOKEN_PAD_MULTIPLE = 0
        return dt

    sizes = {"tiny": 256, "base": 64}
    for size in args.sizes.split(","):
        for mult in (int(m) for m in args.mults.split(",")):
            bench(size, sizes[size], mult)


if __name__ == "__main__":
    main()
