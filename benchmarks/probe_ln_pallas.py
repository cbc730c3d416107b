"""TPU A/B: LayerNormSpatial backward — XLA autodiff vs chunked Pallas kernels.

A/B/A same-process pattern on the base (B=64) cddsv step. Tiny is excluded:
its C=192 maps fail the kernel's C % 128 gate and fall back to autodiff.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import theia_tpu.models.layers as L
    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)

    def bench(size: str, batch_size: int, impl: str) -> float:
        L.LN_STATS_IMPL = impl
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
            "variant": f"{size} ln={impl}",
            "step_ms": round(dt * 1000, 2),
            "img_per_s": round(batch_size / dt, 1),
        }), flush=True)
        return dt

    for impl in ("vpu", "pallas", "vpu"):
        bench("base", 64, impl)


if __name__ == "__main__":
    main()
