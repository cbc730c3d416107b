"""Benchmark: distillation train-step throughput on the real TPU chip.

Headline metric (BASELINE.json): images/sec/chip at the Theia-Tiny distill
step (cddsv 5-teacher set, lconv translator, bf16 compute) with the 5k
img/s/chip target as baseline. Extra fields report Theia-Base distill
throughput and forward_feature p50 latency.

Timing method: the TPU here is attached over a network relay where
block_until_ready returns before execution completes; only data readback
truly synchronizes. Each measurement therefore chains N dependent steps,
forces one scalar readback at the end, and reports (t_N - t_1)/(N - 1) so
the relay round-trip cancels out.

Prints ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timed_chain(run_n, n_long: int = 30, repeats: int = 3) -> list[float]:
    """Per-step seconds via (t_long - t_short)/(n_long - 1); run_n(n) must
    execute n chained steps and end with a forced scalar readback.

    Returns ``repeats`` independent measurements: the relay-attached chip's
    absolute timings drift across sessions (PERFORMANCE.md measurement
    discipline), so BENCH json reports median + min + all repeats — a
    cross-round regression is then detectable against the spread, not a
    single-shot value."""
    run_n(2)  # warm
    vals = []
    for _ in range(repeats):
        t1 = run_n(1)
        tn = run_n(n_long)
        vals.append(max((tn - t1) / (n_long - 1), 1e-9))
    return vals


def _median(vals: list[float]) -> float:
    return float(np.median(vals))


def _bench_distill(backbone: str, batch_size: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    model = Theia(
        backbone=backbone,
        translator="lconv",
        target_feature_sizes=CDDSV_TARGETS,
        dtype=jnp.bfloat16,
        fuse_preprocessing=True,  # processor folded into the patch conv
        fast_math=True,           # training numerics mode (mse ~5e-9 vs exact)
    )
    # Generate inputs ON DEVICE: the cddsv target set is ~4 MB/image, so a
    # host-generated batch is >1 GB of H2D — minutes over a degraded relay
    # (measured 4-5 MB/s on 2026-08-18) for data whose values don't matter.
    # Step timing is data-independent; only shapes/dtypes must match.
    key = jax.random.PRNGKey(0)
    kimg, *kt = jax.random.split(key, 1 + len(CDDSV_TARGETS))
    images = jax.random.randint(kimg, (batch_size, 224, 224, 3), 0, 256, jnp.uint8)
    targets = {
        k: jax.random.normal(kk, (batch_size, s[1] * s[2], s[0]), jnp.bfloat16)
        for kk, (k, s) in zip(kt, CDDSV_TARGETS.items())
    }
    params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
    tx = make_optimizer(constant_with_warmup(1e-3, 100), weight_decay=0.01)
    step = make_train_step(model, tx, main_loss="cos_l1")
    state = TrainState.create(params, tx)

    box = {"state": state}

    def run_n(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            box["state"], metrics = step(box["state"], images, targets)
        float(metrics["loss"])  # forced readback syncs the chain
        return time.perf_counter() - t0

    dts = _timed_chain(run_n)
    return dts


def _bench_forward_feature(backbone: str, batch_size: int = 1):
    import jax
    import jax.numpy as jnp

    from theia_tpu.models.rvfm import Theia

    model = Theia(backbone=backbone, translator="lconv", dtype=jnp.bfloat16)
    images = jax.random.randint(
        jax.random.PRNGKey(0), (batch_size, 224, 224, 3), 0, 256, jnp.uint8
    )
    variables = model.init(jax.random.PRNGKey(0), images, method=model.forward_feature)
    # each call consumes a token derived from the previous output so calls
    # CHAIN on device — without the dependency successive calls pipeline and
    # the chain measures inverse throughput, not latency (the source of the
    # round-1 0.63 ms vs 2.36 ms discrepancy)
    fwd = jax.jit(
        lambda v, x, dep: model.apply(v, x + dep, method=model.forward_feature)
    )

    def run_n(n: int) -> float:
        dep = jnp.zeros((), jnp.uint8)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, images, dep)
            dep = (out.reshape(-1)[0] * 0).astype(jnp.uint8)
        float(out.sum())
        return time.perf_counter() - t0

    return [v * 1000 for v in _timed_chain(run_n, n_long=50)]  # ms


def main() -> None:
    tiny_dts = _bench_distill("facebook/deit-tiny-patch16-224", batch_size=256)
    base_dts = _bench_distill("facebook/deit-base-patch16-224", batch_size=64)
    ff_ms = _bench_forward_feature("facebook/deit-base-patch16-224")

    tiny_dt, base_dt = _median(tiny_dts), _median(base_dts)
    tiny_ips, base_ips = 256 / tiny_dt, 64 / base_dt
    result = {
        "metric": "images/sec/chip theia-tiny cddsv distill step (bf16)",
        "value": round(tiny_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tiny_ips / 5000.0, 3),
        "extra": {
            "repeats": len(tiny_dts),
            "theia_tiny_step_ms_b256": round(tiny_dt * 1000, 2),
            "theia_tiny_step_ms_min": round(min(tiny_dts) * 1000, 2),
            "theia_tiny_step_ms_all": [round(v * 1000, 2) for v in tiny_dts],
            "theia_base_images_per_sec": round(base_ips, 1),
            "theia_base_step_ms_b64": round(base_dt * 1000, 2),
            "theia_base_step_ms_min": round(min(base_dts) * 1000, 2),
            "theia_base_step_ms_all": [round(v * 1000, 2) for v in base_dts],
            "forward_feature_base_p50_ms": round(_median(ff_ms), 3),
            "forward_feature_base_ms_all": [round(v, 3) for v in ff_ms],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
