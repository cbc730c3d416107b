"""Benchmark: distillation train-step throughput on the real TPU chip.

Headline metric (BASELINE.json north star): images/sec/chip at the
Theia-BASE distill step (cddsv 5-teacher set, lconv translator, bf16
compute) against the 5k img/s/chip target. Extra fields report Theia-Tiny
throughput, forward_feature latency (device-time AND wire), computed MFU,
and a peak-bf16-FLOPs feasibility line for the 5k target.

Timing method: the TPU here is attached over a network relay where
block_until_ready returns before execution completes; only data readback
truly synchronizes. Each measurement therefore chains N dependent steps,
forces one scalar readback at the end, and reports (t_N - t_1)/(N - 1) so
the relay round-trip cancels out. forward_feature device-time latency runs
the chain INSIDE one XLA program (lax.fori_loop) so per-call dispatch never
touches the relay; the separate wire p50 keeps the old per-dispatch chain
and measures the attachment (drifts with relay health — see PERFORMANCE.md).

Prints ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Peak dense bf16 FLOP/s per chip by device kind (public spec sheets).
PEAK_BF16_FLOPS = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,  # trillium
}


def _peak_flops() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_BF16_FLOPS.items():
        if k in kind:
            return v
    return None


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
    """Returns (per-step seconds list, train-step FLOPs from XLA cost analysis)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import (
        DEFAULT_COMPILER_OPTIONS,
        compiler_options_supported,
        make_train_step,
    )

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
    # moment_dtype=bf16 is the production recipe default (frame_level.yaml):
    # Adam moments stored bf16, update math f32 — measured +1.4% at base
    # (round-4 probe_numerics_budget.py), param deltas track f32 to ~1%
    tx = make_optimizer(
        constant_with_warmup(1e-3, 100), weight_decay=0.01,
        moment_dtype=jnp.bfloat16,
    )
    # donate=False is the production recipe (frame_level.yaml donate_state):
    # skips donation's aliasing copies, measured +0.7% at base
    # (PERFORMANCE.md round 5); state double-buffering fits both geometries
    step = make_train_step(model, tx, main_loss="cos_l1", donate=False)
    state = TrainState.create(params, tx)

    # AOT-compile once (the same executable the wrapper would build) so the
    # compiled handle also yields cost_analysis FLOPs for the MFU line.
    lowered = step._jitted.lower(state, images, targets, None)
    opts_applied = compiler_options_supported(DEFAULT_COMPILER_OPTIONS)
    if opts_applied:
        compiled = lowered.compile(compiler_options=dict(DEFAULT_COMPILER_OPTIONS))
    else:
        compiled = lowered.compile()
    try:
        flops = float(compiled.cost_analysis().get("flops", 0.0)) or None
    except Exception:
        flops = None

    box = {"state": state}

    def run_n(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            box["state"], metrics = compiled(box["state"], images, targets, None)
        float(metrics["loss"])  # forced readback syncs the chain
        return time.perf_counter() - t0

    dts = _timed_chain(run_n)
    return dts, flops, opts_applied


def _bench_forward_feature(backbone: str, batch_size: int = 1):
    """Returns (wire-chain ms list, device-time ms list).

    Wire chain: N host-dispatched calls, each data-dependent on the last —
    on a relay-attached chip this rides the per-dispatch round-trip and so
    tracks relay health (upper bound on latency; PERFORMANCE.md).
    Device time: the same dependent chain run INSIDE one compiled program
    via lax.fori_loop with a runtime trip count — one dispatch total, so
    (t_K - t_1)/(K - 1) is pure device execution time per forward."""
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

    wire_ms = [v * 1000 for v in _timed_chain(run_n, n_long=50)]

    @jax.jit
    def chain(v, x, k):
        def body(_, dep):
            out = model.apply(v, x + dep, method=model.forward_feature)
            return (out.reshape(-1)[0] * 0).astype(jnp.uint8)

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.uint8))

    def run_k(k: int) -> float:
        t0 = time.perf_counter()
        float(chain(variables, images, k))
        return time.perf_counter() - t0

    run_k(2)  # warm/compile
    dev_ms = []
    for _ in range(3):
        t1 = run_k(1)
        tk = run_k(65)
        dev_ms.append(max((tk - t1) / 64, 1e-9) * 1000)
    return wire_ms, dev_ms


def main() -> None:
    base_dts, base_flops, opts_applied = _bench_distill(
        "facebook/deit-base-patch16-224", batch_size=64
    )
    # deit-small is the reference's DEFAULT student backbone
    # (/root/reference/src/theia/configs/model/backbone/deit.yaml).
    # B=64: the batch sweep (probe_batch_sweep.py --small, 2026-08-20)
    # plateaus at 1443-1451 img/s for B=32-64 and drops ~6% at B>=96
    small_dts, small_flops, _ = _bench_distill(
        "facebook/deit-small-patch16-224", batch_size=64
    )
    tiny_dts, tiny_flops, _ = _bench_distill(
        "facebook/deit-tiny-patch16-224", batch_size=256
    )
    ff_wire_ms, ff_dev_ms = _bench_forward_feature("facebook/deit-base-patch16-224")

    tiny_dt, small_dt, base_dt = _median(tiny_dts), _median(small_dts), _median(base_dts)
    tiny_ips, small_ips, base_ips = 256 / tiny_dt, 64 / small_dt, 64 / base_dt
    peak = _peak_flops()

    extra = {
        "repeats": len(base_dts),
        # stable machine-comparable per-model keys (BENCH semantics fixed as
        # of r05: value/base_images_per_sec = flagship base geometry; r01-r03
        # "value" was tiny — use these keys, not value, for trend tooling)
        "base_images_per_sec": round(base_ips, 1),
        "small_images_per_sec": round(small_ips, 1),
        "tiny_images_per_sec": round(tiny_ips, 1),
        "theia_base_step_ms_b64": round(base_dt * 1000, 2),
        "theia_base_step_ms_min": round(min(base_dts) * 1000, 2),
        "theia_base_step_ms_all": [round(v * 1000, 2) for v in base_dts],
        "theia_small_step_ms_b64": round(small_dt * 1000, 2),
        "theia_small_step_ms_min": round(min(small_dts) * 1000, 2),
        "theia_small_step_ms_all": [round(v * 1000, 2) for v in small_dts],
        "theia_tiny_images_per_sec": round(tiny_ips, 1),
        "theia_tiny_step_ms_b256": round(tiny_dt * 1000, 2),
        "theia_tiny_step_ms_min": round(min(tiny_dts) * 1000, 2),
        "theia_tiny_step_ms_all": [round(v * 1000, 2) for v in tiny_dts],
        "forward_feature_base_device_p50_ms": round(_median(ff_dev_ms), 3),
        "forward_feature_base_device_ms_all": [round(v, 3) for v in ff_dev_ms],
        "forward_feature_base_wire_p50_ms": round(_median(ff_wire_ms), 3),
        "forward_feature_base_wire_ms_all": [round(v, 3) for v in ff_wire_ms],
        # whether DEFAULT_COMPILER_OPTIONS were actually applied to the
        # measured executables (False = backend rejected them / non-TPU)
        "compiler_options_applied": bool(opts_applied),
        # production-recipe numerics levers in effect (PERFORMANCE.md round 4)
        "moment_dtype": "bfloat16",
        # no state donation (production recipe, PERFORMANCE.md round 5)
        "donate_state": False,
    }
    # MFU + feasibility of the 5k img/s/chip north star at the measured
    # train-step FLOPs (XLA cost analysis of the compiled executable).
    if base_flops and peak:
        fpi = base_flops / 64  # FLOPs per image, base train step
        bound = peak / fpi     # img/s at 100% MFU
        extra.update(
            {
                "base_train_gflops_per_img": round(fpi / 1e9, 1),
                "base_mfu": round(base_ips * fpi / peak, 3),
                "peak_bf16_tflops": round(peak / 1e12, 0),
                "base_imgs_per_sec_at_100pct_mfu": round(bound, 0),
                "north_star_feasibility": (
                    f"5000 img/s needs {5000 * fpi / 1e12:.0f} TFLOP/s sustained vs "
                    f"{peak / 1e12:.0f} TFLOP/s peak bf16 on this chip -> "
                    + (
                        "attainable"
                        if bound >= 5000
                        else f"UNATTAINABLE at any MFU; 100%-MFU bound is {bound:.0f} img/s"
                    )
                ),
            }
        )
    if small_flops and peak:
        sfpi = small_flops / 64
        extra["small_train_gflops_per_img"] = round(sfpi / 1e9, 1)
        extra["small_mfu"] = round(small_ips * sfpi / peak, 3)
    if tiny_flops and peak:
        tfpi = tiny_flops / 256
        extra["tiny_train_gflops_per_img"] = round(tfpi / 1e9, 1)
        extra["tiny_mfu"] = round(tiny_ips * tfpi / peak, 3)

    result = {
        "metric": "images/sec/chip theia-base cddsv distill step (bf16)",
        "value": round(base_ips, 1),
        "unit": "images/sec/chip",
        # the 5k north star is proven unattainable on one v5e (see
        # north_star_feasibility); vs_peak_bound is the honest comparator:
        # measured throughput / this chip's 100%-MFU bound at measured FLOPs
        "vs_baseline": round(base_ips / 5000.0, 3),
        "extra": extra,
    }
    if base_flops and peak:
        result["vs_peak_bound"] = round(base_ips * (base_flops / 64) / peak, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
