"""TPU A/B: XLA compiler-option sweep on the full cddsv train step.

Every prior probe re-phrased the *program* (PERFORMANCE.md don't-retry
table); this one re-phrases the *compiler's resource envelope* instead.
Candidates are single-chip TPU options that change fusion tiling /
scheduling for the bandwidth-bound convT+LN head ladders:

  - ``xla_tpu_scoped_vmem_limit_kib``: raises the VMEM budget the fusion
    emitter may tile into. The 64x64x768 head-ladder fusions run at 133-150
    GB/s partly because their tiles re-stream inputs; a bigger scoped VMEM
    window can deepen tiles and cut HBM traffic.
  - ``xla_tpu_enable_latency_hiding_scheduler``: reorders the schedule to
    overlap async copies (~6 ms/step in the base trace) with compute.

The axon client's XLA_FLAGS parser rejects TPU backend flags ("Unknown flag
in XLA_FLAGS"), so this probe passes them as per-compile PJRT
``compiler_options`` via ``step._jitted.lower(...).compile(...)`` — which
also restores the same-process A/B/A discipline (PERFORMANCE.md): one
process, one executable per option set, baseline re-measured last.

Usage: python benchmarks/probe_xla_flags.py [--sizes tiny,base]
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = {"tiny": 256, "base": 64}

CANDIDATES: list[dict[str, str]] = [
    {},
    {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {},
]

# Round-4 second sweep: each candidate layered ON TOP of the adopted
# production option (scoped VMEM 32 MB) so deltas are vs the shipping
# recipe. Names are public single-chip TPU fusion/scheduling knobs (seen
# in public MaxText/JetStream perf configs); an option unknown to this
# backend build is rejected at compile time and logged, not fatal.
_ADOPTED = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
EXTRA_CANDIDATES: list[dict[str, str]] = [
    dict(_ADOPTED),
    {**_ADOPTED, "xla_tpu_enable_experimental_fusion_cost_model": "true"},
    {**_ADOPTED, "xla_tpu_dot_dot_fusion_duplicated": "true"},
    {**_ADOPTED, "xla_tpu_enable_aggressive_broadcast_priority_update": "true"},
    {**_ADOPTED, "xla_tpu_rwb_fusion": "false"},
    {**_ADOPTED, "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {**_ADOPTED, "xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    {**_ADOPTED, "xla_tpu_licm_size_inflation_ratio": "2"},
    dict(_ADOPTED),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="tiny,base")
    sweep = ap.add_mutually_exclusive_group()
    sweep.add_argument(
        "--extra",
        action="store_true",
        help="sweep EXTRA_CANDIDATES (fusion/scheduler knobs layered on the "
        "adopted scoped-VMEM 32MB option; baseline bracketed first/last)",
    )
    sweep.add_argument(
        "--vmem",
        default=None,
        help="comma-separated xla_tpu_scoped_vmem_limit_kib values to sweep "
        "(replaces the default candidate list; baseline bracketed A/...-/A)",
    )
    args = ap.parse_args()
    global CANDIDATES
    if args.extra:
        CANDIDATES = EXTRA_CANDIDATES
    if args.vmem:
        CANDIDATES = (
            [{}]
            + [{"xla_tpu_scoped_vmem_limit_kib": v.strip()} for v in args.vmem.split(",")]
            + [{}]
        )

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step
    from benchmarks._util import timed_chain

    for size in args.sizes.split(","):
        batch_size = BATCH[size]
        # data-independent step timing: inputs generated on-device so the
        # probe doesn't ride the relay wire (bench.py does the same)
        images = (
            jax.random.uniform(jax.random.PRNGKey(0), (batch_size, 224, 224, 3)) * 255
        ).astype(jnp.uint8)
        targets = {
            k: jax.random.normal(
                jax.random.PRNGKey(i + 1), (batch_size, s[1] * s[2], s[0]), jnp.bfloat16
            )
            for i, (k, s) in enumerate(CDDSV_TARGETS.items())
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
        step = make_train_step(model, tx, main_loss="cos_l1", donate=False)
        state0 = TrainState.create(params, tx)
        lowered = step._jitted.lower(state0, images, targets, None)

        for opts in CANDIDATES:
            try:
                compiled = lowered.compile(compiler_options=opts or None)
            except Exception as e:  # unknown option on this backend build
                print(json.dumps({"size": size, "options": opts,
                                  "error": str(e)[-200:]}), flush=True)
                continue
            box = {"state": state0}

            def run_n(n: int) -> float:
                t0 = time.perf_counter()
                for _ in range(n):
                    box["state"], metrics = compiled(box["state"], images, targets, None)
                float(metrics["loss"])
                return time.perf_counter() - t0

            run_n(2)  # warm
            sec = float(np.median([timed_chain(run_n, 30) for _ in range(3)]))
            print(json.dumps({
                "size": size,
                "options": opts,
                "ms_per_step": round(sec * 1e3, 2),
                "img_per_s": round(batch_size / sec, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
