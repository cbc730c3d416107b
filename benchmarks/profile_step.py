"""Trace the tiny-cddsv train step on the TPU and print an op-time table.

Parses the jax.profiler trace (pid==3, tid==3 "XLA Ops" events) and
aggregates durations by fusion name prefix so PERFORMANCE.md's "where the
time goes" table stays measured, not guessed.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/theia_trace"


def run_and_trace() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    size = "base" if "--base" in sys.argv else "tiny"
    import theia_tpu.models.layers as L
    L.LN_STATS_IMPL = os.environ.get("THEIA_LN_IMPL", L.LN_STATS_IMPL)
    batch_size = 64 if size == "base" else 256
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(batch_size, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16)
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

    for _ in range(3):  # warm
        state, metrics = step(state, images, targets)
    float(metrics["loss"])

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(5):
        state, metrics = step(state, images, targets)
    float(metrics["loss"])
    jax.profiler.stop_trace()


def parse(top: int = 45) -> None:
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {TRACE_DIR}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [
        e for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    ]
    by_name: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    total = 0.0
    for e in events:
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        by_name[e["name"]] += dur
        counts[e["name"]] += 1
    n_steps = 5
    print(f"total device time {total:.1f} ms over {n_steps} steps = {total/n_steps:.2f} ms/step")
    print(f"{'ms/step':>9}  {'count':>6}  name")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/n_steps:9.3f}  {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        run_and_trace()
    parse()
