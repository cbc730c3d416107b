"""TPU probe: AUTO argument memory layouts for the train step (round 5).

With state donation off (the adopted production recipe), XLA no longer has
an aliasing constraint tying input and output buffers — so in principle the
compiler could pick better-than-default HBM layouts for the TrainState
arguments (jax.experimental.layout Format(Layout.AUTO)). The catch: the
training loop feeds step outputs back as inputs, so AUTO only helps if the
chosen OUTPUT format of every state leaf equals the chosen INPUT format —
otherwise every step pays a relayout that defeats the point.

This probe (1) compiles the base step with AUTO in/out formats, (2) reports
how many state leaves got non-default layouts and whether in/out formats
match, and (3) if they match, times the AUTO executable against the default
one, same-process A/B.

Usage: python benchmarks/probe_auto_layout.py [--size base] [--batch 64]
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
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import (
        DEFAULT_COMPILER_OPTIONS,
        compiler_options_supported,
        make_train_step,
    )

    key = jax.random.PRNGKey(0)
    kimg, *kt = jax.random.split(key, 1 + len(CDDSV_TARGETS))
    images = jax.random.randint(kimg, (args.batch, 224, 224, 3), 0, 256, jnp.uint8)
    targets = {
        k: jax.random.normal(kk, (args.batch, s[1] * s[2], s[0]), jnp.bfloat16)
        for kk, (k, s) in zip(kt, CDDSV_TARGETS.items())
    }
    model = Theia(
        backbone=f"facebook/deit-{args.size}-patch16-224",
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
    step = make_train_step(model, tx, main_loss="cos_l1", donate=False)
    state = TrainState.create(params, tx)
    opts = dict(DEFAULT_COMPILER_OPTIONS) if compiler_options_supported(DEFAULT_COMPILER_OPTIONS) else None

    # Default executable
    lowered = step._jitted.lower(state, images, targets, None)
    compiled_def = lowered.compile(compiler_options=opts) if opts else lowered.compile()

    # AUTO executable: jit the same traced function with AUTO formats.
    # step._jitted is a jitted function; jax allows wrapping it again.
    auto_fmt = Format(Layout.AUTO)
    auto_jit = jax.jit(
        lambda s, i, t: step._jitted(s, i, t, None),
        in_shardings=auto_fmt,
        out_shardings=auto_fmt,
        donate_argnums=(),
    )
    lowered_auto = auto_jit.lower(state, images, targets)
    compiled_auto = (
        lowered_auto.compile(compiler_options=opts) if opts else lowered_auto.compile()
    )

    in_fmts = compiled_auto.input_formats
    out_fmts = compiled_auto.output_formats
    in_leaves = jax.tree.leaves(in_fmts, is_leaf=lambda x: isinstance(x, Format))
    out_leaves = jax.tree.leaves(out_fmts, is_leaf=lambda x: isinstance(x, Format))
    state_in = jax.tree.leaves(
        in_fmts[0][0], is_leaf=lambda x: isinstance(x, Format)
    )
    state_out = jax.tree.leaves(
        out_fmts[0], is_leaf=lambda x: isinstance(x, Format)
    )
    nondefault = sum(
        1 for f in state_in if getattr(f.layout, "major_to_minor", None) is not None
        and list(f.layout.major_to_minor) != sorted(f.layout.major_to_minor, reverse=True)
    )
    match = [str(a) == str(b) for a, b in zip(state_in, state_out)]
    print(json.dumps({
        "state_leaves": len(state_in),
        "nondefault_input_layouts": nondefault,
        "in_out_format_match": sum(match),
        "mismatched": len(match) - sum(match),
    }), flush=True)

    if sum(match) != len(match):
        print(json.dumps({
            "verdict": "AUTO layouts mismatch between step input and output "
            "state formats -> every step would pay a relayout; not timed"
        }))
        return

    # formats chain: time default vs auto, A/B/A
    def bench(compiled, place_fmt=None):
        s = state
        imgs, tgts = images, targets
        if place_fmt is not None:
            s = jax.device_put(s, in_fmts[0][0])
            imgs = jax.device_put(images, in_fmts[0][1])
            tgts = jax.device_put(targets, in_fmts[0][2])
        box = {"s": s}

        def run_n(n):
            t0 = time.perf_counter()
            for _ in range(n):
                if place_fmt is None:
                    box["s"], m = compiled(box["s"], imgs, tgts, None)
                else:
                    box["s"], m = compiled(box["s"], imgs, tgts)
            float(m["loss"])
            return time.perf_counter() - t0

        run_n(2)
        t1 = run_n(1)
        tn = run_n(30)
        return max((tn - t1) / 29, 1e-9)

    for name, c, fmt in (
        ("default", compiled_def, None),
        ("auto", compiled_auto, True),
        ("default_close", compiled_def, None),
    ):
        dt = bench(c, fmt)
        print(json.dumps({
            "variant": name, "step_ms": round(dt * 1000, 2),
            "img_per_s": round(args.batch / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
