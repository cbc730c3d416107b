"""Micro-repro of the adapter-ladder hot pair: convT(31->64) + LayerNormSpatial.

The full-step traces put this pair's fwd+bwd fusions at 131-245 GB/s
(fusion/fusion.2, multiply_reduce_fusion.8/.10 at base; fusion.13/.15,
multiply_reduce_fusion.12/.14 at tiny) — ~2.5-3x over the byte/FLOP floor.
This bench isolates it so lowering variants compile in ~1 min instead of
the ~10 min full-step compile.

Timed op: value_and_grad of sum(loss_weight * LN(convT(x, W) + bias)) wrt
(x, W, bias, ln_w, ln_b) — the same fwd+bwd subgraph shape the step has.

Usage: python benchmarks/micro_ladder.py [--tiny] [--variant NAME ...]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    import theia_tpu.models.layers as L
    from theia_tpu.ops.convt import conv_transpose_2d

    tiny = "--tiny" in sys.argv
    b, c = (256, 192) if tiny else (64, 768)
    n_in, n_out = 31, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n_in, n_in, c).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, c, c) * 0.02).astype(np.float32))
    bias = jnp.asarray(np.zeros(c, np.float32))
    ln_w = jnp.asarray(rng.rand(c, n_out, n_out).astype(np.float32))
    ln_b = jnp.asarray(rng.randn(c, n_out, n_out).astype(np.float32))
    g_like = jnp.asarray(rng.randn(b, n_out, n_out, c).astype(np.float32), jnp.bfloat16)

    ln_mod = L.LayerNormSpatial((c, n_out, n_out), dtype=jnp.bfloat16)

    def make_fn(barrier: bool = False, ln_impl: str = "vpu", subpixel: bool = False,
                convt_fwd: str = "dilated"):
        def f(x, w, bias, ln_w, ln_b, g_like):
            import theia_tpu.ops.convt as C
            C.CONVT_FWD = convt_fwd
            L.LN_STATS_IMPL = ln_impl
            # the 31->64 ladder stage: k=3, s=2, p=0, op=1 (adapter_heads.py:163)
            y = conv_transpose_2d(
                x, w.astype(jnp.bfloat16), stride=2, padding=0, output_padding=1,
                subpixel=subpixel,
            )
            y = (y + bias.astype(jnp.bfloat16)).astype(jnp.bfloat16)
            if barrier:
                y = jax.lax.optimization_barrier(y)
            out = ln_mod.apply(
                {"params": {"weight": ln_w, "bias": ln_b}}, y
            )
            return jnp.sum(out.astype(jnp.float32) * g_like.astype(jnp.float32))

        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))

    def bench(name: str, fn) -> None:
        args = (x, w, bias, ln_w, ln_b, g_like)
        out = fn(*args)
        jax.block_until_ready(out)
        float(out[2][0])

        def run_n(n: int) -> float:
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn(*args)
            float(r[2][0])
            return time.perf_counter() - t0

        run_n(3)
        t1 = run_n(1)
        tn = run_n(30)
        dt = max((tn - t1) / 29, 1e-9)
        print(json.dumps({"variant": name, "ms": round(dt * 1000, 3)}), flush=True)

    # correctness: pallas backward vs autodiff on-device (bf16 tolerance)
    ref = make_fn()(x, w, bias, ln_w, ln_b, g_like)
    got = make_fn(ln_impl="pallas")(x, w, bias, ln_w, ln_b, g_like)
    for name, a, bb in zip(("dx", "dW", "dbias", "dln_w", "dln_b"), ref, got):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        denom = max(float(np.max(np.abs(a))), 1e-6)
        rel = float(np.max(np.abs(a - bb))) / denom
        print(json.dumps({"grad_check": name, "max_rel": round(rel, 6)}), flush=True)

    bench("current", make_fn())
    bench("classes_fwd", make_fn(convt_fwd="classes"))
    bench("current2", make_fn())

    if "--trace" in sys.argv:
        import jax.profiler

        for name, fn in (("current", make_fn()), ("pallas", make_fn(ln_impl="pallas"))):
            args = (x, w, bias, ln_w, ln_b, g_like)
            r = fn(*args)
            float(r[2][0])
            jax.profiler.start_trace(f"/tmp/micro_trace_{name}")
            for _ in range(5):
                r = fn(*args)
            float(r[2][0])
            jax.profiler.stop_trace()
        print("traces in /tmp/micro_trace_{current,pallas}", flush=True)


if __name__ == "__main__":
    main()
