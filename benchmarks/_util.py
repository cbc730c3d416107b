"""Shared measurement helpers for the benchmark/probe scripts.

Centralizes the two patterns every probe needs so their pitfalls are fixed
in ONE place (review finding: the H2D block was copy-pasted with the same
compile-in-window bug in two scripts):

  - timed_chain: this TPU is attached over a network relay where
    block_until_ready returns before execution finishes — only a data
    readback synchronizes. Time N chained steps ending in one readback and
    subtract a 1-step run.
  - h2d_bandwidth / d2h_bandwidth: warm BOTH the transfer path and the
    readback-fence computation (the .sum() XLA program) before the timed
    window, so a first-call compile never lands inside the measurement.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def timed_chain(run_n: Callable[[int], float], n: int = 30) -> float:
    """Per-iteration seconds from a chained run: (t_n - t_1) / (n - 1).

    ``run_n(k)`` must execute k dependent iterations ending in ONE scalar
    readback and return its wall time. Callers warm up first.
    """
    t1 = run_n(1)
    tn = run_n(n + 1)
    return max((tn - t1) / n, 1e-9)


def h2d_bandwidth(nbytes: int = 64 * 1024 * 1024) -> float:
    """Raw host->device bandwidth in bytes/s (readback-fenced, compile-warm)."""
    import jax

    payload = np.random.default_rng(0).standard_normal(nbytes // 4).astype(np.float32)
    # warm the transfer path AND compile the fencing .sum() program
    float(jax.device_put(payload).sum())
    t = time.perf_counter()
    float(jax.device_put(payload).sum())
    return payload.nbytes / (time.perf_counter() - t)


def d2h_bandwidth(nbytes: int = 64 * 1024 * 1024) -> float:
    """Raw device->host readback bandwidth in bytes/s."""
    import jax

    payload = np.random.default_rng(1).standard_normal(nbytes // 4).astype(np.float32)
    # jax.Array caches its host copy after the first np.asarray, so timing a
    # second read of the SAME array measures a host memcpy (~700 GB/s seen),
    # not the wire. Read back a FRESH array each time: bump() produces a new
    # buffer per call; its on-chip cost (one HBM add) is negligible vs the
    # transfer at any realistic attachment bandwidth.
    bump = jax.jit(lambda x: x + 1.0)
    dev = jax.device_put(payload)
    warm = bump(dev)
    _ = np.asarray(warm)  # warm compile + readback path
    fresh = bump(warm)
    t = time.perf_counter()
    _ = np.asarray(fresh)
    return payload.nbytes / (time.perf_counter() - t)
