"""Multi-host initialization.

Replaces torchrun + dist.init_process_group("nccl") (reference:
src/theia/scripts/train/train_rvfm.py:211-229): on TPU pods
jax.distributed.initialize() discovers peers from the TPU environment; the
input pipeline then shards by (process_index, process_count) and global
arrays are assembled with jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def maybe_initialize_distributed() -> tuple[int, int]:
    """Initialize jax.distributed when running under a multi-host launcher.

    Returns (process_index, process_count). Safe to call in single-process
    runs (no-op).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host TPU VMs raise; that's fine
            print(f"jax.distributed.initialize skipped: {e}")
    return jax.process_index(), jax.process_count()


def make_global_batch(mesh: jax.sharding.Mesh, local_batch: Any) -> Any:
    """Assemble per-host numpy batches into global sharded jax.Arrays
    (the multi-host analogue of parallel.mesh.shard_batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
