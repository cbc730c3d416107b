"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP backend
(reference: src/theia/scripts/train/train_rvfm.py:211-229 — one process per
GPU, DDP gradient all-reduce). Here a single program lays a
``Mesh(("data", "model"))`` over all chips: the batch is sharded on "data",
params are replicated (or sharded on "model" for FSDP-style layouts), and
XLA's SPMD partitioner emits the gradient all-reduces over ICI/DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """("data", "model") mesh. Default: all devices on the data axis —
    the reference's only training parallelism is DP (SURVEY.md §2.8).
    n_model > 1 enables tensor parallelism over the "model" axis via the
    GSPMD param specs in theia_tpu.parallel.tp (training.model_axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree onto the mesh, sharded on the batch dim.

    Single-process path; multi-host uses
    jax.make_array_from_process_local_data (see theia_tpu.parallel.distributed).
    """
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
