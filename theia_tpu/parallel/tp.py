"""Tensor-parallel sharding rules for the student backbone (GSPMD).

The reference's only training parallelism is DDP (SURVEY.md §2.8); the
"model" mesh axis existed here as a documented hook. This module makes it
real the TPU-native way: no model-code changes — parameter PartitionSpecs
drive XLA's SPMD partitioner, which shards the attention/MLP matmuls over
the axis and inserts the all-reduces (Megatron-style column→row parallel
pairs, expressed as annotations instead of hand-written collectives):

  query/key/value kernel  [C, C]   -> P(None, "model")   (shard heads out)
  attention_output kernel [C, C]   -> P("model", None)   (contract heads)
  intermediate kernel     [C, 4C]  -> P(None, "model")   (column parallel)
  output kernel           [4C, C]  -> P("model", None)   (row parallel)

with the matching bias layout; everything else (embeddings, LayerNorms,
translator heads) stays replicated. A forward then runs each block with ONE
all-reduce after attention and one after the MLP — the textbook TP cut.
Replaces nothing in the reference (it has no TP); scaling-book-style mesh
design for deployments where the student outgrows one chip's HBM or the
batch can't fill the data axis alone.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from theia_tpu.train.state import TrainState


def validate_tp(num_heads: int, intermediate_size: int, n_model: int) -> None:
    if n_model <= 1:
        return
    if num_heads % n_model or intermediate_size % n_model:
        raise ValueError(
            f"model axis {n_model} must divide num_heads={num_heads} and "
            f"intermediate_size={intermediate_size} for tensor parallelism"
        )


def backbone_tp_specs(params: Any) -> Any:
    """PartitionSpec pytree (same structure as ``params``) sharding the
    backbone transformer blocks over the "model" axis; all other leaves
    replicated."""

    def spec(path, leaf) -> P:
        keys = [p.key for p in path if hasattr(p, "key")]
        if len(keys) >= 3 and any(k.startswith("block_") for k in keys):
            parent, name = keys[-2], keys[-1]
            if parent in ("query", "key", "value"):
                return P(None, "model") if name == "kernel" else P("model")
            if parent == "attention_output":
                return P("model", None) if name == "kernel" else P()
            if parent == "intermediate":
                return P(None, "model") if name == "kernel" else P("model")
            if parent == "output":
                return P("model", None) if name == "kernel" else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def train_state_shardings(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    params: Any,
    param_specs: Any,
) -> TrainState:
    """TrainState-shaped pytree of NamedShardings for jit in/out_shardings.

    Optimizer-state leaves that mirror params (Adam moments, per-leaf step
    counts) get the matching param spec via optax.tree_map_params; scalar
    bookkeeping leaves are replicated."""
    repl = NamedSharding(mesh, P())
    as_shard = lambda s: NamedSharding(mesh, s)
    map_specs = lambda tree: jax.tree.map(lambda _, s: as_shard(s), tree, param_specs)

    from theia_tpu.train.optim import MaskedAdamWState

    def rec(node: Any) -> Any:
        if isinstance(node, MaskedAdamWState):
            # per-leaf step counts are SCALARS in params structure — they
            # must replicate; only the moments mirror the param shardings
            return MaskedAdamWState(
                sched_count=repl,
                count=jax.tree.map(lambda _: repl, node.count),
                mu=map_specs(node.mu),
                nu=map_specs(node.nu),
            )
        if hasattr(node, "mu") and hasattr(node, "nu"):  # optax ScaleByAdamState
            return type(node)(count=repl, mu=map_specs(node.mu), nu=map_specs(node.nu))
        if isinstance(node, tuple):
            children = [rec(c) for c in node]
            # NamedTuples (optax states, chained tx tuples of states)
            # rebuild positionally; a PLAIN tuple ctor takes one iterable
            if type(node) is tuple:
                return tuple(children)
            return type(node)(*children)
        return repl  # scalar bookkeeping / empty states

    opt_shapes = jax.eval_shape(tx.init, params)
    return TrainState(
        step=repl,
        params=map_specs(params),
        opt_state=rec(opt_shapes),
    )
