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

with the matching bias layout. A forward then runs each block with ONE
all-reduce after attention and one after the MLP — the textbook TP cut.
Replaces nothing in the reference (it has no TP); scaling-book-style mesh
design for deployments where the student outgrows one chip's HBM or the
batch can't fill the data axis alone.

``tp_specs`` additionally shards the translator heads — the framework's
dominant cost center (PERFORMANCE.md: the lconv heads are ~27 of 91 ms at
tiny and the majority of step FLOPs at base) — so ``model_axis > 1``
addresses the *majority* of the step, not just the backbone. Each head
ladder gets the same textbook cut, alternating column/row parallel through
its conv/dense chain (LightConv 16->64 ladder shown; B'=B/data axis,
h=hidden, n=model axis size):

  adapter_1 ConvT(c_s->h)   column: kernel [k,k,I,O] -> P(...,"model")
  adapter_3 LN(h,31,31)     affine sharded on C; stats are per-SAMPLE
                            scalars over (H,W,C), so GSPMD's cross-shard
                            stat reduction is an all-reduce of [B'] floats
                            — negligible
  adapter_4 ConvT(h->h)     row: kernel -> P(..,"model",.); output is a
                            partial sum -> ONE all-reduce [B',64,64,h]
  adapter_6 LN              replicated (input replicated)
  adapter_8 Dense(h->c_t)   column: output features sharded; the loss
                            reduces them locally + a scalar all-reduce

Per-step forward comm volume per head is that single row-parallel
all-reduce: bf16 B'*HW_out*h*2 bytes (base h=768, B'=64: ~25 MB for a
16x16-target head, ~402 MB for a 64x64 head; backward mirrors it). That
is the minimum any within-head cut pays without changing numerics — the
64x64 heads' maps are simply that large; at ICI bandwidths (~1e11 B/s/link
v5e) it overlaps with the ladder's own compute. `_cls` Linear heads and
MLP-translator heads get the same alternating cut (column first).
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


def _backbone_spec(keys: list[str]) -> P:
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


def backbone_tp_specs(params: Any) -> Any:
    """PartitionSpec pytree (same structure as ``params``) sharding the
    backbone transformer blocks over the "model" axis; all other leaves
    replicated."""

    def spec(path, leaf) -> P:
        keys = [p.key for p in path if hasattr(p, "key")]
        return _backbone_spec(keys)

    return jax.tree_util.tree_map_with_path(spec, params)


def _ladder_plan(head: Any) -> dict[str, str]:
    """Role per head submodule: "col" | "row" | "ln_shard" | "repl".

    Head ladders are torch nn.Sequential ports whose module names encode the
    sequential index (adapter_0, adapter_1, ...; models/adapter_heads.py), so
    walking them index-sorted recovers dataflow order. Conv/Dense modules
    alternate column/row parallel; a LayerNormSpatial between them is sharded
    iff the running activation is channel-sharded at that point (relu/LN/bias
    preserve the sharding). The PadTo16 pre-conv ("pad") stays replicated."""

    def idx(name: str) -> int:
        tail = name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    plan: dict[str, str] = {}
    ordinal = 0  # conv/dense counter: even -> column parallel, odd -> row
    shard_c = False  # is the running activation channel-sharded here?
    for m in sorted(head, key=idx):
        sub = head[m]
        if idx(m) < 0 or not hasattr(sub, "keys"):
            plan[m] = "repl"
            continue
        if "kernel" in sub:  # Conv2d/ConvTranspose2d/Dense (torch wrappers)
            col = ordinal % 2 == 0
            plan[m] = "col" if col else "row"
            shard_c = col
            ordinal += 1
        elif "weight" in sub and getattr(sub["weight"], "ndim", 1) == 3:
            plan[m] = "ln_shard" if shard_c else "repl"  # LayerNormSpatial
        else:
            plan[m] = "repl"
    return plan


def _head_divisible(head: Any, plan: dict[str, str], n_model: int) -> bool:
    """True iff every dimension the plan would shard divides n_model."""
    for mod, role in plan.items():
        sub = head.get(mod)
        if not hasattr(sub, "keys"):
            continue
        if role == "col":
            k = sub.get("kernel")
            if k is not None and k.shape[-1] % n_model:
                return False
            b = sub.get("bias")
            if b is not None and b.shape[0] % n_model:
                return False
        elif role == "row":
            k = sub.get("kernel")
            if k is not None and k.shape[-2] % n_model:
                return False
        elif role == "ln_shard":
            w = sub.get("weight")
            if w is not None and w.shape[0] % n_model:
                return False
    return True


def tp_specs(params: Any, n_model: int = 0) -> Any:
    """Full tensor-parallel PartitionSpecs: backbone blocks (see
    ``backbone_tp_specs``) PLUS the translator heads (see module docstring
    for the per-ladder cut and comm volume). Pass ``n_model`` (> 1) to
    validate every sharded dimension divides the model axis."""
    plans: dict[str, dict[str, str]] = {}
    tr = params.get("translator_module") if hasattr(params, "get") else None
    if tr is not None:
        for head_name, head in tr.items():
            if head_name.startswith("head_") and hasattr(head, "keys"):
                plan = _ladder_plan(head)
                if n_model > 1 and not _head_divisible(head, plan, n_model):
                    # a head whose channel dims don't divide the model axis
                    # (e.g. a custom teacher with odd feature size) stays
                    # replicated — the backbone still shards; don't fail a
                    # config that trained fine with backbone-only TP
                    import warnings

                    warnings.warn(
                        f"head TP: {head_name} has dimensions not divisible "
                        f"by model_axis={n_model}; replicating this head "
                        "(backbone TP unaffected)"
                    )
                    continue
                plans[head_name] = plan

    def check(dim: int, path) -> None:
        if n_model > 1 and dim % n_model:
            raise ValueError(
                f"head TP: dimension {dim} at {jax.tree_util.keystr(path)} "
                f"is not divisible by model_axis={n_model}"
            )

    def spec(path, leaf) -> P:
        keys = [p.key for p in path if hasattr(p, "key")]
        if len(keys) < 4 or keys[0] != "translator_module" or keys[1] not in plans:
            return _backbone_spec(keys)
        role = plans[keys[1]].get(keys[2], "repl")
        name = keys[-1]
        if role == "col":
            if name == "kernel":
                check(leaf.shape[-1], path)
                return P(*([None] * (leaf.ndim - 1)), "model")
            check(leaf.shape[0], path)
            return P("model")  # bias
        if role == "row":
            if name == "kernel":
                check(leaf.shape[-2], path)
                return P(*([None] * (leaf.ndim - 2)), "model", None)
            return P()  # bias adds after the partial-sum all-reduce
        if role == "ln_shard":
            check(leaf.shape[0], path)
            return P("model", None, None)  # torch (C,H,W) affine
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
