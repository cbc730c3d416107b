"""The jitted, mesh-sharded distillation train/eval step.

One compiled XLA program replaces the reference's per-step host loop body
(reference: src/theia/scripts/train/train_rvfm.py:95-156): H2D copies, CPU
preprocessing, per-teacher .item() syncs and DDP bucket all-reduces all
disappear — uint8 images and bf16 targets go in, new state and a metrics
pytree come out. Gradient all-reduce over the "data" mesh axis is emitted by
the SPMD partitioner from the batch sharding.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from theia_tpu.models.losses import get_loss, main_loss_from_terms
from theia_tpu.train.optim import clip_grad_norm
from theia_tpu.train.state import TrainState


# Default XLA compiler options for the train step on TPU, found by the
# same-process A/B sweep in benchmarks/probe_xla_flags.py (PERFORMANCE.md
# "Compiler resource envelope"): raising the scoped-VMEM budget the fusion
# emitter may tile into lets the bandwidth-bound 64x64 head-ladder fusions
# use deeper tiles (less HBM re-streaming). Measured on v5e-class chip:
# tiny 91.05->89.55 ms, base 146.41->143.07 ms; 64 MB+ regresses (deeper
# tiles start evicting the working set). Applied only when the backend is
# TPU and the option is accepted; anything else falls back to plain jit.
DEFAULT_COMPILER_OPTIONS: dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
}


def _accepts_mask(tx: optax.GradientTransformation) -> bool:
    """True when tx.update takes our masked-optimizer ``mask`` kwarg
    (train.optim.make_optimizer); plain optax transformations don't."""
    import inspect

    try:
        return "mask" in inspect.signature(tx.update).parameters
    except (TypeError, ValueError):  # builtins / partials without signatures
        return False


def prepare_targets(
    targets: Mapping[str, jax.Array],
    target_stats: Optional[Mapping[str, tuple]] = None,
    dtype: Any = jnp.float32,
) -> dict[str, jax.Array]:
    """Device-side target preparation: rearrange raw [B,C,H,W] teacher
    buffers to [B,H*W,C] and apply (x-mean)/std normalization inside the
    jitted step (feature_norm="device" mode — host numpy bf16 math is
    emulated and throttles the input pipeline). ``dtype`` is the working
    dtype of the normalized targets (bf16 under loss_dtype=bf16 keeps the
    stored-bf16 buffers bf16 end-to-end; stats stay f32)."""
    out = {}
    for t, arr in targets.items():
        if arr.ndim == 4:  # raw [B, C, H, W]
            b, c = arr.shape[0], arr.shape[1]
            arr = jnp.transpose(arr.reshape(b, c, -1), (0, 2, 1))
        arr = arr.astype(dtype)
        if target_stats is not None and t in target_stats:
            mean, std = target_stats[t]
            if mean is not None:
                arr = (arr - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)
        out[t] = arr
    return out


def make_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    *,
    main_loss: str = "cos_l1",
    target_loss_weights: Optional[Mapping[str, float]] = None,
    grad_clip: bool = False,
    grad_clip_norm: float = 1.0,
    grad_clip_norm_warmup: float = 10.0,
    warmup_steps: int = 0,
    freeze_translator: bool = False,
    freeze_translator_start_step: int = 0,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    target_stats: Optional[Mapping[str, tuple]] = None,
    state_shardings: Optional[Any] = None,
    compiler_options: Optional[Mapping[str, str]] = None,
    loss_dtype: Any = jnp.float32,
    grad_allreduce_dtype: Any = None,
) -> Callable:
    """Build train_step(state, images, targets, loss_masks=None) -> (state, metrics).

    Reference semantics carried over:
      - grad clip norm 10.0 during warmup then 1.0, only if enabled
        (train_rvfm.py:126-131);
      - translator frozen from a step threshold (train_rvfm.py:149-151) —
        here branch-free: translator updates are zeroed past the threshold;
      - loss_masks implements random_target_models 2-of-N subsampling
        without recompilation (train_rvfm.py:102-105).

    ``compiler_options``: per-compile XLA/PJRT options. ``None`` uses
    ``DEFAULT_COMPILER_OPTIONS`` (measured win on TPU); ``{}`` disables.
    Only applied when the backend is TPU and accepts them (probed once with
    a trivial compile, warning on rejection); otherwise plain ``jax.jit``.

    ``grad_allreduce_dtype``: dtype for the cross-chip DP gradient
    all-reduce (e.g. ``jnp.bfloat16``). The reference's DDP all-reduces f32
    gradients (train_rvfm.py:258 via NCCL) — ~4 bytes/param/step of ICI
    traffic; a bf16 wire halves it at zero single-chip cost. When set (and
    the mesh is pure DP with a >1 "data" axis; TP meshes warn and keep
    f32), the grad computation runs under a fully-manual shard_map: each
    shard's f32 local grads are pre-scaled by 1/n_data, cast, psum'd over
    "data" on the bf16 wire, and upcast to f32 BEFORE grad-clip/optimizer —
    so all update math stays f32 (convergence parity bounded in
    tests/test_train_step.py::test_bf16_grad_allreduce_tracks_f32).
    ``None`` (default) keeps the partitioner's f32 all-reduce.
    """

    def loss_fn(params, images, targets, loss_masks):
        preds = model.apply({"params": params}, images)
        # targets arrive as [B, H*W, C] (+"_cls": [B, C]), or raw [B,C,H,W]
        # bf16 buffers when the loader runs in feature_norm="device" mode
        targets = prepare_targets(targets, target_stats, dtype=loss_dtype)
        losses = get_loss(
            preds, targets, target_loss_weights, loss_masks, compute_dtype=loss_dtype
        )
        main = main_loss_from_terms(losses, main_loss)
        return main, losses

    use_bf16_sync = (
        grad_allreduce_dtype is not None
        and mesh is not None
        and mesh.shape.get("data", 1) > 1
    )
    if use_bf16_sync and mesh.shape.get("model", 1) > 1:
        # the bf16 wire targets the DP grad sync (the reference's only
        # multi-chip traffic); under TP the grad computation would need
        # manual model-axis collectives inside the shard_map — unsupported,
        # fall back to the partitioner's f32 all-reduce with one warning
        import warnings

        warnings.warn(
            "grad_allreduce_dtype is only supported on pure-DP meshes "
            f"(model axis is {mesh.shape['model']}); keeping f32 gradient "
            "all-reduce."
        )
        use_bf16_sync = False

    def grads_and_metrics(params, images, targets, loss_masks):
        if not use_bf16_sync:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, targets, loss_masks
            )
        nd = mesh.shape["data"]

        def local(params, images, targets, loss_masks):
            (main, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, targets, loss_masks
            )
            # pre-scale by 1/n_data in f32 (the DP mean), cast, and BUCKET:
            # one flat bf16 all-reduce for the whole grad tree (the analogue
            # of DDP's NCCL bucketing) — one wire transfer of 2 bytes/param
            # instead of one small collective per leaf. The concat/split
            # copies are ~2 bytes/param of HBM traffic, noise next to the
            # step's activation streams.
            from jax.flatten_util import ravel_pytree

            flat, unravel = ravel_pytree(
                jax.tree.map(lambda x: (x / nd).astype(grad_allreduce_dtype), g)
            )
            g = unravel(jax.lax.psum(flat, "data"))
            g = jax.tree.map(lambda x: x.astype(jnp.float32), g)
            main = jax.lax.pmean(main, "data")
            losses = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), losses)
            return (main, losses), g

        # fully-manual shard_map (every mesh axis; "model" is size 1 here).
        # NOT the axis_names={"data"} partial-manual form: that lowers the
        # psum to a channel all-reduce that crashes XLA:CPU's
        # AllReducePromotion pass on bf16 operands (jax 0.9, "Invalid binary
        # instruction opcode copy") — the CPU-mesh tests would die.
        # check_vma=False is LOAD-BEARING: with it on, shard_map's autodiff
        # auto-psums the cotangent of every replicated param in f32 — the
        # exact wire this flag exists to shrink — and the bf16 bucket would
        # re-reduce an already-synced tensor (verified in the lowered HLO:
        # dozens of param-shaped f32 all-reduces). With it off, the explicit
        # bucket psum below is the ONLY gradient sync in the program.
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=((P(), P()), P()),
            check_vma=False,
        )
        return fn(params, images, targets, loss_masks)

    def train_step(state: TrainState, images, targets, loss_masks=None):
        (main, losses), grads = grads_and_metrics(
            state.params, images, targets, loss_masks
        )
        metrics = {"loss": main, **{k: losses[k] for k in ("mse_loss", "cos_loss", "l1_loss")}}
        metrics["mse_losses_per_model"] = losses["mse_losses_per_model"]
        metrics["cos_losses_per_model"] = losses["cos_losses_per_model"]
        metrics["l1_losses_per_model"] = losses["l1_losses_per_model"]

        if grad_clip:
            max_norm = jnp.where(state.step < warmup_steps, grad_clip_norm_warmup, grad_clip_norm)
            grads, gnorm = clip_grad_norm(grads, max_norm)
            metrics["grad_norm"] = gnorm

        # torch-exact masking semantics: a masked head / frozen translator
        # leaf must not move at all — params, Adam moments AND per-leaf step
        # counts stay frozen (torch skips grad-less params entirely). The
        # mask is a traced pytree, so 2-of-N teacher subsampling and the
        # freeze threshold compile once (no per-subset recompilation).
        update_mask = None
        if loss_masks is not None or freeze_translator:
            from theia_tpu.models.translators import legit_name

            head_masks = (
                {f"head_{legit_name(t)}": m for t, m in loss_masks.items()}
                if loss_masks is not None
                else {}
            )
            unfrozen = (
                jnp.asarray(state.step < freeze_translator_start_step, jnp.float32)
                if freeze_translator
                else jnp.asarray(1.0)
            )

            def leaf_mask(path, p):
                m = jnp.asarray(1.0)
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                if top == "translator_module":
                    if freeze_translator:
                        m = m * unfrozen
                    if len(path) >= 2:
                        sub = path[1].key if hasattr(path[1], "key") else str(path[1])
                        if sub in head_masks:
                            m = m * head_masks[sub]
                return m

            update_mask = jax.tree_util.tree_map_with_path(leaf_mask, state.params)

        if update_mask is not None and _accepts_mask(tx):
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params, mask=update_mask
            )
        elif update_mask is not None:
            # plain optax transformations don't take the mask kwarg: mask the
            # applied updates instead. NOTE this is weaker than the masked
            # optimizer (moments/step counts still advance for masked leaves,
            # unlike make_optimizer's torch-grad-less semantics) but keeps
            # freeze/subsampling usable with any GradientTransformation.
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree.map(
                lambda u, m: u * m.astype(u.dtype), updates, update_mask
            )
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            metrics,
        )

    shard_kwargs: dict[str, Any] = {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # state_shardings (parallel.tp.train_state_shardings) shards the
        # backbone params/moments over the "model" axis — tensor parallelism
        # via GSPMD annotations; default is replicated params (pure DP)
        state_sh = state_shardings if state_shardings is not None else repl
        shard_kwargs = dict(
            in_shardings=(state_sh, data, data, repl),
            out_shardings=(state_sh, repl),
        )
    jitted = jax.jit(
        train_step, donate_argnums=(0,) if donate else (), **shard_kwargs
    )

    opts = dict(DEFAULT_COMPILER_OPTIONS if compiler_options is None else compiler_options)
    use_opts = bool(opts) and compiler_options_supported(opts)
    if use_opts:
        # jax>=0.9 takes compiler_options directly on jit: shape/sharding/
        # weak_type dispatch, donation and recompilation all behave exactly
        # like plain jit (the hand-rolled AOT cache this replaces keyed only
        # on shape/dtype and could serve a stale executable to differently
        # committed inputs).
        optioned = jax.jit(
            train_step,
            donate_argnums=(0,) if donate else (),
            compiler_options=opts,
            **shard_kwargs,
        )
    else:
        optioned = jitted

    def wrapper(state, images, targets, loss_masks=None):
        return optioned(state, images, targets, loss_masks)

    wrapper._jitted = jitted  # options-free, for HLO inspection / option A/Bs
    # live state: None whenever the options are NOT in effect (non-TPU
    # backend, empty dict, or the probe compile rejected them)
    wrapper._compiler_options = opts if use_opts else None
    return wrapper


_OPTION_PROBE_CACHE: dict[frozenset, bool] = {}


def compiler_options_supported(opts: Mapping[str, str]) -> bool:
    """True iff the default backend is TPU and accepts ``opts``.

    Probed once per option-set with a trivial compile so an option rejected
    by this backend build degrades to plain jit with ONE visible warning —
    not a silent, permanent loss of a measured win (nor a masked real
    compile failure: only the probe's failure is swallowed; real train-step
    compile errors surface normally)."""
    key = frozenset(opts.items())
    hit = _OPTION_PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    ok = False
    try:
        if jax.devices()[0].platform == "tpu":
            jax.jit(lambda x: x + 1, compiler_options=dict(opts))(
                jnp.zeros((), jnp.float32)
            ).block_until_ready()
            ok = True
    except Exception as e:  # pragma: no cover - backend-build dependent
        import warnings

        warnings.warn(
            f"XLA compiler options {dict(opts)} rejected by this backend "
            f"({type(e).__name__}: {e}); train step falls back to default "
            "compile options (PERFORMANCE.md 'Compiler resource envelope' "
            "win not applied)."
        )
    _OPTION_PROBE_CACHE[key] = ok
    return ok


def make_eval_step(
    model: Any,
    *,
    main_loss: str = "cos_l1",
    target_loss_weights: Optional[Mapping[str, float]] = None,
    mesh: Optional[Mesh] = None,
    target_stats: Optional[Mapping[str, tuple]] = None,
    params_sharding: Optional[Any] = None,
    loss_dtype: Any = jnp.float32,
) -> Callable:
    """eval_step(params, images, targets) -> metrics (train_rvfm.py:159-192)."""

    def eval_step(params, images, targets):
        preds = model.apply({"params": params}, images)
        losses = get_loss(
            preds,
            prepare_targets(targets, target_stats, dtype=loss_dtype),
            target_loss_weights,
            compute_dtype=loss_dtype,
        )
        main = main_loss_from_terms(losses, main_loss)
        return {
            "loss": main,
            "mse_loss": losses["mse_loss"],
            "cos_loss": losses["cos_loss"],
            "l1_loss": losses["l1_loss"],
            "mse_losses_per_model": losses["mse_losses_per_model"],
            "cos_losses_per_model": losses["cos_losses_per_model"],
            "l1_losses_per_model": losses["l1_losses_per_model"],
        }

    # the eval program contains the same bandwidth-bound head-ladder fusions
    # as the train step; apply the measured scoped-VMEM win when accepted
    opt_kw: dict[str, Any] = {}
    if DEFAULT_COMPILER_OPTIONS and compiler_options_supported(DEFAULT_COMPILER_OPTIONS):
        opt_kw["compiler_options"] = dict(DEFAULT_COMPILER_OPTIONS)
    if mesh is None:
        return jax.jit(eval_step, **opt_kw)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    psh = params_sharding if params_sharding is not None else repl
    return jax.jit(
        eval_step, in_shardings=(psh, data, data), out_shardings=repl, **opt_kw
    )
