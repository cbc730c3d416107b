"""Training orchestration: epochs, eval, checkpoints, metrics.

TPU-native re-design of the reference runtime (reference:
src/theia/scripts/train/train_rvfm.py:38-345): one python process per TPU
host drives a single jitted train step over the ("data","model") mesh; the
host loop only streams batches, rolls teacher subsets, throttles metric
readback, and saves orbax checkpoints (with true resume — more than the
reference's weights-only torch.save).
"""

from __future__ import annotations

import math
import os
import random
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.config import DotDict, to_yaml
from theia_tpu.data.dataset import get_frame_dataloader, get_image_video_dataset
from theia_tpu.foundation.common import MODEL_FEATURE_SIZES, get_model_feature_size
from theia_tpu.models.rvfm import Theia
from theia_tpu.parallel.distributed import make_global_batch
from theia_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from theia_tpu.train.checkpoint import CheckpointSession, restore_checkpoint
from theia_tpu.train.optim import (
    constant_with_warmup,
    cosine_restarts_with_warmup,
    make_optimizer,
    scaled_lr,
)
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_eval_step, make_train_step
from theia_tpu.utils.logging import MetricLogger, create_meters, update_meters_from_metrics
from theia_tpu.utils.seed import seed_everything


def _parse_grad_allreduce_dtype(value):
    """training.grad_allreduce_dtype -> jnp dtype or None, rejecting typos
    loudly (a silently-ignored "bf16" would invalidate any comm A/B)."""
    if value in (None, "float32", "f32"):
        return None
    if value in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(
        f"training.grad_allreduce_dtype={value!r} not supported: use "
        "'float32' (exact wire) or 'bfloat16' (half the DP all-reduce bytes)"
    )


def select_target_models(cfg: DotDict) -> tuple[list[str], list[str], dict[str, tuple[int, ...]]]:
    """Teacher selection incl. optional `<t>_cls` targets
    (reference train_rvfm.py:230-246). Returns (all names, names w/o _cls,
    target feature sizes)."""
    names = list(cfg.training.target_models.target_model_names or [])
    if not names:
        names = list(MODEL_FEATURE_SIZES.keys())
    names = [t for t in names if "llava" not in t]
    sizes = {t: get_model_feature_size(t, keep_spatial=True) for t in names}
    names_wocls = names[:]
    if cfg.training.get("distill_cls", False):
        for t in names_wocls:
            if "google/vit" in t or "facebook/dino" in t or "openai/clip" in t:
                sizes[t + "_cls"] = sizes[t][:1]
                names.append(t + "_cls")
    return names, names_wocls, sizes


def resolve_num_workers(cfg: DotDict) -> int:
    """Loader-worker count: ``dataset.num_workers`` is the operative knob
    (0 = in-process decode). A reference config ported verbatim carries
    ``training.num_workers`` instead (reference data_utils.py:531-556) —
    honor it as an alias so such configs don't silently fall back to
    single-core decode, but cap it at cpu_count-1: spawning the reference
    default of 8 worker processes on a 1-core host measurably LOSES to
    in-process decode (PERFORMANCE.md, input-pipeline table)."""
    if "num_workers" in cfg.dataset:
        return int(cfg.dataset.get("num_workers", 0) or 0)
    legacy = int(cfg.training.get("num_workers", 0) or 0)
    if legacy <= 0:
        return 0
    cap = max(0, (os.cpu_count() or 1) - 1)
    n = min(legacy, cap)
    print(
        f"[theia_tpu] training.num_workers={legacy} aliased to loader "
        f"num_workers={n} (capped at cpu_count-1={cap}; set "
        f"dataset.num_workers explicitly to override)"
    )
    return n


def build_run_identifier(cfg: DotDict) -> str:
    """rvfm_dp<ratio>_<backbone>_<translator>[_pretrained]_<notes>
    (reference train_rvfm.py:336-341)."""
    backbone = f"_{cfg.model.backbone.backbone.replace('/', '-')}"
    notes = f"_{cfg.logging.notes}" if cfg.logging.notes else ""
    translator = f"_{cfg.model.translator.type}"
    pretrained = "_pretrained" if cfg.model.backbone.get("pretrained") else ""
    dp = f"_dp{cfg.dataset.dataset_ratio:.3f}"
    return f"rvfm{dp}{backbone}{translator}{pretrained}{notes}"


def build_lr_schedule(cfg: DotDict, lr: float, total_steps: int, warmup_steps: int):
    name = cfg.training.lr_scheduler.get("name", "constant_with_warmup")
    start = float(cfg.training.lr_scheduler.get("warm_up_lr_start_factor", 1e-2))
    if name == "constant_with_warmup":
        return constant_with_warmup(lr, warmup_steps, start)
    if name == "cosine_restarts_with_warmup":
        return cosine_restarts_with_warmup(
            lr, warmup_steps, max(total_steps - warmup_steps, 1), start
        )
    raise NotImplementedError(f"lr_scheduler {name}")


def _targets_from_batch(batch: dict, target_model_names: list[str]) -> dict[str, np.ndarray]:
    """batch[teacher]["embedding"/"cls"] -> target dict
    (reference train_rvfm.py:107-114). "embedding_chw" carries raw bf16
    buffers in feature_norm="device" mode."""
    out = {}
    for t in target_model_names:
        base = t.replace("_cls", "")
        if "_cls" in t:
            out[t] = batch[base]["cls"]
        else:
            fields = batch[base]
            out[t] = fields.get("embedding_chw", fields.get("embedding"))
    return out


def train_from_config(cfg: DotDict, resume: bool = True, max_steps: Optional[int] = None) -> dict:
    """Full training entry (reference ddp_main + train; train_rvfm.py:221-345).

    Returns a summary dict (final step, last losses) for tests/CLIs.
    """
    if not cfg.logging.get("run_identifier_prefix"):
        cfg.logging.run_identifier_prefix = build_run_identifier(cfg)
    seed_everything(cfg.seed)

    process_index = jax.process_index()
    process_count = jax.process_count()
    is_main = process_index == 0

    target_model_names, names_wocls, target_sizes = select_target_models(cfg)

    dtype = jnp.bfloat16 if cfg.training.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
    model = Theia(
        backbone=cfg.model.backbone.backbone,
        pretrained=cfg.model.backbone.get("pretrained", False),
        translator=cfg.model.translator.type,
        translator_kwargs=dict(cfg.model.translator.get("kwargs", {}) or {}),
        target_feature_sizes=target_sizes,
        target_loss_weights=cfg.training.target_models.get("target_model_weights"),
        num_reg_tokens=int(cfg.model.backbone.get("num_reg_tokens", 7) or 7),
        dtype=dtype,
        fuse_preprocessing=bool(cfg.training.get("fuse_preprocessing", False)),
        fast_math=bool(cfg.training.get("fast_math", False)),
    )

    # model_axis > 1 shards the backbone over the mesh "model" axis
    # (tensor parallelism, parallel/tp.py); data parallelism fills the rest
    n_model = int(cfg.training.get("model_axis", 1) or 1)
    mesh = make_mesh(n_model=n_model)
    n_chips = int(mesh.devices.size)
    n_data = n_chips // n_model
    if n_model > 1:
        from theia_tpu.models.vit import BACKBONE_CONFIGS
        from theia_tpu.parallel.tp import validate_tp

        bb_cfg = BACKBONE_CONFIGS.get(model.backbone)
        if bb_cfg is None:
            # an unknown backbone with model_axis>1 would otherwise surface
            # as an opaque GSPMD sharding error deep inside jit
            raise ValueError(
                f"model_axis={n_model} requires a known backbone config to "
                f"validate divisibility, but {model.backbone!r} is not in "
                f"BACKBONE_CONFIGS ({sorted(BACKBONE_CONFIGS)})"
            )
        validate_tp(bb_cfg.num_heads, bb_cfg.intermediate_size, n_model)

    feature_norm = cfg.dataset.feature_norm
    target_stats = None
    if feature_norm == "device":
        from theia_tpu.data.stats import load_feature_stats

        means, stds = load_feature_stats(
            cfg.dataset.get("stats_root") or cfg.dataset.dataset_root,
            names_wocls,
            dtype=np.float32,
        )
        target_stats = {}
        for t in target_model_names:
            base = t.replace("_cls", "")
            target_stats[t] = (means[base], stds[base])

    mix_cfg = cfg.dataset.dataset_mix
    if cfg.dataset.get("type", "image_video") == "oxe":
        # OXE robot-data mixes (reference configs/dataset/oxe_octo_mix.yaml +
        # dataset/oxe/oxe_mixes.py): packed per-view shards, named mixes
        from theia_tpu.data.oxe import get_oxe_frame_dataset

        ds_kwargs = dict(
            dataset_root=cfg.dataset.dataset_root,
            dataset_mix=mix_cfg if isinstance(mix_cfg, str) else list(mix_cfg),
            feature_models=names_wocls,
            image_views=cfg.dataset.get("image_views"),
            rank=process_index,
            world_size=process_count,
            seed=cfg.seed,
        )
        train_ds, train_len = get_oxe_frame_dataset(
            split="train", dataset_ratio=cfg.dataset.dataset_ratio,
            shuffle=cfg.dataset.shuffle, **ds_kwargs,
        )
        eval_ds, eval_len = get_oxe_frame_dataset(
            split="val", dataset_ratio=0.1, shuffle=False, **ds_kwargs
        )
    else:
        ds_kwargs = dict(
            dataset_root=cfg.dataset.dataset_root,
            dataset_mix=mix_cfg if isinstance(mix_cfg, str) else list(mix_cfg),
            feature_models=names_wocls,
            feature_norm=feature_norm,
            stats_root=cfg.dataset.get("stats_root"),
            rank=process_index,
            world_size=process_count,
            seed=cfg.seed,
        )
        train_ds, train_len = get_image_video_dataset(
            split="train", dataset_ratio=cfg.dataset.dataset_ratio, shuffle=cfg.dataset.shuffle,
            **ds_kwargs,
        )
        eval_ds, eval_len = get_image_video_dataset(
            split="val", dataset_ratio=0.1, shuffle=False, **ds_kwargs
        )

    # global batch = per-host batch * host count; steps math mirrors
    # train_rvfm.py:294-301 with world_size == number of chips
    batch_size = int(cfg.training.batch_size)  # per chip
    # batch rows shard over the DATA axis only (model_axis shards params)
    global_batch = batch_size * n_data
    host_batch = global_batch // process_count
    train_epoch_steps = math.ceil(train_len / batch_size / n_data)
    # single host: ceil keeps the partial tail batch (an eval set smaller
    # than one batch must still evaluate). multi-host: floor — every host
    # must run the same jitted step count, and ceil would make exhausted
    # hosts re-feed early batches, biasing avg_eval_* toward them.
    if jax.process_count() > 1:
        eval_epoch_steps = max(eval_len // (batch_size * n_data), 1)
    else:
        eval_epoch_steps = math.ceil(eval_len / batch_size / n_data)
    if max_steps is not None:
        train_epoch_steps = min(train_epoch_steps, max_steps)
        eval_epoch_steps = min(eval_epoch_steps, max(max_steps // 4, 1))
    total_train_steps = train_epoch_steps * cfg.training.epochs
    warmup_steps = int(cfg.training.warm_up_steps_ratio * total_train_steps)

    lr = scaled_lr(
        float(cfg.training.base_lr), batch_size, n_data,
        int(cfg.training.base_batch_size), int(cfg.training.base_world_size),
    )
    schedule = build_lr_schedule(cfg, lr, total_train_steps, warmup_steps)
    # fast_math-class dtype levers (PERFORMANCE.md "numerics budget"):
    # loss_dtype=bfloat16 computes the per-teacher loss elementwise terms and
    # the dL/dpred cotangents in bf16 (f32 accumulation); moment_dtype
    # stores Adam moments bf16. Both default off (torch-exact parity).
    loss_dtype = (
        jnp.bfloat16
        if cfg.training.get("loss_dtype", "float32") == "bfloat16"
        else jnp.float32
    )
    moment_dtype = (
        jnp.bfloat16
        if cfg.training.get("moment_dtype", None) == "bfloat16"
        else None
    )
    tx = make_optimizer(
        schedule,
        weight_decay=float(cfg.training.weight_decay),
        betas=tuple(cfg.training.optimizer.get("betas", (0.9, 0.999))),
        eps=float(cfg.training.optimizer.get("eps", 1e-8)),
        translator_lr_factor=float(cfg.training.get("translator_lr_factor", 1.0)),
        moment_dtype=moment_dtype,
    )

    init_images = jnp.zeros((2, 224, 224, 3), jnp.uint8)
    params = model.init(jax.random.PRNGKey(cfg.seed), init_images)["params"]
    state = TrainState.create(params, tx)

    state_shardings = None
    params_sharding = None
    if n_model > 1:
        from theia_tpu.parallel.tp import tp_specs, train_state_shardings

        specs = tp_specs(state.params, n_model)
        state_shardings = train_state_shardings(mesh, tx, state.params, specs)
        params_sharding = state_shardings.params
        state = jax.tree.map(jax.device_put, state, state_shardings)
    else:
        state = jax.device_put(state, replicated(mesh))

    ckpt_dir = os.path.join(cfg.logging.model_path, cfg.logging.run_identifier_prefix)
    if resume:
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored

    train_step = make_train_step(
        model, tx,
        main_loss=cfg.training.main_loss,
        target_loss_weights=cfg.training.target_models.get("target_model_weights"),
        grad_clip=bool(cfg.training.grad_clip),
        grad_clip_norm=float(cfg.training.grad_clip_norm),
        grad_clip_norm_warmup=float(cfg.training.grad_clip_norm_warmup),
        warmup_steps=warmup_steps,
        freeze_translator=bool(cfg.training.freeze_translator),
        freeze_translator_start_step=int(
            cfg.training.freeze_translator_start_steps_ratio * total_train_steps
        ),
        mesh=mesh,
        target_stats=target_stats,
        state_shardings=state_shardings,
        loss_dtype=loss_dtype,
        # donate_state=false (production default, frame_level.yaml) trades
        # ~2x state memory for skipping donation's aliasing copies —
        # measured +0.7% at base (PERFORMANCE.md round 5, probe_donation.py)
        donate=bool(cfg.training.get("donate_state", True)),
        grad_allreduce_dtype=_parse_grad_allreduce_dtype(
            cfg.training.get("grad_allreduce_dtype", None)
        ),
    )
    eval_step = make_eval_step(
        model,
        main_loss=cfg.training.main_loss,
        target_loss_weights=cfg.training.target_models.get("target_model_weights"),
        mesh=mesh,
        target_stats=target_stats,
        params_sharding=params_sharding,
    )

    logger = MetricLogger(
        cfg.logging.log_path,
        cfg.logging.run_identifier_prefix,
        use_wandb=bool(cfg.logging.get("wandb", False)),
        use_tensorboard=bool(cfg.logging.get("tensorboard", False)),
        project=cfg.logging.project,
        config=cfg.to_dict(),
        enabled=is_main,
    )
    if is_main:
        print(to_yaml(cfg))

    # batch placement: on one process plain device_put suffices; on a pod
    # each host holds host_batch rows and the global [global_batch, ...]
    # arrays are assembled with jax.make_array_from_process_local_data —
    # using shard_batch there would silently shrink the global batch to one
    # host's rows and drop the rest of each host's loaded samples.
    if process_count > 1:
        place_batch = lambda tree: make_global_batch(mesh, tree)  # noqa: E731
    else:
        place_batch = lambda tree: shard_batch(mesh, tree)  # noqa: E731

    num_workers = resolve_num_workers(cfg)
    random_targets = int(cfg.training.get("random_target_models", -1))
    log_interval = int(cfg.logging.get("log_interval", 50))
    save_interval = int(cfg.logging.get("save_ckpt_interval", 20000))
    rng = random.Random(cfg.seed)

    steps = int(state.step)
    # preemption-safe auto-resume: a restored mid-epoch state fast-forwards
    # past the work already done — completed epochs are skipped and the
    # partial epoch runs only its remaining steps (the epoch's loader is
    # restarted from its seeded beginning rather than replayed to the kill
    # point; the reference has no resume at all, SURVEY.md §5)
    start_ep = min(steps // train_epoch_steps, int(cfg.training.epochs)) if train_epoch_steps else 0
    done_in_epoch = steps - start_ep * train_epoch_steps
    if steps and is_main:
        print(
            f"[theia_tpu] resuming at step {steps} "
            f"(epoch {start_ep}, {done_in_epoch} steps into it)"
        )
    summary: dict[str, Any] = {}
    ckpt_session = CheckpointSession(ckpt_dir)
    for ep in range(start_ep, int(cfg.training.epochs)):
        epoch_steps = train_epoch_steps - (done_in_epoch if ep == start_ep else 0)
        t_start = time.time()  # per-epoch, like images_seen below
        meters = create_meters(target_model_names)
        loader = get_frame_dataloader(
            train_ds,
            batch_size=host_batch,
            shuffle=cfg.dataset.shuffle,
            shuffle_buffer_size=cfg.dataset.shuffle_buffer_size,
            seed=cfg.seed + process_index * 100 + ep,
            num_workers=num_workers,
        )
        train_iter = iter(loader)
        # per-step metrics are accumulated ON DEVICE (scalar adds) and read
        # back once per log window, so avg_train_* are true per-step averages
        # (reference log_metrics semantics) with a single host sync
        window_sum: Optional[dict] = None
        window_steps = 0
        window_images = 0
        images_seen = 0
        for _ in range(epoch_steps):
            try:
                batch = next(train_iter)
            except StopIteration:
                train_iter = iter(loader)
                batch = next(train_iter)

            if random_targets > 0:
                chosen = rng.sample(target_model_names, min(2, len(target_model_names)))
                loss_masks = {
                    t: jnp.asarray(1.0 if t in chosen else 0.0) for t in target_model_names
                }
            else:
                loss_masks = None

            images = batch["image"]
            targets = _targets_from_batch(batch, target_model_names)
            images, targets = place_batch((images, targets))
            state, metrics = train_step(state, images, targets, loss_masks)
            steps += 1
            images_seen += global_batch
            window_sum = (
                metrics if window_sum is None else jax.tree.map(jnp.add, window_sum, metrics)
            )
            window_steps += 1
            window_images += images.shape[0]

            if steps % log_interval == 0:
                # single host readback for the whole window
                fetched = jax.device_get(
                    jax.tree.map(lambda x: x / window_steps, window_sum)
                )
                flat = update_meters_from_metrics(
                    meters, fetched, target_model_names, "train", window_images
                )
                flat["lr"] = float(schedule(steps))
                flat["images_per_sec"] = images_seen / max(time.time() - t_start, 1e-9)
                logger.log(flat, steps)
                summary["train"] = flat
                window_sum = None
                window_steps = 0
                window_images = 0

            if cfg.training.freeze_translator and steps == int(
                cfg.training.freeze_translator_start_steps_ratio * total_train_steps
            ):
                pass  # handled branch-free inside the jitted step

            if save_interval > 0 and steps % save_interval == 0:
                # async: stages to host and returns; the write overlaps the
                # next steps' compute. orbax coordinates across hosts —
                # every process must call save
                ckpt_session.save(state, steps)

        if window_sum is not None and window_steps > 0:
            # flush the partial tail window so the returned summary always
            # carries the last train-loss even on short runs (max_steps <
            # log_interval)
            fetched = jax.device_get(
                jax.tree.map(lambda x: x / window_steps, window_sum)
            )
            flat = update_meters_from_metrics(
                meters, fetched, target_model_names, "train", window_images
            )
            flat["lr"] = float(schedule(steps))
            logger.log(flat, steps)
            summary["train"] = flat
            window_sum = None
            window_steps = 0
            window_images = 0

        # ---- eval epoch (reference train_rvfm.py:159-201) ----
        # keep partial tail batches in eval (an eval set smaller than one
        # batch must still evaluate); the tail shape compiles once
        # multi-host: every process must execute the SAME number of jitted
        # eval steps or the emitted collectives deadlock — so tails are
        # dropped and exhausted hosts re-iterate to a fixed step count;
        # single host keeps tail batches (an eval set smaller than one batch
        # must still evaluate)
        eval_loader = get_frame_dataloader(
            eval_ds, batch_size=host_batch, shuffle=False, seed=cfg.seed,
            drop_last=process_count > 1,
        )
        eval_iter = iter(eval_loader)
        eval_sum = None
        eval_batches = 0
        eval_images = 0
        for _ in range(eval_epoch_steps):
            try:
                batch = next(eval_iter)
            except StopIteration:
                if process_count == 1:
                    break
                eval_iter = iter(eval_loader)
                try:
                    batch = next(eval_iter)
                except StopIteration:
                    raise RuntimeError(
                        "eval split yields no full host batch on this process; "
                        "reduce batch_size or add eval data"
                    ) from None
            images = batch["image"]
            targets = _targets_from_batch(batch, target_model_names)
            images, targets = place_batch((images, targets))
            em = eval_step(state.params, images, targets)
            # accumulate ON DEVICE; one readback per epoch (the reference
            # pays per-batch .item() syncs; logging.py:115-152)
            eval_sum = em if eval_sum is None else jax.tree.map(jnp.add, eval_sum, em)
            eval_batches += 1
            eval_images += images.shape[0]
        if eval_sum is not None:
            fetched = jax.device_get(jax.tree.map(lambda x: x / eval_batches, eval_sum))
            flat = update_meters_from_metrics(
                meters, fetched, target_model_names, "eval", eval_images
            )
            logger.log({k: v for k, v in flat.items() if k.startswith("avg_eval")}, steps)
            summary["eval"] = {k: v for k, v in flat.items() if "eval" in k}

        ckpt_session.save(state, steps, block=True)

    ckpt_session.close()
    logger.close()
    summary.update(step=steps, run=cfg.logging.run_identifier_prefix, ckpt_dir=ckpt_dir)
    return summary
