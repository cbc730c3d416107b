"""Optimizer and LR schedules matching the reference recipe.

- AdamW (betas 0.9/0.999) over two param groups: no-decay for ndim<=1 params
  and biases, decay (wd=0.01) otherwise
  (reference: src/theia/optimizers/utils.py:8-35;
  configs/training/frame_level.yaml:15-21).
- LR scaling: lr = base_lr * (batch*world)/(base_batch*base_world)
  (reference: src/theia/scripts/train/train_rvfm.py:299-301).
- Schedules: linear warmup (start factor 1e-2) -> constant, or -> cosine
  annealing warm restarts (T_mult=1)
  (reference: src/theia/lr_schedulers/lr_schedulers.py:8-77).
- Optional separate translator LR via update scaling
  (reference: optimizers/utils.py:38-86, translator_lr_factor).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def scaled_lr(base_lr: float, batch_size: int, world_size: int,
              base_batch_size: int = 64, base_world_size: int = 8) -> float:
    return base_lr * (batch_size * world_size) / (base_batch_size * base_world_size)


def constant_with_warmup(
    lr: float, warm_up_steps: int, warm_up_lr_start_factor: float = 1e-2
) -> optax.Schedule:
    """Linear warmup to lr, then constant."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(step / jnp.maximum(warm_up_steps, 1), 1.0)
        factor = warm_up_lr_start_factor + (1.0 - warm_up_lr_start_factor) * frac
        return lr * jnp.where(step < warm_up_steps, factor, 1.0)

    return schedule


def cosine_restarts_with_warmup(
    lr: float,
    warm_up_steps: int,
    cos_lrs_T_0: int,
    warm_up_lr_start_factor: float = 1e-2,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """Linear warmup, then CosineAnnealingWarmRestarts(T_0, T_mult=1)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.minimum(step / jnp.maximum(warm_up_steps, 1), 1.0)
        warm = lr * (warm_up_lr_start_factor + (1.0 - warm_up_lr_start_factor) * frac)
        t_cur = jnp.mod(step - warm_up_steps, cos_lrs_T_0)
        cos = eta_min + (lr - eta_min) * (1.0 + jnp.cos(math.pi * t_cur / cos_lrs_T_0)) / 2.0
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def no_weight_decay_mask(params: Any) -> Any:
    """True where weight decay applies: ndim > 1 and leaf name != 'bias'
    (reference optimizers/utils.py:29-33: no_decay if ndim<=1 or *.bias;
    note (C,H,W) LayerNorm weights DO get decay there, matched here)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decay(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf.ndim > 1 and not name.endswith("bias")

    mask = {tuple(p): decay(p, l) for p, l in flat}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [mask[tuple(p)] for p, l in flat]
    )


def make_optimizer(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    translator_lr_factor: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with the reference's decay mask; optional per-subtree LR factor
    for the translator (applied as an update scale — exact for AdamW since
    both the Adam term and the decoupled decay scale linearly with lr)."""
    tx = optax.adamw(
        learning_rate, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay, mask=no_weight_decay_mask,
    )
    if translator_lr_factor != 1.0:
        def scale_translator(updates):
            def scale(path, u):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                return u * translator_lr_factor if top == "translator_module" else u
            return jax.tree_util.tree_map_with_path(scale, updates)

        tx = optax.chain(tx, optax.stateless(lambda u, p=None: scale_translator(u)))
    return tx


def clip_grad_norm(grads: Any, max_norm: jax.Array | float) -> Any:
    """torch clip_grad_norm_ semantics: scale = min(1, max_norm/(norm+1e-6))."""
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm
