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
from typing import Any, NamedTuple

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


class MaskedAdamWState(NamedTuple):
    """AdamW state with a PER-LEAF step count.

    torch.optim.AdamW keeps `state["step"]` per parameter and skips grad-less
    params entirely; `random_target_models` (reference train_rvfm.py:102-105)
    therefore leaves masked heads' params, moments AND step counts untouched.
    A per-leaf count reproduces that under a dynamic (traced) mask without
    recompilation. `sched_count` drives the LR schedule and increments every
    step like the reference's scheduler.step()."""

    sched_count: jax.Array
    count: Any  # pytree of int32 scalars, params structure
    mu: Any
    nu: Any


def make_optimizer(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    translator_lr_factor: float = 1.0,
    moment_dtype: Any = None,
) -> optax.GradientTransformationExtraArgs:
    """AdamW with the reference's decay mask and torch-exact dynamic masking.

    ``moment_dtype``: storage dtype for the Adam moments (None = param
    dtype, torch-exact). ``jnp.bfloat16`` halves the optimizer's HBM
    traffic and state footprint (mu/nu are 2 of the 4 f32 copies of every
    param the step streams); the update math still runs in the grad dtype
    (f32) — only the carried moments round. A fast_math-class lever inside
    the <1e-3 feature-parity budget (tests/test_train_step.py).

    ``tx.update(grads, state, params, mask=pytree_of_0or1_scalars)`` freezes
    masked leaves completely (no param motion, no moment decay, no per-leaf
    step advance) — torch semantics for grad-less / requires_grad=False
    params. Without ``mask`` it is plain AdamW (torch-exact, see
    tests/test_train_step.py::test_adamw_matches_torch). The optional
    translator LR factor is an update scale — exact for AdamW since the Adam
    term and the decoupled decay both scale linearly with lr
    (reference optimizers/utils.py:38-86)."""
    b1, b2 = betas

    def init(params: Any) -> MaskedAdamWState:
        moments = lambda p: jnp.zeros(p.shape, moment_dtype or p.dtype)
        return MaskedAdamWState(
            sched_count=jnp.zeros((), jnp.int32),
            count=jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params),
            mu=jax.tree.map(moments, params),
            nu=jax.tree.map(moments, params),
        )

    def update(grads: Any, state: MaskedAdamWState, params: Any = None, *, mask: Any = None):
        if params is None:
            raise ValueError("make_optimizer requires params for weight decay")
        lr = learning_rate(state.sched_count) if callable(learning_rate) else learning_rate
        decay = no_weight_decay_mask(params)
        if mask is None:
            mask = jax.tree.map(lambda _: 1.0, grads)

        flat_g, treedef = jax.tree_util.tree_flatten_with_path(grads)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_c = jax.tree_util.tree_leaves(state.count)
        flat_mu = jax.tree_util.tree_leaves(state.mu)
        flat_nu = jax.tree_util.tree_leaves(state.nu)
        flat_m = jax.tree_util.tree_leaves(mask)
        flat_d = jax.tree_util.tree_leaves(decay)

        new_c, new_mu, new_nu, upds = [], [], [], []
        for (path, g), p, c, mu, nu, m, dec in zip(
            flat_g, flat_p, flat_c, flat_mu, flat_nu, flat_m, flat_d
        ):
            m = jnp.asarray(m, g.dtype)
            c1 = c + jnp.asarray(m, jnp.int32)
            # moments may be stored narrower (moment_dtype); the step math
            # runs in the grad dtype and only the carried state rounds
            mu1 = m * (b1 * mu.astype(g.dtype) + (1.0 - b1) * g) + (1.0 - m) * mu.astype(g.dtype)
            nu1 = m * (b2 * nu.astype(g.dtype) + (1.0 - b2) * g * g) + (1.0 - m) * nu.astype(g.dtype)
            cf = jnp.asarray(c1, g.dtype)
            # guard c1==0 (never-updated leaf): bias denominators would be 0
            bc1 = jnp.where(c1 > 0, 1.0 - b1**cf, 1.0)
            bc2 = jnp.where(c1 > 0, 1.0 - b2**cf, 1.0)
            adam = (mu1 / bc1) / (jnp.sqrt(nu1 / bc2) + eps)
            u = -lr * m * (adam + (weight_decay * p if dec else 0.0))
            top = path[0].key if path and hasattr(path[0], "key") else ""
            if translator_lr_factor != 1.0 and top == "translator_module":
                u = u * translator_lr_factor
            new_c.append(c1)
            new_mu.append(mu1.astype(mu.dtype))
            new_nu.append(nu1.astype(nu.dtype))
            upds.append(u)

        unflatten = jax.tree_util.tree_structure(params).unflatten
        return treedef.unflatten([u for u in upds]), MaskedAdamWState(
            sched_count=state.sched_count + 1,
            count=unflatten(new_c),
            mu=unflatten(new_mu),
            nu=unflatten(new_nu),
        )

    return optax.GradientTransformationExtraArgs(init, update)


def clip_grad_norm(grads: Any, max_norm: jax.Array | float) -> Any:
    """torch clip_grad_norm_ semantics: scale = min(1, max_norm/(norm+1e-6))."""
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm
