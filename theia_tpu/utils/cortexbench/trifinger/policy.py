"""TriFinger deterministic policy (reference:
src/theia/utils/cortexbench/trifinger/policy.py:15-123) in flax."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from theia_tpu.models.layers import Conv2dTorch, DenseTorch


def _act(name: str):
    return jax.nn.relu if name == "relu" else jnp.tanh


class ConvBatchNormMLPDeterministicPolicy(nn.Module):
    """Conv neck (14->7->3->1) + 2-hidden-layer MLP, deterministic action."""

    in_dim: tuple[int, ...]  # (C, H, W) of the visual feature
    extra_dim: int
    out_dim: int
    max_a: Optional[float] = None
    hidden_size: int = 256
    nonlinearity: str = "relu"

    @nn.compact
    def __call__(self, state: jax.Array) -> jax.Array:
        act = _act(self.nonlinearity)
        c = self.in_dim[0]
        if self.extra_dim > 0:
            visual, extra = state[..., : -self.extra_dim], state[..., -self.extra_dim :]
        else:
            visual, extra = state, None
        b = visual.shape[0]
        # b (h w c) -> b h w c with h=w=14 (reference :31)
        x = visual.reshape(b, 14, 14, c)
        x = Conv2dTorch(256, c, 4, stride=2, padding=1, name="neck_1")(x)  # 7
        x = act(x)
        x = Conv2dTorch(256, 256, 3, stride=2, name="neck_3")(x)  # 3
        x = act(x)
        x = Conv2dTorch(256, 256, 3, stride=1, name="neck_5")(x)  # 1
        x = act(x)
        x = x.reshape(b, -1)
        if extra is not None:
            x = jnp.concatenate([x, extra], axis=1)
        x = DenseTorch(self.hidden_size, 256 + self.extra_dim, name="policy_0")(x)
        x = act(x)
        x = DenseTorch(self.hidden_size, self.hidden_size, name="policy_2")(x)
        x = act(x)
        return DenseTorch(self.out_dim, self.hidden_size, name="policy_4")(x)

    def clip_action(self, a: jax.Array) -> jax.Array:
        if self.max_a is None:
            return a
        return jnp.clip(a, -self.max_a, self.max_a)

    def scale_to_range(self, a: jax.Array) -> jax.Array:
        return a


def construct_policy(
    type: str,
    task_state_type: str,
    train_ft_state_shape: int,
    pretrained_dim: tuple[int, ...],
    task_goal_type: str,
    out_dim: int,
    max_a: Any = None,
    hidden_size: int = 256,
    nonlinearity: str = "relu",
    **kwargs: Any,
) -> ConvBatchNormMLPDeterministicPolicy:
    """Factory matching reference construct_policy (:80-123): goal/state
    conditioning adjusts input channel/extra dims."""
    in_dim = pretrained_dim
    extra_dim = 0
    if task_state_type == "obj":
        extra_dim += 0
    elif task_state_type in ("ftpos_obj", "ftpos"):
        extra_dim += train_ft_state_shape
    else:
        raise NameError("Invalid state_type")

    if task_goal_type == "goal_none":
        in_dim = pretrained_dim
    elif task_goal_type == "goal_cond":
        in_dim = (pretrained_dim[0] * 2, *pretrained_dim[1:])
    elif task_goal_type == "goal_o_pos":
        extra_dim += 3
    else:
        raise NameError("Invalid goal_type")

    if type == "ConvBatchNormMLP":
        return ConvBatchNormMLPDeterministicPolicy(
            in_dim=in_dim, extra_dim=extra_dim, out_dim=out_dim,
            max_a=max_a, hidden_size=hidden_size, nonlinearity=nonlinearity,
        )
    raise NotImplementedError(f"Policy network {type} is not supported.")
