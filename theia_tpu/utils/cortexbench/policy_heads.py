"""CortexBench policy heads in flax (reference:
src/theia/utils/cortexbench/policy_heads.py:16-240).

The reference heads subclass mjrl's BatchNormMLP (an external dependency
there too, not installed by default). These are standalone equivalents with
the same geometry: a conv neck over the [C*T, 14, 14] stacked features
(14->7->3->1 for ConvBatchNormMLP, 14->7->3 for the lighter ConvPolicyHead)
feeding an MLP gaussian-action head with a learnable log_std.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from theia_tpu.models.layers import Conv2dTorch, DenseTorch, LayerNormSpatial, LayerNormTorch


def _act(name: str):
    return jax.nn.relu if name == "relu" else jnp.tanh


class ConvBatchNormMLP(nn.Module):
    """Conv neck (C*T,14,14)->256->flatten + MLP head, gaussian action
    (reference policy_heads.py:16-176)."""

    embedding_dim: tuple[int, int, int]  # (C, H, W)
    proprio_dim: int
    history_window: int
    action_dim: int
    hidden_sizes: Sequence[int] = (64, 64)
    nonlinearity: str = "relu"
    min_log_std: float = -3.0
    init_log_std: float = 0.0

    @nn.compact
    def __call__(self, observation: jax.Array) -> jax.Array:
        """observation: [B, T*H*W*C (+proprio)] -> mean action [B, A]."""
        act = _act(self.nonlinearity)
        c, h, w = self.embedding_dim
        t = self.history_window
        if self.proprio_dim > 0:
            emb, proprio = observation[..., : -self.proprio_dim], observation[..., -self.proprio_dim :]
        else:
            emb, proprio = observation, None
        b = emb.shape[0]
        # b (t h w c) -> b h w (c t)
        emb = emb.reshape(b, t, h, w, c).transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * t)

        x = Conv2dTorch(256, c * t, 4, stride=2, padding=1, name="neck_0")(emb)  # 14 -> 7
        x = LayerNormSpatial((256, 7, 7), name="neck_1")(x)
        x = act(x)
        x = Conv2dTorch(256, 256, 3, stride=2, name="neck_3")(x)  # 7 -> 3
        x = LayerNormSpatial((256, 3, 3), name="neck_4")(x)
        x = act(x)
        x = Conv2dTorch(256, 256, 3, stride=1, name="neck_6")(x)  # 3 -> 1
        x = LayerNormSpatial((256, 1, 1), name="neck_7")(x)
        x = act(x)
        x = x.reshape(b, -1)
        if proprio is not None:
            x = jnp.concatenate([x, proprio], axis=1)

        in_dim = 256 + self.proprio_dim
        for i, hdim in enumerate(self.hidden_sizes):
            x = DenseTorch(hdim, in_dim, name=f"head_{i}")(x)
            x = act(x)
            in_dim = hdim
        return DenseTorch(self.action_dim, in_dim, name="head_out")(x)

    def log_std(self) -> jax.Array:
        p = self.param("log_std", nn.initializers.constant(self.init_log_std), (self.action_dim,))
        return jnp.maximum(p, self.min_log_std)


def get_action(apply_fn, params, observation: np.ndarray, rng: np.random.RandomState,
               log_std: float = 0.0) -> tuple[np.ndarray, dict]:
    """Stochastic rollout action (reference :148-162)."""
    mean = np.asarray(apply_fn(params, jnp.asarray(observation[None], jnp.float32))).ravel()
    noise = np.exp(log_std) * rng.randn(mean.shape[0])
    action = mean + noise
    return action, {"mean": mean, "log_std": log_std, "evaluation": mean}


def get_action_deterministic(apply_fn, params, observation: np.ndarray) -> tuple[np.ndarray, dict]:
    """Deterministic rollout action (reference :164-176)."""
    action = np.asarray(apply_fn(params, jnp.asarray(observation[None], jnp.float32))).ravel()
    return action, {"mean": action, "log_std": 0, "evaluation": action}


class ConvPolicyHead(nn.Module):
    """Smaller neck/head variant (reference policy_heads.py:179-240):
    conv 14->7->3 with 60 channels, MLP 60*9(+proprio) -> 256 -> A."""

    embedding_dim: tuple[int, int, int]
    proprio_dim: int
    history_window: int
    action_dim: int
    nonlinearity: str = "relu"

    @nn.compact
    def __call__(self, observation: jax.Array) -> jax.Array:
        act = _act(self.nonlinearity)
        c, h, w = self.embedding_dim
        t = self.history_window
        if self.proprio_dim > 0:
            emb, proprio = observation[..., : -self.proprio_dim], observation[..., -self.proprio_dim :]
        else:
            emb, proprio = observation, None
        b = emb.shape[0]
        emb = emb.reshape(b, t, h, w, c).transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * t)

        x = Conv2dTorch(60, c * t, 4, stride=2, padding=1, name="neck_0")(emb)
        x = LayerNormSpatial((60, 7, 7), name="neck_1")(x)
        x = act(x)
        x = Conv2dTorch(60, 60, 3, stride=2, name="neck_3")(x)
        x = LayerNormSpatial((60, 3, 3), name="neck_4")(x)
        x = act(x)
        x = x.reshape(b, -1)
        if proprio is not None:
            x = jnp.concatenate([x, proprio], axis=1)
        in_dim = 60 * 9 + self.proprio_dim
        x = DenseTorch(256, in_dim, name="head_0")(x)
        x = LayerNormTorch(256, name="head_1")(x)
        x = act(x)
        return DenseTorch(self.action_dim, 256, name="head_3")(x)
