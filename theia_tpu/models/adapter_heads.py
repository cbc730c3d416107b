"""Adapter heads: map student tokens to each teacher's feature geometry.

NHWC re-design of the reference heads (reference:
src/theia/models/adapter_heads.py):
  - LinearAdapterHead   (:28-58)  — CLS-only targets, single Linear.
  - MLPAdapterHead      (:61-127) — nearest-resize to target HW, then MLP.
  - ConvAdapterHead     (:130-229) — conv/deconv ladders ending in a conv.
  - LightConvAdapterHead(:232-359) — production; ladders ending in a Linear.

All spatial ladders keep the reference's exact shape arithmetic
(14 -pad-> 16 -> 31 -> 64, 64 -> 32 -> 16, 14 -> 7) and torch LayerNorm over
the full (C,H,W) map. Submodule names encode the torch nn.Sequential indices
("adapter_1" == adapter[1]) so reference checkpoints convert mechanically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from theia_tpu.models.layers import (
    Conv2dTorch,
    ConvTranspose2dTorch,
    DenseTorch,
    LayerNormSpatial,
)
from theia_tpu.ops.image import interpolate_nearest

Size = tuple[int, ...]

# How the LightConv ladders apply their final Linear: "tokens" reshapes the
# map to [B,HW,C] first (reference order); "map_einsum" contracts channels on
# the 4D map and reshapes after — numerically identical, but avoids the
# [B,HW,C] layout copies XLA inserts between the conv ladder (batch-minor
# layouts) and the token-major dot (round-2 trace: ~3.8 ms/step).
HEAD_DENSE_IMPL = "tokens"

# Numerics-preserving internal padding of the 16->64 ladder's 31x31
# intermediate to 32x32 (the ladder analogue of vit.TOKEN_PAD_MULTIPLE;
# round-3 base trace shows the [.,31,31,.] LN-grad/convT co-fusions at
# 133-250 GB/s vs the ~819 GB/s roofline — the hypothesis was the odd 31
# spatial dim tiles badly). Measured NEGATIVE at both sizes
# (benchmarks/probe_ladder_pad.py A/B/A, 2026-08-20: base 141.6 -> 144.6 /
# 142.7 ms, tiny 89.3 -> 91.6 / 91.2 ms for pre_convt2 / full; brackets
# 0.06% / 0.3%): XLA's internal lane/sublane padding of the 31-dims is
# already cheaper than carrying explicit pads through the program. Kept
# opt-in; exactness bounded in tests/test_r5_levers.py. → don't-retry.
#   "none"       — reference geometry (default).
#   "pre_convt2" — zero-pad AFTER the 31x31 LayerNorm, so only the second
#                  deconv (and its VJP) runs at 32x32. Bitwise exact: the
#                  pad rows are zero, every extra MAC is a zero product, and
#                  output rows >=64 are sliced off (their cotangents are
#                  zero, so dW is untouched).
#   "full"       — zero-pad BEFORE the relu, so relu, the LayerNorm and the
#                  deconv all run at 32x32. The LN divides by the real count
#                  (961) and its padded affine is zero on pads, so pad
#                  outputs are exactly 0; stats match the 31x31 LN up to
#                  reduction order (f32 accumulation, ~1e-7 relative).
LADDER_PAD = "none"


class _LNSpatialMasked(nn.Module):
    """LayerNormSpatial((C, h, w)) evaluated on a zero-padded [B, hp, wp, C]
    map (LADDER_PAD="full"): the pads are exactly zero on input, so sums over
    the padded map equal sums over the real region; stats divide by the real
    count, and the affine weight/bias are zero-padded so pad outputs are
    exactly 0 ((0 - mean)*scale*0 + 0). Param tree identical to
    LayerNormSpatial((C, h, w)) — checkpoints convert unchanged."""

    shape_chw: tuple[int, int, int]
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, h, w = self.shape_chw
        hp, wp = x.shape[1], x.shape[2]
        weight = self.param("weight", nn.initializers.ones, (c, h, w), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c, h, w), jnp.float32)
        n = c * h * w
        s1 = jnp.sum(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        scale = jax.lax.rsqrt(var + self.eps).astype(self.dtype)
        shift = mean.astype(self.dtype)
        pad_hw = ((0, hp - h), (0, wp - w), (0, 0))
        w_p = jnp.pad(weight.transpose(1, 2, 0), pad_hw).astype(self.dtype)
        b_p = jnp.pad(bias.transpose(1, 2, 0), pad_hw).astype(self.dtype)
        return ((x.astype(self.dtype) - shift) * scale) * w_p + b_p


def _final_dense(x: jax.Array, c_t: int, hidden: int, dtype: Any, name: str) -> jax.Array:
    if HEAD_DENSE_IMPL == "map_einsum":
        y = DenseTorch(c_t, hidden, dtype=dtype, impl_4d="einsum", name=name)(x)
        return _to_tokens(y)
    return DenseTorch(c_t, hidden, dtype=dtype, name=name)(_to_tokens(x))


def _to_map(x: jax.Array, h: int, w: int) -> jax.Array:
    """[B, H*W, C] -> [B, H, W, C]."""
    b, hw, c = x.shape
    return x.reshape(b, h, w, c)


def _to_tokens(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H*W, C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class LinearAdapterHead(nn.Module):
    """CLS-token -> Linear; used for `<teacher>_cls` targets
    (reference: adapter_heads.py:28-58)."""

    source_size: Size
    target_size: Size
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, backbone_no_cls: bool = False) -> jax.Array:
        assert not backbone_no_cls, "LinearAdapterHead requires a CLS token"
        x = x[:, 0]
        return DenseTorch(
            self.target_size[0], self.source_size[0], dtype=self.dtype, name="adapter_0"
        )(x)


class MLPAdapterHead(nn.Module):
    """Nearest-resize to target HW, then an MLP over channels
    (reference: adapter_heads.py:61-127)."""

    source_size: Size
    target_size: Size
    num_layer: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, backbone_no_cls: bool = False) -> jax.Array:
        assert self.num_layer >= 1
        if not backbone_no_cls:
            x = x[:, 1:]
        c_s, h_s, w_s = self.source_size[0], self.source_size[1], self.source_size[2]
        c_t, h_t, w_t = self.target_size[0], self.target_size[1], self.target_size[2]
        if h_s != h_t:
            x = _to_tokens(interpolate_nearest(_to_map(x, h_s, w_s), h_t, w_t))
        if self.num_layer == 1:
            return DenseTorch(c_t, c_s, dtype=self.dtype, name="adapter_0")(x)
        hidden = c_s * 2
        x = DenseTorch(hidden, c_s, dtype=self.dtype, name="adapter_0")(x)
        idx = 1
        for _ in range(self.num_layer - 2):
            x = jax.nn.relu(x)
            idx += 1
            x = DenseTorch(hidden, hidden, dtype=self.dtype, name=f"adapter_{idx}")(x)
            idx += 1
        x = jax.nn.relu(x)
        idx += 1
        return DenseTorch(c_t, hidden, dtype=self.dtype, name=f"adapter_{idx}")(x)


class _PadTo16(nn.Module):
    """ConvTranspose2d(k=3, s=1) pad from (any<=14) to 16
    (reference: adapter_heads.py:279-289). torch Sequential index 1."""

    channels: int
    source_spatial: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return ConvTranspose2dTorch(
            self.channels,
            self.channels,
            kernel_size=3,
            stride=1,
            output_padding=14 - self.source_spatial,
            dtype=self.dtype,
            name="pad_1",
        )(x)


class ConvAdapterHead(nn.Module):
    """Conv ladder head ending in a conv (reference: adapter_heads.py:130-229)."""

    source_size: Size
    target_size: Size
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, backbone_no_cls: bool = False) -> jax.Array:
        if not backbone_no_cls:
            x = x[:, 1:]
        c_s, s_s = self.source_size[0], self.source_size[1]
        c_t, s_t = self.target_size[0], self.target_size[1]
        hidden = c_s * 2
        x = _to_map(x, s_s, self.source_size[2])
        if s_s < 12:
            raise NotImplementedError("feature spatial size smaller than 12x12 is not supported.")
        elif s_s < 16:
            x = _PadTo16(c_s, s_s, dtype=self.dtype, name="pad")(x)
            s_s = 16
        elif s_s not in (16, 64):
            raise NotImplementedError(
                "feature spatial size (>=16x16) other than 16x16 and 64x64 is not supported."
            )

        ln = lambda c, s, name: LayerNormSpatial((c, s, s), dtype=self.dtype, name=name)
        if s_s < s_t:  # 16 -> 64
            x = ln(c_s, 16, "adapter_0")(x)
            x = ConvTranspose2dTorch(hidden, c_s, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_1")(x)  # 31
            x = jax.nn.relu(x)
            x = ln(hidden, 31, "adapter_3")(x)
            x = ConvTranspose2dTorch(hidden, hidden, 3, stride=2, output_padding=1, dtype=self.dtype, name="adapter_4")(x)  # 64
            x = jax.nn.relu(x)
            x = ln(hidden, 64, "adapter_6")(x)
            x = ConvTranspose2dTorch(c_t, hidden, 3, stride=1, padding=1, dtype=self.dtype, name="adapter_7")(x)  # 64
        elif s_s == s_t:  # 16 -> 16
            x = ln(c_s, s_s, "adapter_0")(x)
            x = Conv2dTorch(hidden, c_s, 3, padding=1, dtype=self.dtype, name="adapter_1")(x)
            x = jax.nn.relu(x)
            x = ln(hidden, s_s, "adapter_3")(x)
            x = Conv2dTorch(hidden, hidden, 3, padding=1, dtype=self.dtype, name="adapter_4")(x)
            x = jax.nn.relu(x)
            x = ln(hidden, s_s, "adapter_6")(x)
            x = Conv2dTorch(c_t, hidden, 3, padding=1, dtype=self.dtype, name="adapter_7")(x)
        else:  # 64 -> 16
            x = ln(c_s, 64, "adapter_0")(x)
            x = Conv2dTorch(hidden, c_s, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_1")(x)  # 32
            x = jax.nn.relu(x)
            x = ln(hidden, 32, "adapter_3")(x)
            x = Conv2dTorch(hidden, hidden, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_4")(x)  # 16
            x = jax.nn.relu(x)
            x = ln(hidden, 16, "adapter_6")(x)
            x = Conv2dTorch(c_t, hidden, 3, padding=1, dtype=self.dtype, name="adapter_7")(x)
        return _to_tokens(x)


class LightConvAdapterHead(nn.Module):
    """Production head: conv/deconv ladder ending in a Linear
    (reference: adapter_heads.py:232-359)."""

    source_size: Size
    target_size: Size
    hidden_size_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, backbone_no_cls: bool = False) -> jax.Array:
        if self.source_size[1] != self.source_size[2] or self.target_size[1] != self.target_size[2]:
            raise NotImplementedError("non-square feature maps are not supported.")
        if not backbone_no_cls:
            x = x[:, 1:]
        c_s, s_s = self.source_size[0], self.source_size[1]
        c_t, s_t = self.target_size[0], self.target_size[1]
        hidden = int(c_s * self.hidden_size_factor)
        x = _to_map(x, s_s, self.source_size[2])

        if s_s < 12:
            raise NotImplementedError("feature spatial size smaller than 12x12 is not supported.")
        elif s_s < 16 and s_t >= 16:
            x = _PadTo16(c_s, s_s, dtype=self.dtype, name="pad")(x)
            s_s = 16
        elif (s_s in (16, 64)) or (s_s == 14 and s_t == 14) or s_t < 14:
            pass
        else:
            raise NotImplementedError(
                "feature spatial size larger than 16x16 (other than 64x64) is not supported."
            )

        ln = lambda c, s, name: LayerNormSpatial((c, s, s), dtype=self.dtype, name=name)
        if s_s == 16 and s_t == 64:
            x = ln(c_s, 16, "adapter_0")(x)
            x = ConvTranspose2dTorch(hidden, c_s, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_1")(x)  # 31
            pad32 = ((0, 0), (0, 1), (0, 1), (0, 0))
            if LADDER_PAD == "full":
                x = jnp.pad(x, pad32)  # zero pads survive the relu
            x = jax.nn.relu(x)
            if LADDER_PAD == "full":
                x = _LNSpatialMasked((hidden, 31, 31), dtype=self.dtype, name="adapter_3")(x)
            else:
                x = ln(hidden, 31, "adapter_3")(x)
                if LADDER_PAD == "pre_convt2":
                    x = jnp.pad(x, pad32)  # bitwise: pads only add 0-products
            x = ConvTranspose2dTorch(hidden, hidden, 3, stride=2, output_padding=1, dtype=self.dtype, name="adapter_4")(x)  # 64 (66 when padded)
            if LADDER_PAD != "none":
                x = x[:, :64, :64]
            x = jax.nn.relu(x)
            x = ln(hidden, 64, "adapter_6")(x)
            x = _final_dense(x, c_t, hidden, self.dtype, "adapter_8")
        elif s_s == s_t:
            x = ln(c_s, s_s, "adapter_0")(x)
            x = Conv2dTorch(hidden, c_s, 3, padding=1, dtype=self.dtype, name="adapter_1")(x)
            x = jax.nn.relu(x)
            x = ln(hidden, s_s, "adapter_3")(x)
            x = Conv2dTorch(hidden, hidden, 3, padding=1, dtype=self.dtype, name="adapter_4")(x)
            x = jax.nn.relu(x)
            x = ln(hidden, s_s, "adapter_6")(x)
            x = _final_dense(x, c_t, hidden, self.dtype, "adapter_8")
        elif s_s == 64 and s_t == 16:
            x = ln(c_s, 64, "adapter_0")(x)
            x = Conv2dTorch(hidden, c_s, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_1")(x)  # 32
            x = jax.nn.relu(x)
            x = ln(hidden, 32, "adapter_3")(x)
            x = Conv2dTorch(hidden, hidden, 3, stride=2, padding=1, dtype=self.dtype, name="adapter_4")(x)  # 16
            x = jax.nn.relu(x)
            x = ln(hidden, 16, "adapter_6")(x)
            x = _final_dense(x, c_t, hidden, self.dtype, "adapter_8")
        elif s_t == 7:
            x = ln(c_s, s_s, "adapter_0")(x)
            x = Conv2dTorch(hidden, c_s, 4, stride=2, padding=1, dtype=self.dtype, name="adapter_1")(x)  # 14 -> 7
            x = jax.nn.relu(x)
            x = ln(hidden, 7, "adapter_3")(x)
            x = _final_dense(x, c_t, hidden, self.dtype, "adapter_5")
        else:
            # the reference forgets to raise here (adapter_heads.py:350) and
            # crashes later; we fail loudly
            raise NotImplementedError(f"{self.source_size} to {self.target_size} is not supported.")
        return x
