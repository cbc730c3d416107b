"""Small NHWC layer wrappers with exact torch-default semantics.

The reference's translator/adapter modules are plain torch modules
(reference: src/theia/models/adapter_heads.py), so weights use torch default
init (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))) and LayerNorm is the
plain torch one (eps=1e-5), including the LayerNorm over a full (C,H,W)
feature map with per-element affine (adapter_heads.py:306,318,330).

Parameters are stored in shapes that map 1:1 from torch state dicts:
  Conv2dTorch.kernel:          HWIO  == torch (O,I,kh,kw).transpose(2,3,1,0)
  ConvTranspose2dTorch.kernel: HWIO  == torch (I,O,kh,kw).transpose(2,3,0,1)
  LayerNormSpatial.weight/bias: torch (C,H,W) kept verbatim.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from theia_tpu.ops.convt import conv_transpose_2d

try:  # remat name tags (no-ops outside jax.checkpoint regions)
    from jax.ad_checkpoint import checkpoint_name as _ckpt_name
except ImportError:  # pragma: no cover
    _ckpt_name = lambda x, name: x

# LayerNormSpatial implementation:
#   "vpu"      — plain autodiff, jnp.mean stats (round-1/2 default)
#   "mxu"      — forward stats as ones-vector dots. Measured on v5e: 101.8 ms
#                vs 97.3 ms vpu (x^2 materialization loses); negative result.
#   "dots_vjp" — vpu forward stats + custom backward phrasing all four LN
#                gradient reductions as MXU dots (ops/ln_spatial.py)
LN_STATS_IMPL = "vpu"

# Accumulation dtype for the "vpu" stats reduces: "f32" (default, matches
# torch's f32 LayerNorm math to reduce-order) or "bf16" (VERDICT r3 #1b
# numerics-budget lever: mean/meansq accumulate in bf16 on bf16 inputs;
# var then forms in f32 from the rounded stats). Measured on v5e
# (benchmarks/probe_numerics_budget.py --ln round 4): NEUTRAL at both
# sizes — the stats reduces read the same bf16 bytes either way and the
# f32 accumulator converts fuse into the reduce, so there is no traffic
# to save; kept opt-in for the record.
LN_STATS_DTYPE = "f32"
from theia_tpu.ops.init import (
    torch_conv_init,
    torch_conv_transpose_init,
    torch_linear_bias_init,
    torch_linear_init,
)


class DenseTorch(nn.Module):
    """nn.Linear with torch default init; kernel stored (in, out).

    A 4D NHWC input runs as a 1x1 convolution instead of reshape+dot (the
    matmul is identical). Measured on v5e: routing the conv-ladder heads'
    final Linear through this path REGRESSED the tiny cddsv step 96.4 ->
    108.8 ms — the 1x1-conv backward lowering costs more than the
    [B,4096,C] layout copies it avoids — so the heads keep reshape+dot and
    this path stays for genuinely-4D callers only (negative result,
    PERFORMANCE.md)."""

    features: int
    in_features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    impl_4d: str = "conv"  # "conv" | "einsum" — how a 4D NHWC input is handled

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", torch_linear_init(), (self.in_features, self.features), jnp.float32
        )
        if x.ndim == 4 and self.impl_4d == "einsum":
            # dot_general directly on the conv-ladder map (no token reshape):
            # lets XLA keep the ladder's layout instead of inserting the
            # [B,HW,C] layout copies the round-2 trace flagged (~3.8 ms)
            y = jnp.einsum("bhwc,co->bhwo", x.astype(self.dtype), kernel.astype(self.dtype))
        elif x.ndim == 4:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.reshape(1, 1, self.in_features, self.features).astype(self.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_bias_init(self.in_features), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return _ckpt_name(y.astype(self.dtype), "conv_out")


class Conv2dTorch(nn.Module):
    """nn.Conv2d (NHWC) with torch default init and explicit int padding."""

    features: int
    in_features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_init(), (k, k, self.in_features, self.features), jnp.float32
        )
        fan_in = k * k * self.in_features
        bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,), jnp.float32)
        # no preferred_element_type: its VJP mixes f32 cotangents with the
        # low-precision kernel and conv requires matching dtypes; TPU bf16
        # convs accumulate in f32 on the MXU regardless
        from theia_tpu.ops.conv_grads import conv2d_nhwc

        # same forward custom-call; the backward picks MXU-dot weight-grads
        # for wide-channel kernels (see ops/conv_grads.py measurements)
        y = conv2d_nhwc(
            x.astype(self.dtype), kernel.astype(self.dtype), self.stride, self.padding
        )
        return _ckpt_name((y + bias.astype(self.dtype)).astype(self.dtype), "conv_out")


class ConvTranspose2dTorch(nn.Module):
    """nn.ConvTranspose2d (NHWC) with torch shape/init semantics."""

    features: int
    in_features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            torch_conv_transpose_init(),
            (k, k, self.in_features, self.features),
            jnp.float32,
        )
        # torch computes bias fan_in on the (I,O,kh,kw) weight: O*k*k
        fan_in = k * k * self.features
        bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,), jnp.float32)
        y = conv_transpose_2d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )
        return _ckpt_name((y + bias.astype(self.dtype)).astype(self.dtype), "conv_out")


class LayerNormTorch(nn.Module):
    """nn.LayerNorm over the trailing channel dim (eps=1e-5)."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


class LayerNormSpatial(nn.Module):
    """torch nn.LayerNorm((C,H,W)) applied to NHWC tensors.

    Normalizes over all of (H,W,C) per sample with a per-element affine of
    torch shape (C,H,W) (reference: adapter_heads.py:306,318,330 — the
    LayerNorm-over-[C,H,W] the survey flags as easy to get axis-wrong).
    """

    shape_chw: tuple[int, int, int]
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, h, w = self.shape_chw
        weight = self.param("weight", nn.initializers.ones, (c, h, w), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c, h, w), jnp.float32)
        if LN_STATS_IMPL == "pallas":
            # chunked Pallas backward (ops/ln_pallas.py): streams the maps at
            # HBM rate instead of autodiff's ~150 GB/s mega-fusions at base
            from theia_tpu.ops.ln_pallas import ln_spatial_pallas

            return ln_spatial_pallas(
                x,
                weight.transpose(1, 2, 0),
                bias.transpose(1, 2, 0),
                self.eps,
                self.dtype,
            )
        if LN_STATS_IMPL == "dots_vjp":
            # custom MXU backward for the four LN reductions
            # (autodiff's batch-dim affine grads ran at ~150 GB/s on the
            # batch-minor conv-ladder maps; see ops/ln_spatial.py)
            from theia_tpu.ops.ln_spatial import ln_spatial

            return ln_spatial(
                x,
                weight.transpose(1, 2, 0),
                bias.transpose(1, 2, 0),
                self.eps,
                dtype=self.dtype,
            )
        # stats accumulate in f32 (XLA fuses the convert into the reduce);
        # the elementwise normalize/affine stays in the compute dtype so the
        # big (B,H,W,C) map is never materialized in f32 — profiling showed
        # f32 LN intermediates + layout copies dominating the 64x64 heads
        if LN_STATS_IMPL == "mxu" and x.dtype == jnp.bfloat16:
            # per-sample stats as MXU dots with a ones vector instead of VPU
            # serial reductions (the profiled ~15 ms long-tail across the
            # per-sample stat sites); bf16 squares cost ~2^-8 relative on the
            # variance — training-path only (bf16), exact path below for f32
            b = x.shape[0]
            n = x.size // b
            x2d = x.reshape(b, n)
            ones = jnp.ones((n, 1), x.dtype)
            s1 = jnp.dot(x2d, ones, preferred_element_type=jnp.float32)
            s2 = jnp.dot(x2d * x2d, ones, preferred_element_type=jnp.float32)
            mean = (s1 / n).reshape(b, 1, 1, 1)
            mean_sq = (s2 / n).reshape(b, 1, 1, 1)
        elif LN_STATS_DTYPE == "bf16" and x.dtype == jnp.bfloat16:
            # numerics-budget lever: accumulate the stats in bf16 (the input
            # dtype); var still forms in f32 from the rounded stats
            mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
            mean_sq = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
        else:
            mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
            mean = _ckpt_name(mean, "ln_stats")
            mean_sq = _ckpt_name(mean_sq, "ln_stats")
        var = mean_sq - jnp.square(mean)
        scale = jax.lax.rsqrt(var + self.eps).astype(self.dtype)
        shift = mean.astype(self.dtype)
        y = (x.astype(self.dtype) - shift) * scale
        y = y * weight.transpose(1, 2, 0).astype(self.dtype) + bias.transpose(1, 2, 0).astype(self.dtype)
        return y
