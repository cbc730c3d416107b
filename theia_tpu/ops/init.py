"""Parameter initializers matching torch defaults and HF ViT init.

- HF ViT modules use trunc_normal(std=initializer_range, bounds ±2.0 absolute)
  for Linear/Conv weights, pos embeds and cls token; zero bias; LN ones/zeros
  (reference: src/theia/models/backbones.py:107-125).
- The translator/adapter modules are plain torch modules, so they get torch
  defaults: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for weights and
  U(±1/sqrt(fan_in)) for biases.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import random


def trunc_normal_init(std: float = 0.02, lower: float = -2.0, upper: float = 2.0):
    """torch nn.init.trunc_normal_ semantics: absolute truncation bounds.

    Note torch truncates at absolute values (default ±2.0), not ±2σ; at
    std=0.02 that is ±100σ, i.e. effectively an untruncated normal.
    """

    def init(key, shape, dtype=jnp.float32):
        a, b = lower / std, upper / std
        return std * random.truncated_normal(key, a, b, shape, dtype)

    return init


def _uniform_fan(bound_from_fan_in):
    def make(fan_in_fn):
        def init(key, shape, dtype=jnp.float32):
            fan_in = fan_in_fn(shape)
            bound = bound_from_fan_in(fan_in)
            return random.uniform(key, shape, dtype, -bound, bound)

        return init

    return make


def torch_linear_init():
    """torch nn.Linear weight default: kaiming_uniform(a=√5) == U(±1/√fan_in).

    For a flax Dense kernel of shape (in, out), fan_in = in.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int):
    """torch nn.Linear/Conv bias default: U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_init():
    """torch nn.Conv2d weight default for HWIO kernels: fan_in = kh*kw*in_ch."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_ch, _ = shape
        fan_in = kh * kw * in_ch
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_transpose_init():
    """torch nn.ConvTranspose2d weight default for HWIO kernels.

    torch computes fan_in on the (in_ch, out_ch, kh, kw) weight as
    weight.size(1) * kh * kw = out_ch*kh*kw (an oddity of _calculate_fan_in).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out_ch = shape
        fan_in = kh * kw * out_ch
        bound = 1.0 / math.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
