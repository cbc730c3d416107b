"""Activation registry (reference: src/theia/models/activations.py:6-24)."""

from __future__ import annotations

from typing import Callable

import jax


def get_activation_fn(activation: str) -> Callable[[jax.Array], jax.Array]:
    """Return the named activation function as a pure jnp callable."""
    import jax.numpy as jnp

    table = {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "tanh": jnp.tanh,
        "leaky_relu": jax.nn.leaky_relu,
    }
    if activation not in table:
        raise ValueError(f"{activation} is not defined in theia_tpu.models.activations")
    return table[activation]
