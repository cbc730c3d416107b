"""Seeding discipline (reference: src/theia/utils/seed.py:14-48).

Seeds python/numpy (and torch when present, for host-side teacher
extraction) and returns a jax.random.PRNGKey for on-device randomness.
"""

from __future__ import annotations

import os
import random
from typing import Any, Optional

import numpy as np

MAX_SEED = np.iinfo(np.uint32).max
MIN_SEED = np.iinfo(np.uint32).min


def seed_everything(seed: Optional[Any] = None):
    if seed is None:
        env_seed = os.environ.get("PL_GLOBAL_SEED")
        try:
            seed = int(env_seed) if env_seed is not None else 0
        except ValueError:
            seed = 0
    elif not isinstance(seed, int):
        seed = int(seed)
    if not (MIN_SEED <= seed <= MAX_SEED):
        seed = 0

    os.environ["PL_GLOBAL_SEED"] = str(seed)
    os.environ["PYTHON_SEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass

    import jax

    return seed, jax.random.PRNGKey(seed)
