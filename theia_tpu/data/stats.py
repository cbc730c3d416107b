"""Teacher-feature statistics: load and normalize.

Reference semantics: channel-wise mean and std (stored under the historical
name "var") computed over ImageNet, stored as fp32 npy vectors; features are
normalized (x - mean) / std in bf16
(reference: src/theia/dataset/data_utils.py:342-380;
scripts/preprocessing/calc_feature_mean.py:41-91; feature_stats/*.npy).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:  # ml_dtypes ships with jax; used for bf16 numpy arrays host-side
    import ml_dtypes

    BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    BFLOAT16 = np.dtype(np.float32)


def load_feature_stats(
    stats_root: str, feature_models: list[str], dtype: np.dtype = BFLOAT16
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Load imagenet_{mean,var}_<model>.npy per model (data_utils.py:358-380)."""
    means: dict[str, np.ndarray] = {}
    stds: dict[str, np.ndarray] = {}
    for model in feature_models:
        name = model.replace("/", "_")
        means[model] = np.load(os.path.join(stats_root, f"imagenet_mean_{name}.npy")).astype(dtype)
        stds[model] = np.load(os.path.join(stats_root, f"imagenet_var_{name}.npy")).astype(dtype)
    return means, stds


def normalize_feature(
    x: np.ndarray, mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None
) -> np.ndarray:
    """(x - mean) / std; identity when stats are missing (data_utils.py:342-355)."""
    if mean is None or std is None:
        return x
    return ((x - mean) / std).astype(x.dtype)


def denormalize_feature(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """Inverse, used by the decoding pipeline (decoding/decode.py:25-44)."""
    return (x * std + mean).astype(x.dtype)
