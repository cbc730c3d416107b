"""Decoding orchestrator: predicted features -> teacher-native visualizations
(reference: src/theia/decoding/decode.py:25-198)."""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

from theia_tpu.decoding.depth_anything import decode_depth_anything
from theia_tpu.decoding.dinov2 import decode_dinov2
from theia_tpu.decoding.sam import decode_sam

DINO = "facebook/dinov2-large"
SAM = "facebook/sam-vit-huge"
DEPTH = "LiheYoung/depth-anything-large-hf"


def denormalize_feature(
    x: np.ndarray, mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None
) -> np.ndarray:
    """x * std + mean (reference decode.py:25-44)."""
    if mean is None and std is None:
        return x
    if mean is None:
        return x * std
    if std is None:
        return x + mean
    return x * std + mean


def load_feature_stats(
    feature_models: list[str], stat_file_root: str
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """fp32 per-channel mean/std ("var") vectors (reference decode.py:47-67)."""
    means, stds = {}, {}
    for model in feature_models:
        name = model.replace("/", "_")
        means[model] = np.load(os.path.join(stat_file_root, f"imagenet_mean_{name}.npy"))
        stds[model] = np.load(os.path.join(stat_file_root, f"imagenet_var_{name}.npy"))
    return means, stds


def run_gt_teachers(
    images: np.ndarray,
    hf_models: Optional[dict[str, Any]] = None,
    teacher_params: Optional[dict[str, Any]] = None,
    batch_size: int = 8,
) -> dict[str, np.ndarray]:
    """Run the ported JAX teachers (foundation/) on the input frames and
    return ground-truth features in the decoder layout [B, H*W, C] — the
    TPU-native equivalent of the reference running the torch teachers inline
    in decode_everything(gt=True) (reference decode.py:126-176).

    Weights per teacher come from ``hf_models`` (HF torch modules, converted
    on the fly) or ``teacher_params`` (already-converted JAX param trees —
    e.g. from foundation extraction checkpoints or tests' synthetic weights).
    """
    import jax
    import jax.numpy as jnp

    from theia_tpu.foundation.extraction import get_model
    from theia_tpu.ops.image import interpolate_nearest

    hf_models = hf_models or {}
    teacher_params = teacher_params or {}
    out: dict[str, np.ndarray] = {}
    for name in (DINO, SAM, DEPTH):
        module, params, feature_fn = get_model(name, hf_models.get(name))
        if params is None:
            params = teacher_params.get(name)
        if params is None:
            raise ValueError(
                f"no weights for GT teacher {name}: pass hf_models={{name: "
                "HF module}} or teacher_params={name: JAX params}"
            )
        fwd = jax.jit(lambda p, x, m=module, f=feature_fn: f(m, p, x))
        feats = []
        for i in range(0, len(images), batch_size):
            r = fwd(params, jnp.asarray(images[i : i + batch_size]))
            if name == DINO:
                visual = r[1]  # [B, C, 16, 16]
                f = jnp.transpose(visual.reshape(*visual.shape[:2], -1), (0, 2, 1))
            elif name == SAM:
                emb = r[0]  # [B, 256, 64, 64]
                f = jnp.transpose(emb.reshape(*emb.shape[:2], -1), (0, 2, 1))
            else:  # depth head feature [B, 32, 518, 518] -> 64x64 (extraction layout)
                h = interpolate_nearest(jnp.transpose(r, (0, 2, 3, 1)), 64, 64)
                f = h.reshape(h.shape[0], 64 * 64, h.shape[-1])
            feats.append(np.asarray(jax.device_get(f), np.float32))
        out[name] = np.concatenate(feats)
    return out


def decode_everything(
    theia_forward,
    feature_means: dict[str, np.ndarray],
    feature_vars: dict[str, np.ndarray],
    images: np.ndarray,
    mask_generator,
    depth_anything_decoder: dict,
    pred_iou_thresh: float = 0.9,
    stability_score_thresh: float = 0.9,
    gt_features: Optional[dict[str, np.ndarray]] = None,
    gt: bool = False,
    gt_teacher_models: Optional[dict[str, Any]] = None,
    gt_teacher_params: Optional[dict[str, Any]] = None,
    pca=None,
    **kwargs: Any,
) -> tuple[list[np.ndarray], Optional[list[np.ndarray]]]:
    """Run theia over images, denormalize, decode all teacher columns, and
    hstack [input | dinov2-pca | sam-masks | depth] panels per image
    (reference decode.py:70-198).

    Args:
        theia_forward: callable uint8 [B,H,W,3] -> dict[teacher, np features].
        images: uint8 [B, 224, 224, 3].
        gt_features: optional real-teacher features (same dict layout) to
            render a ground-truth row.
        gt: run the ported JAX teachers on ``images`` to produce the
            ground-truth row inline (reference decode.py:126-176); weights
            come from ``gt_teacher_models`` (HF torch modules) or
            ``gt_teacher_params`` (JAX param trees). Ignored when
            ``gt_features`` is already supplied.
    """
    if gt and gt_features is None:
        gt_features = run_gt_teachers(
            images, hf_models=gt_teacher_models, teacher_params=gt_teacher_params
        )
    features = {k: np.asarray(v) for k, v in theia_forward(images).items()}
    for m in features:
        features[m] = denormalize_feature(
            features[m].astype(np.float32), feature_means[m], feature_vars[m]
        )

    gt_decode_results = None
    if gt_features is not None:
        gt_dino, pca = decode_dinov2(gt_features[DINO], pca=pca)
        gt_sam = decode_sam(
            gt_features[SAM], list(images), mask_generator,
            pred_iou_thresh=0.9, stability_score_thresh=0.9,
        )
        gt_depth = decode_depth_anything(gt_features[DEPTH], depth_anything_decoder)
        gt_decode_results = [
            np.hstack([images[i].astype(np.float32) / 255.0, gt_dino[i], gt_sam[i], gt_depth[i]])
            for i in range(len(images))
        ]

    dino_dec, _ = decode_dinov2(features[DINO], pca=pca)
    try:
        sam_dec = decode_sam(
            features[SAM], list(images), mask_generator,
            pred_iou_thresh=pred_iou_thresh, stability_score_thresh=stability_score_thresh,
        )
    except IndexError:
        sam_dec = np.zeros_like(dino_dec)
    depth_dec = decode_depth_anything(features[DEPTH], depth_anything_decoder)

    theia_decode_results = [
        np.hstack([images[i].astype(np.float32) / 255.0, dino_dec[i], sam_dec[i], depth_dec[i]])
        for i in range(len(images))
    ]
    return theia_decode_results, gt_decode_results
