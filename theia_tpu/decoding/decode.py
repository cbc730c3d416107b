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
            render a ground-truth row (the reference runs the real teachers
            inline; here they are supplied by the caller/extraction path).
    """
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
