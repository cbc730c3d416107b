"""Automatic-mask-generation primitives (host-side numpy).

Native implementations of the AMG toolbox the reference gets from HF's
MaskGenerationPipeline / SamImageProcessor (reference:
src/theia/decoding/sam.py:15-106 via transformers' image_processing_sam):
point grids, multi-layer crop boxes, mask→box conversion, uncompressed
pycocotools-style RLE, crop-edge filtering, stability scores, and greedy
box-NMS. Semantics are pinned to the HF utilities by unit tests
(tests/test_sam_amg.py compares each function against transformers').

One deliberate divergence, documented here: for crop layers > 0 the HF
pipeline feeds every crop's point grid through a single forward as
"points per mask" and filters all masks with the FIRST crop box only —
with injected embeddings (the reference's decode path) that mishandles
crops. This module implements the original SAM AMG semantics instead:
per-crop decode, boxes offset to absolute coordinates, edge filtering
against each crop box, and cross-crop NMS.
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced [0,1]^2 grid, x-major rows (HF _build_point_grid)."""
    offset = 1.0 / (2 * n_per_side)
    side = np.linspace(offset, 1.0 - offset, n_per_side)
    xs = np.tile(side[None, :], (n_per_side, 1))
    ys = np.tile(side[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def normalize_coordinates(
    target_size: int, coords: np.ndarray, original_size: tuple[int, int]
) -> np.ndarray:
    """Scale (x, y) points from original-image coords to the processed
    longest-edge=target_size frame (HF _normalize_coordinates)."""
    old_h, old_w = original_size
    scale = target_size / max(old_h, old_w)
    new_h, new_w = int(old_h * scale + 0.5), int(old_w * scale + 0.5)
    out = coords.astype(np.float64).copy()
    out[..., 0] *= new_w / old_w
    out[..., 1] *= new_h / old_h
    return out


def generate_crop_boxes(
    original_size: tuple[int, int],
    crop_n_layers: int = 0,
    overlap_ratio: float = 512 / 1500,
    points_per_crop: int = 32,
    crop_n_points_downscale_factor: int = 1,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Crop boxes (absolute XYXY) + per-crop point grids in CROP-frame
    pixel coords. Layer i contributes (2**(i+1))**2 crops; layer 0 is the
    full image (HF _generate_per_layer_crops/_generate_crop_images
    geometry)."""
    im_h, im_w = original_size
    short_side = min(im_h, im_w)

    grids = [
        build_point_grid(int(points_per_crop / (crop_n_points_downscale_factor**i)))
        for i in range(crop_n_layers + 1)
    ]

    crop_boxes: list[list[int]] = [[0, 0, im_w, im_h]]
    layer_idxs: list[int] = [0]
    for i_layer in range(crop_n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = int(math.ceil((overlap * (n_per_side - 1) + im_w) / n_per_side))
        crop_h = int(math.ceil((overlap * (n_per_side - 1) + im_h) / n_per_side))
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for left, top in product(x0s, y0s):
            crop_boxes.append([left, top, min(left + crop_w, im_w), min(top + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)

    points_per_crop_out = []
    for box, layer in zip(crop_boxes, layer_idxs):
        left, top, right, bottom = box
        ch, cw = bottom - top, right - left
        points_per_crop_out.append(grids[layer] * np.array([cw, ch], np.float64)[None, :])
    return np.asarray(crop_boxes, np.float32), points_per_crop_out


def compute_stability_score(
    masks: np.ndarray, mask_threshold: float, stability_score_offset: float
) -> np.ndarray:
    """IoU between the +offset and -offset binarizations of mask logits
    (HF _compute_stability_score_pt)."""
    inter = (masks > (mask_threshold + stability_score_offset)).sum((-1, -2), dtype=np.int64)
    union = (masks > (mask_threshold - stability_score_offset)).sum((-1, -2), dtype=np.int64)
    return inter / np.maximum(union, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """[..., H, W] binary masks -> XYXY boxes; [0,0,0,0] for empty masks
    (HF _batched_mask_to_box: right/bottom are INCLUSIVE pixel indices)."""
    if masks.size == 0:
        return np.zeros((*masks.shape[:-2], 4), np.int64)
    shape = masks.shape
    h, w = shape[-2:]
    m = masks.reshape(-1, h, w).astype(bool)

    in_h = m.any(axis=-1)  # [N, H]
    hc = in_h * np.arange(h)[None, :]
    bottom = hc.max(axis=-1)
    top = (hc + h * ~in_h).min(axis=-1)

    in_w = m.any(axis=-2)  # [N, W]
    wc = in_w * np.arange(w)[None, :]
    right = wc.max(axis=-1)
    left = (wc + w * ~in_w).min(axis=-1)

    empty = (right < left) | (bottom < top)
    out = np.stack([left, top, right, bottom], axis=-1)
    out = out * ~empty[:, None]
    return out.reshape(*shape[:-2], 4)


def is_box_near_crop_edge(
    boxes: np.ndarray, crop_box: list[int], orig_box: list[int], atol: float = 20.0
) -> np.ndarray:
    """True for boxes near a crop edge that are NOT near the image edge
    (HF _is_box_near_crop_edge). ``boxes`` are in crop-frame coords."""
    left, top = crop_box[0], crop_box[1]
    offset = np.array([[left, top, left, top]], np.float64)
    abs_boxes = boxes.astype(np.float64) + offset
    near_crop = np.isclose(abs_boxes, np.asarray(crop_box, np.float64)[None, :], atol=atol, rtol=0)
    near_image = np.isclose(abs_boxes, np.asarray(orig_box, np.float64)[None, :], atol=atol, rtol=0)
    return np.any(near_crop & ~near_image, axis=-1)


def mask_to_rle(masks: np.ndarray) -> list[dict[str, Any]]:
    """[N, H, W] binary masks -> uncompressed column-major RLE
    (pycocotools format; HF _mask_to_rle_pytorch)."""
    n, h, w = masks.shape
    if n == 0:
        return []
    flat = masks.transpose(0, 2, 1).reshape(n, -1).astype(bool)
    out = []
    for i in range(n):
        row = flat[i]
        change = np.nonzero(row[1:] ^ row[:-1])[0] + 1
        if len(change) == 0:
            out.append({"size": [h, w], "counts": [h * w] if not row[0] else [0, h * w]})
            continue
        counts = [] if not row[0] else [0]
        counts += [int(change[0])] + np.diff(change).tolist() + [h * w - int(change[-1])]
        out.append({"size": [h, w], "counts": counts})
    return out


def rle_to_mask(rle: dict[str, Any]) -> np.ndarray:
    """Uncompressed RLE -> [H, W] binary mask (HF _rle_to_mask)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def pad_mask_to_image(
    masks: np.ndarray, crop_box: list[int], orig_h: int, orig_w: int
) -> np.ndarray:
    """Place crop-frame masks into the full image frame (HF _pad_masks)."""
    left, top, right, bottom = (int(v) for v in crop_box)
    if left == 0 and top == 0 and right == orig_w and bottom == orig_h:
        return masks
    pad_x, pad_y = orig_w - (right - left), orig_h - (bottom - top)
    return np.pad(
        masks, [(0, 0)] * (masks.ndim - 2) + [(top, pad_y - top), (left, pad_x - left)]
    )


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS, score-descending with stable tie order (torchvision.nms
    semantics used by HF _postprocess_for_mg)."""
    if len(boxes) == 0:
        return np.zeros(0, np.int64)
    boxes = boxes.astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    keep: list[int] = []
    for i in order:
        ok = True
        for j in keep:
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a + b - inter
            if union > 0 and inter / union > iou_threshold:
                ok = False
                break
        if ok:
            keep.append(int(i))
    return np.asarray(keep, np.int64)


def filter_masks(
    masks: np.ndarray,
    iou_scores: np.ndarray,
    crop_box: list[int],
    orig_box: list[int],
    pred_iou_thresh: float = 0.88,
    stability_score_thresh: float = 0.95,
    mask_threshold: float = 0.0,
    stability_score_offset: float = 1.0,
) -> tuple[list[dict], np.ndarray, np.ndarray]:
    """The HF _filter_masks_pt flow on crop-frame mask LOGITS [N, H, W]:
    IoU threshold -> stability threshold -> binarize -> boxes -> crop-edge
    filter -> pad to image frame -> RLE. Returns (rles, scores, boxes) with
    boxes offset to ABSOLUTE image coordinates (correct multi-crop NMS; see
    module docstring)."""
    orig_w, orig_h = int(orig_box[2]), int(orig_box[3])
    keep = np.ones(len(masks), bool)
    if pred_iou_thresh > 0.0:
        keep &= iou_scores > pred_iou_thresh
    if stability_score_thresh > 0.0:
        stability = compute_stability_score(masks, mask_threshold, stability_score_offset)
        keep &= stability > stability_score_thresh
    masks, scores = masks[keep], iou_scores[keep]

    binary = masks > mask_threshold
    boxes = batched_mask_to_box(binary)
    keep = ~is_box_near_crop_edge(boxes, crop_box, orig_box)
    binary, scores, boxes = binary[keep], scores[keep], boxes[keep]

    binary = pad_mask_to_image(binary, crop_box, orig_h, orig_w)
    rles = mask_to_rle(binary)
    abs_boxes = boxes.astype(np.float64) + np.array(
        [crop_box[0], crop_box[1], crop_box[0], crop_box[1]], np.float64
    )
    return rles, scores, abs_boxes
