"""Vendored reference NMS with torchvision semantics (pure torch).

torchvision is not installed in this image, so HF's final AMG step
(`_postprocess_for_mg` -> `torchvision.ops.boxes.batched_nms`) cannot run
as shipped. This module re-implements the two functions with torchvision's
documented semantics — greedy, score-descending, suppress at IoU strictly
greater than the threshold, batched variant offsets boxes per category so
cross-category boxes never suppress each other — enabling the COMPOSED
HF mask-generation pipeline (the thing the reference runs whole,
reference: src/theia/decoding/sam.py:15-106) to execute end-to-end as a
test oracle. Scores used with it in tests are kept distinct so the one
unspecified behavior (tie order, which torchvision's unstable sort leaves
implementation-defined) never matters.
"""

from __future__ import annotations

import torch


def nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float) -> torch.Tensor:
    """torchvision.ops.nms: keep indices in score-descending order, greedily
    suppressing any box whose IoU with an already-kept box exceeds
    iou_threshold."""
    order = scores.argsort(descending=True)
    keep: list[int] = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        lt = torch.maximum(boxes[i, :2], boxes[rest, :2])
        rb = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + areas - inter)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


def batched_nms(
    boxes: torch.Tensor, scores: torch.Tensor, idxs: torch.Tensor, iou_threshold: float
) -> torch.Tensor:
    """torchvision.ops.boxes.batched_nms: per-category NMS via the
    coordinate-offset trick (boxes of different idxs can never overlap)."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    return nms(boxes + offsets[:, None], scores, iou_threshold)
