"""SAM mask decoding from predicted embeddings.

Replaces the reference's HF MaskGenerationPipeline subclass that injects
embeddings instead of running the encoder (reference:
src/theia/decoding/sam.py:15-106, injection at :80-85) with a native
auto-mask generator over our JAX SamMaskDecoder: a 32x32 point grid is
batched through the mask decoder, masks are filtered by predicted IoU and
stability score, then box-NMS'd — the AMG recipe of the SAM paper.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.foundation.sam_decoder import SAM_DECODER, SamDecoderConfig, SamMaskDecoder
from theia_tpu.ops.image import bicubic_resize


def _box_from_mask(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def _box_iou(a: np.ndarray, b: np.ndarray) -> float:
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def _nms(boxes: list[np.ndarray], scores: list[float], thresh: float) -> list[int]:
    order = np.argsort(scores)[::-1]
    keep: list[int] = []
    for i in order:
        if all(_box_iou(boxes[i], boxes[j]) <= thresh for j in keep):
            keep.append(int(i))
    return keep


class MaskGenerator:
    """Automatic mask generation from SAM image embeddings."""

    def __init__(
        self,
        decoder: SamMaskDecoder,
        decoder_params: Any,
        cfg: SamDecoderConfig = SAM_DECODER,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        mask_threshold: float = 0.0,
        stability_score_offset: float = 1.0,
        crops_nms_thresh: float = 0.7,
    ) -> None:
        self.decoder = decoder
        self.params = decoder_params
        self.cfg = cfg
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.mask_threshold = mask_threshold
        self.stability_score_offset = stability_score_offset
        self.crops_nms_thresh = crops_nms_thresh
        self._apply = jax.jit(
            lambda p, emb, pts, lbl: decoder.apply({"params": p}, emb, pts, lbl, True)
        )

    def __call__(
        self,
        embeddings: jax.Array,  # [1, 256, 64, 64] BCHW (reference layout)
        output_size: tuple[int, int] = (224, 224),
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        **kwargs: Any,
    ) -> dict[str, Any]:
        cfg = self.cfg
        emb = jnp.transpose(jnp.asarray(embeddings), (0, 2, 3, 1))
        n = self.points_per_side
        grid = (np.stack(np.meshgrid(np.arange(n), np.arange(n)), -1).reshape(-1, 2) + 0.5) / n
        points = (grid * cfg.input_image_size).astype(np.float32)  # in processed coords

        all_masks: list[np.ndarray] = []
        all_scores: list[float] = []
        all_boxes: list[np.ndarray] = []
        oh, ow = output_size
        for i in range(0, len(points), self.points_per_batch):
            batch_pts = points[i : i + self.points_per_batch]
            pts = jnp.asarray(batch_pts)[None, :, None, :]  # [1, P, 1, 2]
            lbl = jnp.ones((1, batch_pts.shape[0], 1), jnp.int32)
            masks, iou = self._apply(self.params, emb, pts, lbl)
            masks = np.asarray(masks[0], np.float32)  # [P, 3, 256, 256]
            iou = np.asarray(iou[0], np.float32)      # [P, 3]
            p, m, mh, mw = masks.shape
            flat = masks.reshape(p * m, mh, mw)
            flat_iou = iou.reshape(p * m)
            sel = flat_iou > pred_iou_thresh
            if not sel.any():
                continue
            flat, flat_iou = flat[sel], flat_iou[sel]
            mt, off = self.mask_threshold, self.stability_score_offset
            hi = (flat > mt + off).sum((1, 2)).astype(np.float64)
            lo = (flat > mt - off).sum((1, 2)).astype(np.float64)
            stability = np.where(lo > 0, hi / np.maximum(lo, 1), 0.0)
            sel = stability >= stability_score_thresh
            if not sel.any():
                continue
            flat, flat_iou = flat[sel], flat_iou[sel]
            up = np.asarray(
                bicubic_resize(jnp.asarray(flat)[..., None], oh, ow, kernel="linear", antialias=False)
            )[..., 0]
            binm = up > mt
            for k in range(len(binm)):
                if binm[k].sum() == 0:
                    continue
                all_masks.append(binm[k])
                all_scores.append(float(flat_iou[k]))
                all_boxes.append(_box_from_mask(binm[k]))

        keep = _nms(all_boxes, all_scores, self.crops_nms_thresh) if all_masks else []
        return {
            "masks": [all_masks[i] for i in keep],
            "scores": [all_scores[i] for i in keep],
        }


def prepare_mask_generator(hf_model: Optional[Any] = None, decoder_params: Optional[Any] = None):
    """Build the mask generator (reference prepare_mask_generator,
    decoding/sam.py:176-191). Weights from a converted HF SamModel or a
    ready param tree."""
    decoder = SamMaskDecoder(SAM_DECODER)
    if decoder_params is None:
        if hf_model is not None:
            from theia_tpu.foundation.sam_decoder import convert_sam_decoder

            decoder_params = convert_sam_decoder(
                {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
            )
        else:
            decoder_params = decoder.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 256)),
                jnp.zeros((1, 1, 1, 2)),
                jnp.ones((1, 1, 1), jnp.int32),
            )["params"]
    return MaskGenerator(decoder, decoder_params), decoder


def draw_mask(mask: np.ndarray, random_color: bool = False) -> np.ndarray:
    """(reference decoding/sam.py:109-125)"""
    if random_color:
        color = np.random.random(3)
    else:
        color = np.array([30 / 255, 144 / 255, 255 / 255])
    h, w = mask.shape[-2:]
    return mask.reshape(h, w, 1) * color.reshape(1, 1, -1)


def decode_sam(
    features: np.ndarray,
    images: list,
    mask_generator: MaskGenerator,
    points_per_batch: int = 64,
    pred_iou_thresh: float = 0.5,
    stability_score_thresh: float = 0.6,
    random_color: bool = True,
    **kwargs: Any,
) -> np.ndarray:
    """[B, num_tokens, 256] predicted SAM embeddings -> rendered mask images
    [B, 224, 224, 3] (reference decoding/sam.py:128-173)."""
    features = np.asarray(features, np.float32)
    b, n, c = features.shape
    s = int(n ** 0.5)
    feats = features.transpose(0, 2, 1).reshape(b, c, s, s)
    outs = []
    for i in range(b):
        result = mask_generator(
            feats[i : i + 1],
            pred_iou_thresh=pred_iou_thresh,
            stability_score_thresh=stability_score_thresh,
        )
        canvas = np.zeros((224, 224, 3), np.float32)
        for mask in result["masks"]:
            canvas += draw_mask(mask, random_color=random_color)
        outs.append(canvas)
    return np.stack(outs)
