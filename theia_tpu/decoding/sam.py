"""SAM mask decoding from predicted embeddings.

Replaces the reference's HF MaskGenerationPipeline subclass that injects
embeddings instead of running the encoder (reference:
src/theia/decoding/sam.py:15-106, injection at :80-85) with a native
auto-mask generator over our JAX SamMaskDecoder, following the HF pipeline
flow exactly (preprocess -> per-point-batch decode -> two-stage bilinear
upscale -> filter_masks -> cross-batch box NMS), including crop layers,
uncompressed-RLE output, and crop-edge box filtering via
theia_tpu.decoding.amg (each primitive is unit-tested against
transformers' AMG utilities in tests/test_sam_amg.py).

Crop layers with injected embeddings: the HF pipeline cannot re-encode
crops when the encoder is bypassed; here each crop decodes against the
full-image embedding window sliced in embedding space and resized to
64x64 (documented divergence — the reference never exercises
crops_n_layers > 0 in decode_sam).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from theia_tpu.decoding.amg import (
    box_nms,
    filter_masks,
    generate_crop_boxes,
    normalize_coordinates,
    rle_to_mask,
)
from theia_tpu.foundation.sam_decoder import SAM_DECODER, SamDecoderConfig, SamMaskDecoder
from theia_tpu.ops.image import bicubic_resize


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

    def _upscale(self, masks: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
        """HF post_process_masks: bilinear to the padded model size (1024),
        slice to the reshaped input, bilinear to the target size."""
        t = self.cfg.input_image_size
        oh, ow = out_hw
        scale = t / max(oh, ow)
        rh, rw = int(oh * scale + 0.5), int(ow * scale + 0.5)
        up = bicubic_resize(jnp.asarray(masks)[..., None], t, t, kernel="linear", antialias=False)
        up = up[:, :rh, :rw]
        out = bicubic_resize(up, oh, ow, kernel="linear", antialias=False)
        return np.asarray(out[..., 0], np.float32)

    def _crop_embedding(self, emb: jax.Array, crop_box: np.ndarray, hw: tuple[int, int]) -> jax.Array:
        """Slice the [1,64,64,256] embedding to the crop window and resize
        back to 64x64 (embedding-space crop; see module docstring)."""
        h, w = hw
        left, top, right, bottom = (float(v) for v in crop_box)
        if left == 0 and top == 0 and right == w and bottom == h:
            return emb
        s = emb.shape[1]
        x0, x1 = int(left / w * s), max(int(np.ceil(right / w * s)), int(left / w * s) + 1)
        y0, y1 = int(top / h * s), max(int(np.ceil(bottom / h * s)), int(top / h * s) + 1)
        window = emb[:, y0:y1, x0:x1, :]
        return bicubic_resize(window, s, s, kernel="linear", antialias=False)

    def __call__(
        self,
        embeddings: jax.Array,  # [1, 256, 64, 64] BCHW (reference layout)
        output_size: tuple[int, int] = (224, 224),
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        crops_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        output_rle_mask: bool = False,
        output_bboxes_mask: bool = False,
        **kwargs: Any,
    ) -> dict[str, Any]:
        emb_full = jnp.transpose(jnp.asarray(embeddings), (0, 2, 3, 1))
        oh, ow = output_size
        orig_box = [0, 0, ow, oh]
        crop_boxes, points_per_crop = generate_crop_boxes(
            (oh, ow),
            crop_n_layers=crops_n_layers,
            overlap_ratio=crop_overlap_ratio,
            points_per_crop=self.points_per_side,
            crop_n_points_downscale_factor=crop_n_points_downscale_factor,
        )

        all_rles: list[dict] = []
        all_scores: list[float] = []
        all_boxes: list[np.ndarray] = []
        for crop_box, crop_points in zip(crop_boxes, points_per_crop):
            left, top, right, bottom = (int(v) for v in crop_box)
            ch, cw = bottom - top, right - left
            emb = self._crop_embedding(emb_full, crop_box, (oh, ow))
            # points in crop frame -> processed (longest-edge) coords
            points = normalize_coordinates(
                self.cfg.input_image_size, crop_points, (ch, cw)
            ).astype(np.float32)

            for i in range(0, len(points), self.points_per_batch):
                batch_pts = points[i : i + self.points_per_batch]
                pts = jnp.asarray(batch_pts)[None, :, None, :]  # [1, P, 1, 2]
                lbl = jnp.ones((1, batch_pts.shape[0], 1), jnp.int32)
                masks, iou = self._apply(self.params, emb, pts, lbl)
                masks = np.asarray(masks[0], np.float32)  # [P, 3, 256, 256]
                iou = np.asarray(iou[0], np.float32).reshape(-1)
                p, m, mh, mw = masks.shape
                flat = self._upscale(masks.reshape(p * m, mh, mw), (ch, cw))
                rles, scores, boxes = filter_masks(
                    flat,
                    iou,
                    [left, top, right, bottom],
                    orig_box,
                    pred_iou_thresh=pred_iou_thresh,
                    stability_score_thresh=stability_score_thresh,
                    mask_threshold=self.mask_threshold,
                    stability_score_offset=self.stability_score_offset,
                )
                all_rles.extend(rles)
                all_scores.extend(float(s) for s in scores)
                all_boxes.extend(boxes)

        if not all_rles:
            return {"masks": [], "scores": []}
        boxes_arr = np.stack(all_boxes)
        scores_arr = np.asarray(all_scores, np.float32)
        keep = box_nms(boxes_arr, scores_arr, self.crops_nms_thresh)
        out: dict[str, Any] = {
            "masks": [rle_to_mask(all_rles[i]) for i in keep],
            "scores": [float(scores_arr[i]) for i in keep],
        }
        if output_rle_mask:
            out["rle_mask"] = [all_rles[i] for i in keep]
        if output_bboxes_mask:
            out["bounding_boxes"] = boxes_arr[keep]
        return out


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
