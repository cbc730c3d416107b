"""Decoding example CLI (reference:
src/theia/scripts/decoding/decoding_example.py:26-103): run a trained Theia
over a video/image, decode predicted features into DINOv2-PCA / SAM-mask /
depth panels and write an mp4/png.

Usage:
    python -m theia_tpu.scripts.decoding_example \
        --checkpoint /path/to/orbax_or_reference.pth \
        --media-to-vis-path input.mp4 --vis-output-dir ./vis \
        [--backbone facebook/deit-base-patch16-224] [--stat-root feature_stats]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_media(path: str, target: int = 224) -> np.ndarray:
    """Read an image or video into uint8 [N, 224, 224, 3]."""
    import cv2

    if path.endswith((".mp4", ".avi", ".webm", ".mov")):
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(cv2.resize(frame, (target, target)))
        cap.release()
        return np.stack(frames)
    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    return cv2.resize(img, (target, target))[None]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backbone", default="facebook/deit-base-patch16-224")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--media-to-vis-path", required=True)
    parser.add_argument("--vis-output-dir", default="./vis")
    parser.add_argument("--stat-root", default=os.path.join(os.path.dirname(__file__), "..", "..", "feature_stats"))
    parser.add_argument("--sam-checkpoint", default=None, help="HF SamModel weights for the mask decoder")
    parser.add_argument("--depth-checkpoint", default=None, help="HF DepthAnything weights for the depth head")
    parser.add_argument(
        "--gt", action="store_true",
        help="also run the real (ported JAX) teachers on the input frames and "
        "stack a ground-truth panel row under the predicted row (reference "
        "decode.py:126-196); teacher weights come from --dinov2-checkpoint, "
        "--sam-checkpoint and --depth-checkpoint",
    )
    parser.add_argument("--dinov2-checkpoint", default=None, help="HF Dinov2Model weights for the GT row")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from theia_tpu.decoding import (
        decode_everything,
        load_feature_stats,
        prepare_mask_generator,
    )
    from theia_tpu.decoding.depth_anything import prepare_depth_decoder
    from theia_tpu.foundation.common import MODEL_FEATURE_SIZES, get_model_feature_size
    from theia_tpu.models.pretrained import load_theia_checkpoint
    from theia_tpu.models.rvfm import Theia

    target_models = [m for m in MODEL_FEATURE_SIZES if "llava" not in m]
    sizes = {t: get_model_feature_size(t, keep_spatial=True) for t in target_models}
    model = Theia(backbone=args.backbone, translator="lconv", target_feature_sizes=sizes)
    params = load_theia_checkpoint(args.checkpoint, model)

    fwd = jax.jit(lambda x: model.apply({"params": params}, x))

    def theia_forward(images: np.ndarray):
        return {k: np.asarray(v) for k, v in fwd(jnp.asarray(images)).items()}

    means, stds = load_feature_stats(target_models, args.stat_root)
    hf_sam = _maybe_torch_sam(args.sam_checkpoint)
    hf_depth = _maybe_torch_depth(args.depth_checkpoint)
    mask_generator, _ = prepare_mask_generator(hf_model=hf_sam)
    depth_decoder, _ = prepare_depth_decoder(hf_model=hf_depth)

    gt_models = None
    if args.gt:
        # the SamModel/DepthAnything modules loaded for the decoders double
        # as GT teacher weight sources; DINOv2 needs its own checkpoint
        gt_models = {}
        if args.dinov2_checkpoint:
            from transformers import Dinov2Model

            gt_models["facebook/dinov2-large"] = Dinov2Model.from_pretrained(
                args.dinov2_checkpoint
            )
        if hf_sam is not None:
            gt_models["facebook/sam-vit-huge"] = hf_sam
        if hf_depth is not None:
            gt_models["LiheYoung/depth-anything-large-hf"] = hf_depth

    media = load_media(args.media_to_vis_path)
    results, gt_results = decode_everything(
        theia_forward, means, stds, media, mask_generator, depth_decoder,
        pred_iou_thresh=0.5, stability_score_thresh=0.7,
        gt=args.gt, gt_teacher_models=gt_models,
    )
    if gt_results is not None:
        # reference layout: predicted row on top, ground-truth row below
        results = [np.vstack([r, g]) for r, g in zip(results, gt_results)]

    os.makedirs(args.vis_output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.media_to_vis_path))[0]
    import cv2

    if len(results) > 1:
        h, w = results[0].shape[:2]
        out = cv2.VideoWriter(
            os.path.join(args.vis_output_dir, f"{base}_vis.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h),
        )
        for frame in results:
            out.write(cv2.cvtColor((np.clip(frame, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        out.release()
    else:
        cv2.imwrite(
            os.path.join(args.vis_output_dir, f"{base}_vis.png"),
            cv2.cvtColor((np.clip(results[0], 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
    print(f"wrote visualization for {len(results)} frame(s) to {args.vis_output_dir}")


def _maybe_torch_sam(path):
    if not path:
        return None
    from transformers import SamModel

    return SamModel.from_pretrained(path)


def _maybe_torch_depth(path):
    if not path:
        return None
    from transformers import DepthAnythingForDepthEstimation

    return DepthAnythingForDepthEstimation.from_pretrained(path)


if __name__ == "__main__":
    main()
