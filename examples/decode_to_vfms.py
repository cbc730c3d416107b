"""Decode Theia-predicted representations back into teacher outputs.

Script equivalent of the reference notebook (reference:
src/theia/example/decode_to_vfms.ipynb): load a published Theia model, run
it over an image, and render the [input | DINOv2-PCA | SAM masks | depth]
panel.

    python examples/decode_to_vfms.py --checkpoint ckpt.safetensors \
        --image example.png --out panel.png \
        [--sam-checkpoint facebook/sam-vit-huge] \
        [--depth-checkpoint LiheYoung/depth-anything-large-hf] \
        [--stat-root feature_stats]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="theaiinstitute/theia-base-patch16-224-cddsv")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--out", default="decoded_panel.png")
    parser.add_argument("--stat-root", default="feature_stats")
    parser.add_argument("--sam-checkpoint", default=None)
    parser.add_argument("--depth-checkpoint", default=None)
    args = parser.parse_args()

    import cv2

    from theia_tpu.decoding import decode_everything, load_feature_stats, prepare_mask_generator
    from theia_tpu.decoding.depth_anything import prepare_depth_decoder
    from theia_tpu.models.hub import from_pretrained
    from theia_tpu.scripts.decoding_example import _maybe_torch_depth, _maybe_torch_sam

    model = from_pretrained(args.model, args.checkpoint)

    image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    image = cv2.resize(image, (224, 224))[None]

    teachers = list(model.model.target_feature_sizes)
    means, stds = load_feature_stats(teachers, args.stat_root)
    mask_generator, _ = prepare_mask_generator(hf_model=_maybe_torch_sam(args.sam_checkpoint))
    depth_decoder, _ = prepare_depth_decoder(hf_model=_maybe_torch_depth(args.depth_checkpoint))

    results, _ = decode_everything(
        lambda x: {k: np.asarray(v) for k, v in model(x).items()},
        means, stds, image, mask_generator, depth_decoder,
        pred_iou_thresh=0.5, stability_score_thresh=0.7,
    )
    panel = (np.clip(results[0], 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(args.out, cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
