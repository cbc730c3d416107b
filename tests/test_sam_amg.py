"""SAM auto-mask-generation parity vs transformers' AMG utilities.

Each theia_tpu.decoding.amg primitive is compared against the HF function
the reference pipeline uses (reference: src/theia/decoding/sam.py:15-106
via transformers.models.sam.image_processing_sam), and the full
per-point-batch flow (decode -> two-stage upscale -> filter_masks) is
compared end-to-end against HF's torch implementation with the same
injected embeddings and converted decoder weights.

torchvision is not installed in this image; tests/torchvision_nms.py
vendors batched_nms with torchvision semantics so HF's own final NMS
(_postprocess_for_mg) — and through it the COMPOSED pipeline — runs as the
oracle (test_composed_pipeline_matches_hf); our box_nms is additionally
tested against a scratch greedy reference with torch-matching tie order.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

from theia_tpu.decoding import amg

hf_sam = pytest.importorskip("transformers.models.sam.image_processing_sam")


def test_point_grid_matches_hf():
    for n in (2, 7, 32):
        np.testing.assert_allclose(amg.build_point_grid(n), hf_sam._build_point_grid(n))


def test_crop_boxes_match_hf():
    image = np.zeros((224, 224, 3), np.uint8)
    for layers in (0, 1, 2):
        crop_boxes, points, _, labels = hf_sam._generate_crop_boxes(
            image, target_size=1024, crop_n_layers=layers, points_per_crop=8
        )
        ours_boxes, ours_points = amg.generate_crop_boxes(
            (224, 224), crop_n_layers=layers, points_per_crop=8
        )
        np.testing.assert_array_equal(ours_boxes, np.asarray(crop_boxes))
        assert len(ours_points) == len(ours_boxes)
        # layer-0 (full image) point grid: HF normalizes every crop's points
        # by the FULL image size — correct only for the full-image crop, so
        # parity is asserted there; deeper crops keep crop-frame semantics
        # (documented divergence in decoding/amg.py)
        ours_norm = amg.normalize_coordinates(1024, ours_points[0], (224, 224))
        np.testing.assert_allclose(ours_norm, np.asarray(points)[0, :, 0, :])
        assert labels.min() == labels.max() == 1


def test_mask_to_box_matches_hf():
    rng = np.random.RandomState(0)
    masks = rng.rand(12, 33, 47) > 0.8
    masks[3] = False  # empty mask -> [0,0,0,0]
    masks[5] = True   # full mask
    want = hf_sam._batched_mask_to_box(torch.from_numpy(masks)).numpy()
    np.testing.assert_array_equal(amg.batched_mask_to_box(masks), want)


def test_rle_matches_hf_and_round_trips():
    rng = np.random.RandomState(1)
    masks = rng.rand(6, 17, 23) > 0.6
    masks[0] = False
    masks[1] = True
    ours = amg.mask_to_rle(masks)
    theirs = hf_sam._mask_to_rle_pytorch(torch.from_numpy(masks))
    assert ours == theirs
    for i, rle in enumerate(ours):
        np.testing.assert_array_equal(amg.rle_to_mask(rle), masks[i])
        np.testing.assert_array_equal(hf_sam._rle_to_mask(rle), masks[i])


def test_box_edge_filter_matches_hf():
    boxes = np.array(
        [[5, 5, 100, 100], [0, 40, 60, 80], [10, 10, 210, 210], [150, 150, 223, 223]],
        np.float64,
    )
    crop_box = [0, 0, 160, 160]
    orig_box = [0, 0, 224, 224]
    want = hf_sam._is_box_near_crop_edge(torch.from_numpy(boxes), crop_box, orig_box).numpy()
    np.testing.assert_array_equal(amg.is_box_near_crop_edge(boxes, crop_box, orig_box), want)


def test_stability_score_matches_hf():
    rng = np.random.RandomState(2)
    logits = rng.randn(9, 31, 31).astype(np.float32) * 3
    want = hf_sam._compute_stability_score_pt(torch.from_numpy(logits), 0.0, 1.0).numpy()
    np.testing.assert_allclose(amg.compute_stability_score(logits, 0.0, 1.0), want, rtol=1e-6)


def test_box_nms_greedy_semantics():
    rng = np.random.RandomState(3)
    boxes = rng.rand(40, 2) * 100
    boxes = np.concatenate([boxes, boxes + 20 + rng.rand(40, 2) * 60], axis=1)
    scores = np.round(rng.rand(40).astype(np.float32), 1)  # force score ties

    def greedy(boxes, scores, thresh):
        idx = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
        keep = []
        for i in idx:
            ok = True
            for j in keep:
                x1, y1 = max(boxes[i][0], boxes[j][0]), max(boxes[i][1], boxes[j][1])
                x2, y2 = min(boxes[i][2], boxes[j][2]), min(boxes[i][3], boxes[j][3])
                inter = max(0, x2 - x1) * max(0, y2 - y1)
                a = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
                b = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
                if a + b - inter > 0 and inter / (a + b - inter) > thresh:
                    ok = False
                    break
            if ok:
                keep.append(i)
        return keep

    got = amg.box_nms(boxes, scores, 0.5).tolist()
    assert got == greedy(boxes, scores, 0.5)


def test_box_nms_matches_vendored_torchvision():
    """box_nms vs the vendored torchvision-semantics batched_nms (distinct
    scores, so the single torchvision-unspecified behavior — tie order —
    never engages)."""
    from torchvision_nms import batched_nms

    rng = np.random.RandomState(7)
    boxes = rng.rand(60, 2) * 150
    boxes = np.concatenate([boxes, boxes + 5 + rng.rand(60, 2) * 80], axis=1)
    scores = rng.rand(60).astype(np.float32)
    assert len(np.unique(scores)) == 60
    for thresh in (0.3, 0.5, 0.7, 0.9):
        want = batched_nms(
            torch.from_numpy(boxes).float(),
            torch.from_numpy(scores),
            torch.zeros(len(boxes)),
            thresh,
        ).tolist()
        assert amg.box_nms(boxes, scores, thresh).tolist() == want


@pytest.fixture(scope="module")
def tiny_sam():
    """Random-init HF SamModel with a shrunken (unused) vision tower; the
    prompt encoder + mask decoder are the real sam geometry."""
    from transformers import SamConfig, SamModel

    cfg = SamConfig()
    cfg.vision_config.num_hidden_layers = 1
    torch.manual_seed(0)
    model = SamModel(cfg)
    model.eval()
    return model


def test_filter_flow_matches_hf_pipeline(tiny_sam):
    """Injected embeddings -> decoder -> upscale -> filter: our native flow
    vs HF SamModel + post_process_masks + filter_masks (the reference
    pipeline's _forward for the crops_n_layers=0 path it actually uses)."""
    import jax
    import jax.numpy as jnp

    from transformers import SamImageProcessor

    from theia_tpu.decoding.sam import MaskGenerator
    from theia_tpu.foundation.sam_decoder import SAM_DECODER, SamMaskDecoder, convert_sam_decoder

    proc = SamImageProcessor()
    rng = np.random.RandomState(0)
    emb = rng.randn(1, 256, 64, 64).astype(np.float32)

    # point grid for the full-image crop, exactly as the pipeline preprocess
    image = np.zeros((224, 224, 3), np.uint8)
    crop_boxes, grid_points, _, input_labels = hf_sam._generate_crop_boxes(
        image, target_size=1024, crop_n_layers=0, points_per_crop=8
    )
    pts = torch.tensor(grid_points, dtype=torch.float32)[:, :16]  # first point batch
    lbl = torch.tensor(input_labels, dtype=torch.long)[:, :16]

    with torch.no_grad():
        out = tiny_sam(
            image_embeddings=torch.from_numpy(emb),
            input_points=pts,
            input_labels=lbl,
        )
        masks = proc.post_process_masks(
            out.pred_masks, [(224, 224)], [(1024, 1024)], binarize=False
        )
        rles_hf, scores_hf, boxes_hf = proc.filter_masks(
            masks[0],
            out.iou_scores[0],
            (224, 224),
            crop_boxes[0],
            pred_iou_thresh=0.0,
            stability_score_thresh=0.0,
        )

    # ours: same decoder weights, same points
    sd = {k: v.detach().numpy() for k, v in tiny_sam.state_dict().items()}
    params = convert_sam_decoder(sd)
    gen = MaskGenerator(SamMaskDecoder(SAM_DECODER), params, points_per_batch=16)
    emb_nhwc = jnp.transpose(jnp.asarray(emb), (0, 2, 3, 1))
    m, iou = gen._apply(params, emb_nhwc, jnp.asarray(pts.numpy()), jnp.asarray(lbl.numpy()))
    m = np.asarray(m[0], np.float32)
    iou_np = np.asarray(iou[0], np.float32).reshape(-1)
    p, nm, mh, mw = m.shape
    up = gen._upscale(m.reshape(p * nm, mh, mw), (224, 224))
    rles, scores, boxes = amg.filter_masks(
        up, iou_np, [0, 0, 224, 224], [0, 0, 224, 224],
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )

    np.testing.assert_allclose(scores, scores_hf.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.stack(boxes), boxes_hf.numpy())
    assert len(rles) == len(rles_hf)
    for ours_rle, hf_rle in zip(rles, rles_hf):
        a = amg.rle_to_mask(ours_rle)
        b = hf_sam._rle_to_mask(hf_rle)
        inter = (a & b).sum()
        union = (a | b).sum()
        assert union == 0 or inter / union > 0.995, (inter, union)


def test_composed_pipeline_matches_hf(tiny_sam):
    """The COMPOSED mask-generation pipeline — every point batch decoded,
    filtered, aggregated, and cross-batch NMS'd — vs HF's own whole flow
    (the reference runs this pipeline end-to-end,
    reference src/theia/decoding/sam.py:15-106): preprocess ->
    per-point-batch [SamModel + post_process_masks + filter_masks] ->
    _postprocess_for_mg, with the vendored torchvision-semantics NMS
    standing in for the absent torchvision."""
    import jax.numpy as jnp
    from transformers import SamImageProcessor
    from transformers.models.sam import image_processing_sam as hf_mod

    from theia_tpu.decoding.sam import MaskGenerator
    from theia_tpu.foundation.sam_decoder import SAM_DECODER, SamMaskDecoder, convert_sam_decoder
    from torchvision_nms import batched_nms

    proc = SamImageProcessor()
    rng = np.random.RandomState(5)
    emb = rng.randn(1, 256, 64, 64).astype(np.float32)
    image = np.zeros((224, 224, 3), np.uint8)
    pps, ppb, nms_thresh = 6, 12, 0.7

    # ---- HF side: the full pipeline flow on injected embeddings ----
    crop_boxes, grid_points, _, input_labels = hf_sam._generate_crop_boxes(
        image, target_size=1024, crop_n_layers=0, points_per_crop=pps
    )
    pts_all = torch.tensor(grid_points, dtype=torch.float32)
    lbl_all = torch.tensor(input_labels, dtype=torch.long)
    rles_hf, scores_hf, boxes_hf = [], [], []
    with torch.no_grad():
        for i in range(0, pts_all.shape[1], ppb):
            out = tiny_sam(
                image_embeddings=torch.from_numpy(emb),
                input_points=pts_all[:, i : i + ppb],
                input_labels=lbl_all[:, i : i + ppb],
            )
            masks = proc.post_process_masks(
                out.pred_masks, [(224, 224)], [(1024, 1024)], binarize=False
            )
            r, s, b = proc.filter_masks(
                masks[0], out.iou_scores[0], (224, 224), crop_boxes[0],
                pred_iou_thresh=0.0, stability_score_thresh=0.0,
            )
            rles_hf.extend(r)
            scores_hf.append(s)
            boxes_hf.append(b)
    orig_patched = getattr(hf_mod, "batched_nms", None)
    hf_mod.batched_nms = batched_nms
    try:
        masks_hf, iou_hf, rle_hf, box_hf = hf_mod._postprocess_for_mg(
            rles_hf, torch.cat(scores_hf), torch.cat(boxes_hf), nms_thresh
        )
    finally:
        if orig_patched is None:
            del hf_mod.batched_nms
        else:
            hf_mod.batched_nms = orig_patched

    # ---- ours: the native composed generator, same weights/points ----
    sd = {k: v.detach().numpy() for k, v in tiny_sam.state_dict().items()}
    params = convert_sam_decoder(sd)
    gen = MaskGenerator(
        SamMaskDecoder(SAM_DECODER), params,
        points_per_side=pps, points_per_batch=ppb, crops_nms_thresh=nms_thresh,
    )
    ours = gen(
        jnp.asarray(emb), output_size=(224, 224),
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        output_rle_mask=True, output_bboxes_mask=True,
    )

    assert len(ours["masks"]) == len(masks_hf) > 0
    np.testing.assert_allclose(ours["scores"], iou_hf.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(ours["bounding_boxes"], box_hf.numpy())
    for a, b_hf in zip(ours["masks"], masks_hf):
        a = a.astype(bool)
        b_hf = np.asarray(b_hf).astype(bool)
        union = (a | b_hf).sum()
        assert union == 0 or (a & b_hf).sum() / union > 0.995


def test_mask_generator_crop_layers_and_rle_output(tiny_sam):
    """crops_n_layers > 0: per-crop decode, absolute boxes, cross-crop NMS,
    and the RLE/bbox output options."""
    from theia_tpu.decoding.sam import MaskGenerator
    from theia_tpu.foundation.sam_decoder import SAM_DECODER, SamMaskDecoder, convert_sam_decoder

    sd = {k: v.detach().numpy() for k, v in tiny_sam.state_dict().items()}
    params = convert_sam_decoder(sd)
    gen = MaskGenerator(SamMaskDecoder(SAM_DECODER), params, points_per_side=4, points_per_batch=16)
    emb = np.random.RandomState(1).randn(1, 256, 64, 64).astype(np.float32)
    out = gen(
        emb,
        output_size=(224, 224),
        pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
        crops_n_layers=1,
        output_rle_mask=True,
        output_bboxes_mask=True,
    )
    assert out["masks"], "crop layers produced no masks"
    assert len(out["masks"]) == len(out["scores"]) == len(out["rle_mask"])
    assert out["bounding_boxes"].shape == (len(out["masks"]), 4)
    for mask, rle, box in zip(out["masks"], out["rle_mask"], out["bounding_boxes"]):
        assert mask.shape == (224, 224)  # padded to the full image frame
        np.testing.assert_array_equal(amg.rle_to_mask(rle), mask)
        assert 0 <= box[0] <= box[2] <= 224 and 0 <= box[1] <= box[3] <= 224
