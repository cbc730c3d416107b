"""SAM mask decoder + prompt encoder parity vs HF SamModel."""

import numpy as np
import torch

import jax.numpy as jnp

from theia_tpu.foundation.sam_decoder import (
    SamDecoderConfig,
    SamMaskDecoder,
    convert_sam_decoder,
)


def _pair():
    from transformers import SamConfig, SamModel

    cfg = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=128, patch_size=16, window_size=4, global_attn_indexes=[1],
            mlp_dim=64, output_channels=16, num_pos_feats=8,
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=128, patch_size=16, num_pos_feats=8,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, mlp_dim=32,
            iou_head_hidden_dim=16,
        ),
    )
    torch.manual_seed(0)
    hf = SamModel(cfg)
    hf.eval()

    jcfg = SamDecoderConfig(
        hidden_size=16, num_heads=2, mlp_dim=32, iou_head_hidden_dim=16,
        image_embedding_size=8, input_image_size=128, num_pos_feats=8,
    )
    module = SamMaskDecoder(jcfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_sam_decoder(sd, jcfg)
    return hf, module, params


def test_mask_decoder_parity():
    hf, module, params = _pair()
    rng = np.random.RandomState(0)
    emb = rng.randn(2, 16, 8, 8).astype(np.float32)  # B, C, H, W
    points = rng.rand(2, 3, 2, 2).astype(np.float32) * 128  # B, P, N, 2
    labels = np.ones((2, 3, 2), np.int32)
    labels[0, 0, 1] = 0  # mix positive/negative labels

    with torch.no_grad():
        out = hf(
            image_embeddings=torch.from_numpy(emb),
            input_points=torch.from_numpy(points),
            input_labels=torch.from_numpy(labels),
            multimask_output=True,
        )
        want_masks = out.pred_masks.numpy()  # [B, P, 3, 32, 32]
        want_iou = out.iou_scores.numpy()

    got_masks, got_iou = module.apply(
        {"params": params},
        jnp.asarray(emb.transpose(0, 2, 3, 1)),
        jnp.asarray(points),
        jnp.asarray(labels),
        multimask_output=True,
    )
    assert got_masks.shape == want_masks.shape
    np.testing.assert_allclose(np.asarray(got_iou), want_iou, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks, atol=1e-3)


def test_mask_decoder_single_mask_output():
    hf, module, params = _pair()
    rng = np.random.RandomState(1)
    emb = rng.randn(1, 16, 8, 8).astype(np.float32)
    points = rng.rand(1, 2, 1, 2).astype(np.float32) * 128
    labels = np.ones((1, 2, 1), np.int32)
    with torch.no_grad():
        out = hf(
            image_embeddings=torch.from_numpy(emb),
            input_points=torch.from_numpy(points),
            input_labels=torch.from_numpy(labels),
            multimask_output=False,
        )
    got_masks, got_iou = module.apply(
        {"params": params}, jnp.asarray(emb.transpose(0, 2, 3, 1)),
        jnp.asarray(points), jnp.asarray(labels), multimask_output=False,
    )
    assert got_masks.shape == out.pred_masks.numpy().shape
    np.testing.assert_allclose(np.asarray(got_masks), out.pred_masks.numpy(), atol=1e-3)
