"""SAM vision encoder parity vs HF SamModel (random init, offline)."""

import numpy as np
import torch

import jax.numpy as jnp

from theia_tpu.foundation.sam import SamVisionConfig, SamVisionEncoder, convert_sam_vision
from theia_tpu.models.hf_convert import state_dict_to_numpy


def _small_pair(window_size=4, global_idx=(1, 3)):
    from transformers import SamConfig, SamModel

    cfg = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
            image_size=128, patch_size=16, window_size=window_size,
            global_attn_indexes=list(global_idx), mlp_dim=64, output_channels=8,
            num_pos_feats=16,
        )
    )
    torch.manual_seed(0)
    hf = SamModel(cfg)
    hf.eval()
    # give rel-pos tables nonzero values so the bias path is exercised
    with torch.no_grad():
        for n, p in hf.vision_encoder.named_parameters():
            if "rel_pos" in n:
                p.copy_(torch.randn_like(p) * 0.1)

    jcfg = SamVisionConfig(
        hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
        image_size=128, patch_size=16, window_size=window_size,
        global_attn_indexes=tuple(global_idx), output_channels=8,
    )
    module = SamVisionEncoder(jcfg)
    params = convert_sam_vision(state_dict_to_numpy(hf.vision_encoder.state_dict()), jcfg)
    return hf, module, params


def test_sam_vision_parity_pixels():
    hf, module, params = _small_pair()
    pix = np.random.RandomState(0).randn(2, 3, 128, 128).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf.vision_encoder(torch.from_numpy(pix)).last_hidden_state.numpy()  # (B, C, H, W)
    got = np.asarray(module.apply({"params": params}, jnp.asarray(pix), do_preprocess=False))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_sam_vision_parity_with_window_padding():
    """window=3 on an 8x8 grid forces pad 8->9 (exercises pad/unpad)."""
    hf, module, params = _small_pair(window_size=3, global_idx=(2,))
    pix = np.random.RandomState(1).randn(1, 3, 128, 128).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf.vision_encoder(torch.from_numpy(pix)).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(pix), do_preprocess=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=5e-4)


def test_sam_processor_path():
    """uint8 end-to-end vs HF SamProcessor (square image -> plain resize)."""
    from transformers import SamImageProcessor

    hf, module, params = _small_pair()
    imgs = np.random.RandomState(2).randint(0, 256, (1, 200, 200, 3), np.uint8)
    proc = SamImageProcessor(size={"longest_edge": 128}, pad_size={"height": 128, "width": 128})
    pv = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        want = hf.vision_encoder(pv).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(imgs)))
    mse = float(np.mean((got.transpose(0, 3, 1, 2) - want) ** 2))
    assert mse < 1e-3, mse
