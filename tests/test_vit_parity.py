"""Golden-value parity: theia-tpu ViTBackbone vs HF ViTModel (random init).

Builds HF models from config (offline, no hub download), converts weights,
and compares last_hidden_state on identical inputs. This ties to the
BASELINE.md numerics target (<1e-3 per-teacher feature MSE).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from theia_tpu.models.vit import ViTBackbone, ViTBackboneConfig
from theia_tpu.models.hf_convert import convert_vit_backbone, state_dict_to_numpy


def _make_hf_vit(hidden=192, layers=4, heads=3, inter=768):
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        image_size=224,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = ViTModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_and_jax():
    hf = _make_hf_vit()
    cfg = ViTBackboneConfig(hidden_size=192, num_layers=4, num_heads=3, intermediate_size=768)
    backbone = ViTBackbone(cfg, variant="cls")
    params = convert_vit_backbone(state_dict_to_numpy(hf.state_dict()), num_layers=4)
    return hf, backbone, {"params": params}


def test_vit_parity_pixel_values(hf_and_jax):
    """Compare encoders on identical preprocessed pixels (isolates the ViT)."""
    hf, backbone, variables = hf_and_jax
    rng = np.random.RandomState(0)
    pix = rng.randn(2, 3, 224, 224).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pix)).last_hidden_state.numpy()
    # feed pre-normalized pixels: disable the processor stages
    got = backbone.apply(
        variables,
        jnp.asarray(pix),
        do_resize=False,
        do_rescale=False,
        do_normalize=False,
    )
    got = np.asarray(got)
    assert got.shape == ref.shape
    mse = float(np.mean((got - ref) ** 2))
    assert mse < 1e-9, mse
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_vit_parity_uint8_end_to_end(hf_and_jax):
    """uint8 image -> processor -> encoder, both stacks end to end."""
    from transformers import DeiTImageProcessor

    hf, backbone, variables = hf_and_jax
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    proc = DeiTImageProcessor()
    pix = proc(list(imgs), return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        ref = hf(pixel_values=pix).last_hidden_state.numpy()
    got = np.asarray(backbone.apply(variables, jnp.asarray(imgs)))
    mse = float(np.mean((got - ref) ** 2))
    # <1e-3 MSE target from BASELINE.md (PIL uint8 rounding is the gap)
    assert mse < 1e-3, mse


def test_nocls_and_reg_variants_shapes():
    import jax

    cfg = ViTBackboneConfig(hidden_size=192, num_layers=2, num_heads=3, intermediate_size=768)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.uint8)

    nocls = ViTBackbone(cfg, variant="nocls")
    v = nocls.init(jax.random.PRNGKey(0), imgs)
    out = nocls.apply(v, imgs)
    assert out.shape == (1, 196, 192)
    # nocls keeps the (1, 197, C) pos-embed shape (reference backbones.py:91)
    assert v["params"]["position_embeddings"].shape == (1, 197, 192)

    reg = ViTBackbone(cfg, variant="reg", num_reg_tokens=7)
    v = reg.init(jax.random.PRNGKey(0), imgs)
    out = reg.apply(v, imgs)
    assert out.shape == (1, 1 + 196 + 7, 192)


def test_interpolate_pos_encoding_matches_reference_math():
    """256x256 input with interpolate_pos_encoding vs reference torch math."""
    import math

    import torch.nn.functional as F

    cfg = ViTBackboneConfig(hidden_size=64, num_layers=1, num_heads=2, intermediate_size=128)
    backbone = ViTBackbone(cfg, variant="cls")
    import jax

    imgs = (np.random.RandomState(2).rand(1, 256, 256, 3) * 255).astype(np.uint8)
    variables = backbone.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs), do_resize=False, interpolate_pos_encoding=True
    )
    pos = np.asarray(variables["params"]["position_embeddings"])  # (1, 197, 64)

    # reference interpolate_pos_encoding (backbones.py:39-69)
    n = 196
    s = int(math.sqrt(n))
    h0 = w0 = 256 // 16
    patch_pos = torch.from_numpy(pos[:, 1:]).reshape(1, s, s, 64).permute(0, 3, 1, 2)
    scale = (h0 + 0.1) / s
    ref = F.interpolate(patch_pos, scale_factor=(scale, scale), mode="bicubic", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(1, -1, 64).numpy()

    got = np.asarray(
        backbone.apply(variables, jnp.zeros((0,)), method=lambda m, _: m._interp_patch_pos(h0, w0))
    )
    np.testing.assert_allclose(got, ref, atol=3e-5)


@pytest.mark.parametrize("variant,tokens", [("cls", 197), ("nocls", 196), ("reg", 204)])
def test_token_pad_multiple_equivalence(monkeypatch, variant, tokens):
    """TOKEN_PAD_MULTIPLE pads the sequence to a tile boundary with -inf-
    masked keys; real-token outputs and weight grads must match the
    unpadded forward (the pad is a pure layout lever, PERFORMANCE.md)."""
    import jax

    from theia_tpu.models import vit as jvit

    cfg = ViTBackboneConfig(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128)
    backbone = ViTBackbone(cfg, variant=variant, num_reg_tokens=7 if variant == "reg" else 0)
    imgs = (np.random.RandomState(3).rand(2, 224, 224, 3) * 255).astype(np.uint8)
    variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(imgs))

    def loss(v):
        out = backbone.apply(v, jnp.asarray(imgs))
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape))), out

    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(variables)
    monkeypatch.setattr(jvit, "TOKEN_PAD_MULTIPLE", 16)
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(variables)

    assert out0.shape[1] == tokens and out1.shape == out0.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=1e-5)
    for (p0, a0), (p1, a1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        assert str(p0) == str(p1)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-4, err_msg=str(p0))
