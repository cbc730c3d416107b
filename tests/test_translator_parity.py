"""Golden-value parity of adapter heads / translators vs the actual reference
torch modules (loaded read-only from /root/reference, never copied)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from reference_loader import load_reference
from theia_tpu.models import adapter_heads as jah
from theia_tpu.models import translators as jtr
from theia_tpu.models.hf_convert import (
    convert_conv_head,
    convert_light_conv_head,
    convert_mlp_head,
    convert_translator,
    state_dict_to_numpy,
)

rah = load_reference("models.adapter_heads")
rft = load_reference("models.feature_translators")

ATOL = 1e-3  # f32 accumulation-order noise through stacked LayerNorms


def _tokens(b, n, c, seed=0, cls=True):
    x = np.random.RandomState(seed).randn(b, n + (1 if cls else 0), c).astype(np.float32)
    return x


@pytest.mark.parametrize(
    "source,target",
    [
        ((20, 14, 14), (24, 16, 16)),  # deit -> dinov2/clip/vit geometry
        ((20, 14, 14), (12, 64, 64)),  # deit -> sam/depth geometry
        ((20, 14, 14), (24, 14, 14)),  # same-size path
        ((20, 14, 14), (8, 7, 7)),     # 7x7 policy geometry
        ((20, 16, 16), (24, 64, 64)),  # 16 source (no pad)
        ((12, 64, 64), (24, 16, 16)),  # downsample ladder
    ],
)
def test_light_conv_head_parity(source, target):
    torch.manual_seed(0)
    ref = rah.LightConvAdapterHead(source_size=source, target_size=target)
    ref.eval()
    x = _tokens(2, source[1] * source[2], source[0], cls=True)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    head = jah.LightConvAdapterHead(source_size=source, target_size=target)
    params = convert_light_conv_head(state_dict_to_numpy(ref.state_dict()), "", source[1], target[1])
    got = np.asarray(head.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_light_conv_head_no_cls():
    source, target = (20, 14, 14), (24, 16, 16)
    torch.manual_seed(1)
    ref = rah.LightConvAdapterHead(source_size=source, target_size=target)
    ref.eval()
    x = _tokens(2, 196, 20, seed=1, cls=False)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), backbone_no_cls=True).numpy()
    head = jah.LightConvAdapterHead(source_size=source, target_size=target)
    params = convert_light_conv_head(state_dict_to_numpy(ref.state_dict()), "", 14, 16)
    got = np.asarray(head.apply({"params": params}, jnp.asarray(x), backbone_no_cls=True))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize(
    "source,target",
    [
        ((20, 14, 14), (24, 64, 64)),
        ((20, 16, 16), (24, 16, 16)),
        ((12, 64, 64), (24, 16, 16)),
    ],
)
def test_conv_head_parity(source, target):
    torch.manual_seed(2)
    ref = rah.ConvAdapterHead(source_size=source, target_size=target)
    ref.eval()
    x = _tokens(2, source[1] * source[2], source[0], seed=2)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = jah.ConvAdapterHead(source_size=source, target_size=target)
    params = convert_conv_head(state_dict_to_numpy(ref.state_dict()), "", source[1], target[1])
    got = np.asarray(head.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("num_layer", [1, 2, 3])
def test_mlp_head_parity(num_layer):
    source, target = (20, 14, 14), (24, 16, 16)
    torch.manual_seed(3)
    ref = rah.MLPAdapterHead(source_size=source, target_size=target, num_layer=num_layer)
    ref.eval()
    x = _tokens(2, 196, 20, seed=3)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = jah.MLPAdapterHead(source_size=source, target_size=target, num_layer=num_layer)
    params = convert_mlp_head(state_dict_to_numpy(ref.state_dict()), "")
    got = np.asarray(head.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_linear_head_parity():
    torch.manual_seed(4)
    ref = rah.LinearAdapterHead(source_size=(20, 14, 14), target_size=(24,))
    ref.eval()
    x = _tokens(2, 196, 20, seed=4)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    head = jah.LinearAdapterHead(source_size=(20, 14, 14), target_size=(24,))
    params = convert_mlp_head(state_dict_to_numpy(ref.state_dict()), "")
    got = np.asarray(head.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=ATOL)


TARGETS = {
    "teacher/a": (24, 16, 16),
    "teacher/b": (12, 64, 64),
}


def test_lconv_translator_parity_with_cls_head():
    targets = dict(TARGETS)
    targets["teacher/a_cls"] = (24,)
    torch.manual_seed(5)
    ref = rft.LightConvFeatureTranslator(
        backbone_feature_size=torch.Size((20, 14, 14)), target_feature_sizes=targets
    )
    ref.eval()
    x = _tokens(2, 196, 20, seed=5)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in ref(torch.from_numpy(x)).items()}

    tr = jtr.LightConvFeatureTranslator(
        backbone_feature_size=(20, 14, 14), target_feature_sizes=targets
    )
    sd = {f"translator.{k}": v for k, v in state_dict_to_numpy(ref.state_dict()).items()}
    params = convert_translator(sd, "lconv", targets, backbone_spatial=14)
    got = tr.apply({"params": params}, jnp.asarray(x))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=ATOL, err_msg=k)


@pytest.mark.parametrize("kind", ["mlp", "conv"])
def test_mlp_conv_translator_parity(kind):
    torch.manual_seed(6)
    cls = rft.MLPFeatureTranslator if kind == "mlp" else rft.ConvFeatureTranslator
    kwargs = dict(
        backbone_feature_size=torch.Size((20, 14, 14)),
        target_feature_sizes=TARGETS,
        translator_hidden_size=32,
    )
    if kind == "mlp":
        kwargs["translator_n_layer"] = 3
    ref = cls(**kwargs)
    ref.eval()
    x = _tokens(2, 196, 20, seed=6)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in ref(torch.from_numpy(x)).items()}

    jkwargs = dict(
        backbone_feature_size=(20, 14, 14),
        target_feature_sizes=TARGETS,
        translator_hidden_size=32,
    )
    if kind == "mlp":
        jkwargs["translator_n_layer"] = 3
    tr = jtr.build_feature_translator(kind, **jkwargs)
    sd = {f"translator.{k}": v for k, v in state_dict_to_numpy(ref.state_dict()).items()}
    params = convert_translator(sd, kind, TARGETS, backbone_spatial=14)
    got = tr.apply({"params": params}, jnp.asarray(x))
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=ATOL, err_msg=k)


def test_transformer_translator_runs():
    """The reference transformer translator crashes at runtime (drops one of
    196 decode tokens -> einops 195 != 196); ours fixes that. Shape test only."""
    tr = jtr.build_feature_translator(
        "transformer",
        backbone_feature_size=(20, 14, 14),
        target_feature_sizes=TARGETS,
        translator_hidden_size=32,
        translator_n_layers=1,
        translator_n_heads=4,
    )
    x = jnp.asarray(_tokens(2, 196, 20, seed=7))
    params = tr.init(jax.random.PRNGKey(0), x)
    out = tr.apply(params, x)
    assert out["teacher/a"].shape == (2, 256, 24)
    assert out["teacher/b"].shape == (2, 4096, 12)


def test_transformer_stem_layer_matches_torch():
    """Parity of our TransformerDecoderLayer vs torch's (norm_first)."""
    d, nh, ff = 32, 4, 64
    torch.manual_seed(8)
    ref = torch.nn.TransformerDecoderLayer(
        d_model=d, nhead=nh, dim_feedforward=ff, activation="gelu",
        batch_first=True, norm_first=True, dropout=0.0,
    )
    ref.eval()
    tgt = np.random.RandomState(8).randn(2, 5, d).astype(np.float32)
    mem = np.random.RandomState(9).randn(2, 7, d).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(tgt), torch.from_numpy(mem)).numpy()

    layer = jtr._TransformerDecoderLayer(d, nh, ff)
    sd = state_dict_to_numpy(ref.state_dict())
    params = {}
    for attn in ("self_attn", "multihead_attn"):
        params[attn] = {
            "in_proj_weight": sd[attn + ".in_proj_weight"],
            "in_proj_bias": sd[attn + ".in_proj_bias"],
            "out_proj": {"kernel": sd[attn + ".out_proj.weight"].T, "bias": sd[attn + ".out_proj.bias"]},
        }
    for m in ("norm1", "norm2", "norm3"):
        params[m] = {"weight": sd[m + ".weight"], "bias": sd[m + ".bias"]}
    for m in ("linear1", "linear2"):
        params[m] = {"kernel": sd[m + ".weight"].T, "bias": sd[m + ".bias"]}
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(mem)))
    np.testing.assert_allclose(got, want, atol=ATOL)
