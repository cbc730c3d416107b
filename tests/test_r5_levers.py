"""Equivalence tests for the round-5 perf-probe levers.

Each lever is a pure layout/tiling re-phrasing that must leave model
numerics unchanged (PERFORMANCE.md measurement discipline: prove the
equivalence on CPU once, then A/B only speed on the chip):
  - adapter_heads.LADDER_PAD: 31x31 ladder intermediate padded to 32x32.
  - vit.ATTN_LAYOUT "merged_batch" / "dpad128": attention matmul repacks.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def _grads_match(g0, g1, atol, rtol=3e-5):
    # rtol covers f32 accumulation-order noise: the re-phrased programs fuse
    # reductions in a different order, so large grad sums differ at ~1e-6
    # relative even when every product is identical
    for (p0, a0), (p1, a1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        assert str(p0) == str(p1)
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a0), atol=atol, rtol=rtol, err_msg=str(p0)
        )


@pytest.mark.parametrize("mode,tol", [("pre_convt2", 1e-6), ("full", 1e-5)])
def test_ladder_pad_equivalence(monkeypatch, mode, tol):
    """LADDER_PAD pads the 16->64 ladder's 31x31 intermediate to 32x32;
    outputs, param grads and the param TREE must match the reference
    geometry ("pre_convt2" only adds zero products; "full" changes the LN
    stats' reduction order only)."""
    from theia_tpu.models import adapter_heads as ah

    head = ah.LightConvAdapterHead(source_size=(24, 16, 16), target_size=(16, 64, 64))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 257, 24).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)

    def loss(v):
        out = head.apply(v, x)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape))), out

    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params)
    monkeypatch.setattr(ah, "LADDER_PAD", mode)
    params_p = head.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params_p) == jax.tree_util.tree_structure(params)
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params)

    assert out1.shape == out0.shape == (2, 64 * 64, 16)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=tol)
    _grads_match(g0, g1, atol=1e-4)


@pytest.mark.parametrize("layout", ["merged_batch", "dpad128"])
def test_attn_layout_equivalence(monkeypatch, layout):
    """The probe attention layouts are matmul repacks of bhqd_fused: same
    products, different batching/padding — outputs and grads must match."""
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.vit import ViTBackbone, ViTBackboneConfig

    cfg = ViTBackboneConfig(
        hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128, fast_math=True
    )
    backbone = ViTBackbone(cfg)
    imgs = (np.random.RandomState(3).rand(2, 224, 224, 3) * 255).astype(np.uint8)
    variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(imgs))

    def loss(v):
        out = backbone.apply(v, jnp.asarray(imgs))
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape))), out

    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(variables)
    monkeypatch.setattr(jvit, "ATTN_LAYOUT", layout)
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(variables)

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=1e-5)
    _grads_match(g0, g1, atol=1e-4)
