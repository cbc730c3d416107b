"""Serving predictor: bucketed static shapes + pipelined streaming."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theia_tpu.models import vit as jvit
from theia_tpu.models.rvfm import Theia
from theia_tpu.serving import Predictor

TARGETS = {"facebook/dinov2-large": (1024, 16, 16)}


@pytest.fixture()
def model_and_params():
    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)
        x = jnp.zeros((1, 224, 224, 3), jnp.uint8)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        yield model, params
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def _images(n, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (n, 224, 224, 3), np.uint8)


def test_bucketed_matches_direct(model_and_params):
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2, 4))
    direct = jax.jit(lambda p, x: model.apply({"params": p}, x, method=model.forward_feature))
    for n in (1, 2, 3, 4):  # under, exact, between, top bucket
        imgs = _images(n, seed=n)
        got = pred(imgs)
        want = np.asarray(direct(params, jnp.asarray(imgs)))
        assert got.shape[0] == n
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_oversized_batch_chunks(model_and_params):
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2, 4))
    imgs = _images(9)  # 4 + 4 + 1(padded to 2)
    got = pred(imgs)
    direct = jax.jit(lambda p, x: model.apply({"params": p}, x, method=model.forward_feature))
    np.testing.assert_allclose(got, np.asarray(direct(params, jnp.asarray(imgs))), atol=1e-5)


def test_predict_dict_method(model_and_params):
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2,), method="predict")
    out = pred(_images(1))
    assert set(out) == set(TARGETS)
    assert out["facebook/dinov2-large"].shape[0] == 1


def test_stream_order_and_values(model_and_params):
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2, 4))
    batches = [_images(n, seed=10 + n) for n in (1, 4, 3)]
    streamed = list(pred.predict_stream(iter(batches)))
    assert [s.shape[0] for s in streamed] == [1, 4, 3]
    for imgs, got in zip(batches, streamed):
        np.testing.assert_allclose(got, pred(imgs), atol=1e-5)


def test_multichip_dp_serving(model_and_params):
    """Data-parallel serving over the 8-device mesh: buckets rounded up to
    the data-axis size, inputs really sharded, outputs equal single-device."""
    from theia_tpu.parallel.mesh import make_mesh

    model, params = model_and_params
    mesh = make_mesh()  # 8 virtual CPU devices, pure DP
    pred = Predictor(model, params, buckets=(2, 4), mesh=mesh)
    # 2 and 4 don't divide 8 -> both round up to one 8-bucket
    assert pred._buckets == (8,)

    seen = []
    orig = pred._fn
    pred._fn = lambda p, x: (seen.append(x.sharding), orig(p, x))[1]

    ref = Predictor(model, params, buckets=(2, 4))
    for n in (1, 8, 11):  # pad, exact, chunked
        imgs = _images(n, seed=20 + n)
        got = pred(imgs)
        assert got.shape[0] == n
        np.testing.assert_allclose(got, ref(imgs), atol=1e-5)
    def axes(spec):
        out = []
        for el in tuple(spec):
            out.extend(el if isinstance(el, tuple) else (el,))
        return out

    assert all("data" in axes(s.spec) for s in seen), seen

    batches = [_images(n, seed=30 + n) for n in (3, 8, 1)]
    streamed = list(pred.predict_stream(iter(batches)))
    assert [s.shape[0] for s in streamed] == [3, 8, 1]
    for imgs, got in zip(batches, streamed):
        np.testing.assert_allclose(got, ref(imgs), atol=1e-5)


def test_stream_depth_keeps_batches_in_flight(model_and_params):
    """predict_stream must not read back until the pipeline is full: with
    depth=2, the first result may only be demanded after batch 3 enters."""
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2,), depth=2)
    events = []

    def gen():
        for i, n in enumerate((1, 2, 2, 1)):
            events.append(("in", i))
            yield _images(n, seed=40 + i)

    for j, out in enumerate(pred.predict_stream(gen())):
        events.append(("out", j))
    # batches 0,1,2 are staged/dispatched before result 0 is read back
    assert events.index(("out", 0)) > events.index(("in", 2))
    assert [e for e in events if e[0] == "out"] == [("out", j) for j in range(4)]


def test_stream_oversized_batch_chunks(model_and_params):
    """Oversized stream batches must be chunked by the top bucket (static-
    shape guarantee) and reassembled, not dispatched at their raw size."""
    model, params = model_and_params
    pred = Predictor(model, params, buckets=(2, 4))
    seen: list[int] = []
    orig = pred._fn

    def spy(p, x):
        seen.append(x.shape[0])
        return orig(p, x)

    pred._fn = spy
    batches = [_images(9, seed=1), _images(2, seed=2)]
    streamed = list(pred.predict_stream(iter(batches)))
    assert [s.shape[0] for s in streamed] == [9, 2]
    assert set(seen) <= {2, 4}, f"non-bucket shapes dispatched: {seen}"
    for imgs, got in zip(batches, streamed):
        np.testing.assert_allclose(got, pred(imgs), atol=1e-5)


def test_dp_serving_accepts_any_axis_names(model_and_params):
    """Predictor must shard over whatever the mesh's non-'model' axes are
    called, not a hard-coded 'data' (round-3 review finding)."""
    import jax
    from jax.sharding import Mesh

    model, params = model_and_params
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("replica", "shard"))
    pred = Predictor(model, params, buckets=(4,), mesh=mesh)
    assert pred._buckets == (8,)
    imgs = _images(5, seed=77)
    ref = Predictor(model, params, buckets=(4,))
    np.testing.assert_allclose(pred(imgs), ref(imgs), atol=1e-5)

    with pytest.raises(ValueError, match="no non-'model' axis"):
        Predictor(model, params, mesh=Mesh(np.asarray(jax.devices()).reshape(8), ("model",)))


def test_bf16_readback(model_and_params):
    """out_dtype=bfloat16 halves D2H bytes; host sees float32 within bf16
    rounding of the exact result (round-3: serve stream is wire-bound)."""
    import jax.numpy as jnp

    model, params = model_and_params
    exact = Predictor(model, params, buckets=(2,))
    narrow = Predictor(model, params, buckets=(2,), out_dtype=jnp.bfloat16)
    imgs = _images(3, seed=5)
    want = exact(imgs)
    got = narrow(imgs)
    assert got.dtype == np.float32
    # bf16 has an 8-bit mantissa: relative error bounded by ~2^-8
    np.testing.assert_allclose(got, want, rtol=2 ** -7, atol=2 ** -7)
    # streaming path honors it too
    (s,) = list(narrow.predict_stream(iter([imgs])))
    np.testing.assert_allclose(s, got, atol=0)
