"""Data-plane tests: shard round trip, key-join, mixing, batching."""

import numpy as np
import pytest

from theia_tpu.data.dataset import (
    RandomMix,
    get_frame_dataloader,
    get_image_video_dataset,
    normalize_ds_weights_by_ds_len,
    pad_shard_paths,
)
from theia_tpu.data.stats import BFLOAT16, load_feature_stats, normalize_feature
from theia_tpu.data.synthetic import generate_synthetic_dataset
from theia_tpu.data.webdataset import (
    ShardWriter,
    check_existing_shard,
    encode_image_npy,
    iter_samples,
    save_safetensors_np,
    load_safetensors_np,
    decode_image_npy,
)

MODELS = {
    "facebook/dinov2-large": (32, 16, 16),
    "facebook/sam-vit-huge": (16, 64, 64),
}


def test_shard_round_trip(tmp_path):
    path = str(tmp_path / "x-000000-train.tar")
    img = np.random.RandomState(0).randint(0, 256, (224, 224, 3), np.uint8)
    feat = np.random.RandomState(1).randn(8, 4, 4).astype(np.float32)
    with ShardWriter(path) as w:
        w.write("k0.image", encode_image_npy(img))
        w.write("k0.m.safetensors", save_safetensors_np({"embedding": feat}))
        w.write("k1.image", encode_image_npy(img[::-1].copy()))
    samples = list(iter_samples(path))
    assert [k for k, _ in samples] == ["k0", "k1"]
    np.testing.assert_array_equal(decode_image_npy(samples[0][1]["image"]), img)
    got = load_safetensors_np(samples[0][1]["m.safetensors"])["embedding"]
    np.testing.assert_array_equal(got, feat)

    ok, counts = check_existing_shard(path, ["image", "safetensors"])
    assert ok == 1 and counts["image"] == 2 and counts["safetensors"] == 1
    ok, _ = check_existing_shard(str(tmp_path / "missing.tar"), ["image"])
    assert ok == 0


def test_safetensors_codec_matches_official_torch():
    """Our native codec must interop with the official safetensors library
    (the reference writes bf16 via safetensors.torch)."""
    import torch
    from safetensors.torch import load as st_load, save as st_save

    import ml_dtypes

    feats = {
        "embedding": np.random.RandomState(0).randn(8, 4, 4).astype(np.float32).astype(ml_dtypes.bfloat16),
        "cls_token": np.random.RandomState(1).randn(8).astype(np.float32),
    }
    # ours -> official torch load
    blob = save_safetensors_np(feats)
    t = st_load(blob)
    assert t["embedding"].dtype == torch.bfloat16
    np.testing.assert_array_equal(
        t["embedding"].float().numpy(), np.asarray(feats["embedding"], np.float32)
    )
    # official torch save -> ours
    blob2 = st_save({k: torch.from_numpy(np.asarray(v, np.float32)).to(
        torch.bfloat16 if k == "embedding" else torch.float32) for k, v in feats.items()})
    back = load_safetensors_np(blob2)
    assert back["embedding"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(back["embedding"], np.float32), np.asarray(feats["embedding"], np.float32)
    )


def test_decode_image_gray_and_rgba():
    gray = np.random.RandomState(0).randint(0, 256, (8, 8), np.uint8)
    out = decode_image_npy(encode_image_npy(gray))
    assert out.shape == (8, 8, 3)
    rgba = np.random.RandomState(1).randint(0, 256, (8, 8, 4), np.uint8)
    out = decode_image_npy(encode_image_npy(rgba))
    assert out.shape == (8, 8, 3)


def test_pad_shard_paths():
    assert pad_shard_paths(["a", "b", "c"], 2) == ["a", "b", "c", "a"]
    assert pad_shard_paths(["a"], 4) == ["a", "a", "a", "a"]
    assert pad_shard_paths(["a", "b"], 2) == ["a", "b"]
    assert len(pad_shard_paths(["a", "b", "c"], 8)) == 8


def test_normalize_ds_weights():
    w, total = normalize_ds_weights_by_ds_len([1.0, 2.0], [100, 50])
    assert total == 200
    assert w == [0.5, 0.5]
    with pytest.raises(ValueError):
        normalize_ds_weights_by_ds_len([1.0], [0])


def test_random_mix_respects_probs_and_exhaustion():
    a = [("a", i) for i in range(50)]
    b = [("b", i) for i in range(10)]
    mix = list(RandomMix([a, b], probs=[0.8, 0.2], seed=0))
    assert len(mix) == 60  # all_exhausted: every sample seen
    assert [x for x in mix if x[0] == "b"][:1]  # b present

    first = list(RandomMix([a, b], probs=[0.5, 0.5], stopping_strategy="first_exhausted", seed=0))
    assert len(first) < 60


def test_end_to_end_dataset_and_loader(tmp_path):
    root = str(tmp_path)
    generate_synthetic_dataset(root, feature_models=MODELS, n_train=24, n_val=8, samples_per_shard=8)

    ds, expected = get_image_video_dataset(
        dataset_root=root,
        feature_models=list(MODELS),
        dataset_mix=["imagenet"],
        split="train",
        feature_norm=True,
        stats_root=root,
        seed=0,
        shuffle=True,
    )
    assert expected == 24
    loader = get_frame_dataloader(ds, batch_size=4, shuffle=True, shuffle_buffer_size=8, seed=0)
    batches = list(loader)
    assert len(batches) == 6
    b = batches[0]
    assert b["image"].shape == (4, 224, 224, 3) and b["image"].dtype == np.uint8
    emb = b["facebook/dinov2-large"]["embedding"]
    assert emb.shape == (4, 256, 32) and emb.dtype == BFLOAT16
    assert b["facebook/dinov2-large"]["cls"].shape == (4, 32)
    assert b["facebook/sam-vit-huge"]["embedding"].shape == (4, 4096, 16)


def test_rank_splitting_disjoint(tmp_path):
    root = str(tmp_path)
    generate_synthetic_dataset(root, feature_models=MODELS, n_train=32, n_val=8, samples_per_shard=8)

    def keys_for(rank, world):
        ds, _ = get_image_video_dataset(
            dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
            split="train", rank=rank, world_size=world, seed=0,
        )
        return [tuple(s["image"][0, :4, 0]) for s in ds]

    k0 = keys_for(0, 2)
    k1 = keys_for(1, 2)
    assert len(k0) == len(k1) == 16
    assert set(map(tuple, k0)).isdisjoint(set(map(tuple, k1)))


def test_misaligned_columns_raise(tmp_path):
    root = str(tmp_path)
    generate_synthetic_dataset(root, feature_models={"m/a": (8, 4, 4)}, n_train=8, n_val=2, samples_per_shard=8)
    # corrupt the feature shard: rewrite with wrong keys
    import glob as g

    fshard = g.glob(str(tmp_path / "imagenet" / "m_a" / "*-train.tar"))[0]
    feat = np.zeros((8, 4, 4), np.float32)
    with ShardWriter(fshard) as w:
        for i in range(8):
            w.write(f"WRONG_{i}.m_a.safetensors", save_safetensors_np({"embedding": feat}))
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=["m/a"], dataset_mix=["imagenet"], split="train", seed=0
    )
    with pytest.raises(ValueError, match="misalignment"):
        next(iter(ds))


def test_feature_stats_round_trip(tmp_path):
    root = str(tmp_path)
    c = 16
    np.save(tmp_path / "imagenet_mean_m_a.npy", np.full(c, 2.0, np.float32))
    np.save(tmp_path / "imagenet_var_m_a.npy", np.full(c, 4.0, np.float32))
    means, stds = load_feature_stats(root, ["m/a"])
    x = np.ones((3, c), BFLOAT16)
    out = normalize_feature(x, means["m/a"], stds["m/a"])
    np.testing.assert_allclose(np.asarray(out, np.float32), -0.25)


def test_loader_is_reiterable(tmp_path):
    """iter(loader) after exhaustion must start a fresh pass — the train loop
    re-iterates at epoch boundaries when yielded batches < epoch steps."""
    root = str(tmp_path)
    generate_synthetic_dataset(root, feature_models=MODELS, n_train=8, n_val=2, samples_per_shard=8)
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", seed=0,
    )
    loader = get_frame_dataloader(ds, batch_size=3, drop_last=True)
    assert len(list(loader)) == 2
    assert len(list(loader)) == 2  # fresh pass, not an exhausted generator

    # the exact loop.py epoch-boundary pattern: more steps than one pass yields
    it = iter(loader)
    got = 0
    for _ in range(5):
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            next(it)
        got += 1
    assert got == 5


def test_decode_feature_missing_member_raises(tmp_path):
    """A packed shard missing the wanted per-teacher member must raise, not
    silently fall back to any .safetensors field."""
    from theia_tpu.data.dataset import _decode_feature

    feat = np.zeros((4, 2, 2), np.float32)
    fields = {
        "other_model.safetensors": save_safetensors_np({"embedding": feat}),
        "image": encode_image_npy(np.zeros((4, 4, 3), np.uint8)),
    }
    with pytest.raises(KeyError, match="wanted_model"):
        _decode_feature(fields, None, None, model="wanted/model".replace("/", "_"))
    # exact member present -> fine
    fields["wanted_model.safetensors"] = save_safetensors_np({"embedding": feat})
    out = _decode_feature(fields, None, None, model="wanted/model")
    assert out["embedding"].shape == (4, 4)


def test_worker_split_and_parallel_loader(tmp_path):
    """.split(n) partitions shards disjointly; ParallelSampleSource yields the
    same sample multiset as the single-process path."""
    from theia_tpu.data.parallel_loader import ParallelSampleSource

    root = str(tmp_path)
    generate_synthetic_dataset(root, feature_models=MODELS, n_train=32, n_val=2, samples_per_shard=8)
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", seed=0,
    )

    def sig(sample):
        return bytes(sample["image"][:2, :8, 0].tobytes())

    base = sorted(sig(s) for s in ds)
    assert len(base) == 32

    parts = ds.split(3)
    split_sigs = sorted(sig(s) for p in parts for s in p)
    assert split_sigs == base

    par = ParallelSampleSource(ds, num_workers=2)
    par_sigs = sorted(sig(s) for s in par)
    assert par_sigs == base
    # re-iterable (fresh worker set per pass)
    assert sorted(sig(s) for s in par) == base

    # as-completed merge (no head-of-line blocking): same sample multiset
    unordered = ParallelSampleSource(ds, num_workers=2, ordered=False)
    assert sorted(sig(s) for s in unordered) == base

    # num_workers wiring through the public loader API
    loader = get_frame_dataloader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == 32


def test_shm_transport_matches_queue(tmp_path):
    """transport="shm" (per-worker shared-memory ring, VERDICT r4 #6) must
    yield byte-identical sample CONTENT to the serial path — full arrays
    compared, not just signatures — including the oversized-sample pickle
    fallback and ring-slot reuse (more samples than slots)."""
    from theia_tpu.data.parallel_loader import ParallelSampleSource

    root = str(tmp_path)
    generate_synthetic_dataset(
        root, feature_models=MODELS, n_train=24, n_val=2, samples_per_shard=6
    )
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", seed=0,
    )

    def canon(sample):
        # key the full byte content of every array leaf
        flat = []
        for k in sorted(sample):
            v = sample[k]
            if isinstance(v, dict):
                for kk in sorted(v):
                    flat.append((k, kk, v[kk].tobytes(), str(v[kk].dtype), v[kk].shape))
            elif hasattr(v, "tobytes"):
                flat.append((k, v.tobytes(), str(v.dtype), v.shape))
            else:
                flat.append((k, v))
        return repr(flat)

    base = sorted(canon(s) for s in ds)
    assert len(base) == 24

    # queue_depth=2 forces slot reuse; both merge orders
    for ordered in (True, False):
        par = ParallelSampleSource(
            ds, num_workers=2, transport="shm", queue_depth=2, ordered=ordered
        )
        assert sorted(canon(s) for s in par) == base

    # oversized samples (slot smaller than a sample) take the pickle
    # fallback transparently
    tiny_slots = ParallelSampleSource(
        ds, num_workers=2, transport="shm", slot_bytes=1024
    )
    assert sorted(canon(s) for s in tiny_slots) == base


def test_gather_shape_mismatch_raises():
    """The native-collate path must reject mixed shapes/dtypes loudly (the
    C memcpy would otherwise read past the smaller source buffer)."""
    import numpy as np
    import pytest as _pytest

    from theia_tpu.data.fastpack import gather

    ok = gather([np.ones((4, 4), np.float32)] * 3)
    assert ok.shape == (3, 4, 4)
    with _pytest.raises(ValueError, match="sample 1"):
        gather([np.ones((64, 64), np.uint8), np.ones((64, 63), np.uint8)])
    with _pytest.raises(ValueError, match="dtype"):
        gather([np.ones((64, 64), np.uint8), np.ones((64, 64), np.int16)])


def test_batched_loader_closes_abandoned_pass():
    """Re-iterating the loader mid-pass must close the previous pass's
    source generator (the train loop abandons the iterator every epoch; an
    unclosed source leaks loader worker processes per epoch)."""
    import time

    import numpy as np

    from theia_tpu.data.dataset import _BatchedLoader

    state = {"closed": 0}

    class Source:
        def __iter__(self):
            try:
                for i in range(1000):
                    yield {"image": np.full((2, 2), i, np.uint8)}
            finally:
                state["closed"] += 1

    loader = _BatchedLoader(Source(), batch_size=4, drop_last=True, prefetch=2)
    it = iter(loader)
    next(it)  # mid-pass
    it2 = iter(loader)  # new epoch: must close the abandoned pass
    for _ in range(20):
        if state["closed"] >= 1:
            break
        time.sleep(0.05)
    assert state["closed"] == 1
    next(it2)
    # full exhaustion also closes
    for _ in it2:
        pass
    for _ in range(20):
        if state["closed"] >= 2:
            break
        time.sleep(0.05)
    assert state["closed"] == 2


def test_closed_prefetch_iter_raises_not_hangs():
    """__next__ on an iterator whose pass was closed (e.g. a stale handle
    held across an epoch boundary) must terminate, not block forever on a
    queue that will never receive its sentinel."""
    import numpy as np
    import pytest

    from theia_tpu.data.dataset import _BatchedLoader

    def source():
        for i in range(1000):
            yield {"image": np.full((2, 2), i, np.uint8)}

    class Src:
        def __iter__(self):
            return source()

    loader = _BatchedLoader(Src(), batch_size=4, drop_last=True, prefetch=2)
    it = iter(loader)
    next(it)
    iter(loader)  # closes `it`'s pass
    with pytest.raises(StopIteration):
        next(it)


def test_unbound_loader_keeps_tail_batches():
    """A loader the caller never binds (``for b in get_frame_dataloader(...)``
    or ``next(iter(...))``) must deliver every batch: before the owner
    backref, the loader hit refcount 0 on the producer thread the moment
    the batches generator finished, and its __del__'s close() drained the
    still-unconsumed prefetch queue — silently losing the tail of the pass
    or deadlocking a consumer already blocked in q.get()."""
    import time

    import numpy as np

    from theia_tpu.data.dataset import get_frame_dataloader

    src = [{"image": np.zeros(3, np.uint8)} for _ in range(8)]
    it = iter(get_frame_dataloader(src, batch_size=2, drop_last=False, prefetch=8))
    time.sleep(0.5)  # let the producer exhaust the source
    assert len(list(it)) == 4

    seen = 0
    for _ in get_frame_dataloader(src, batch_size=2, drop_last=False, prefetch=8):
        time.sleep(0.05)
        seen += 1
    assert seen == 4


class _SleepPartDataset:
    """Splittable synthetic dataset whose 'decode' is an IO-like sleep —
    models tar-read/decode latency without CPU so worker overlap is
    measurable even on a 1-core host (VERDICT r3 #7 fallback)."""

    def __init__(self, parts):
        self.parts = parts  # list (one per worker) of [(id, delay_s), ...]

    def split(self, n):
        assert n == len(self.parts)
        return [_SleepPartDataset([p]) for p in self.parts]

    def __iter__(self):
        import time as _t

        (part,) = self.parts
        for ident, delay in part:
            _t.sleep(delay)
            yield {"id": ident}


def test_unordered_merge_overlaps_workers():
    """ordered=False merge semantics under load (the thing the 1-core
    throughput tables can't show, PERFORMANCE.md input-pipeline section):
    (a) a slow worker must not head-of-line-block a fast worker — the fast
    worker's whole stream arrives while the slow worker is still decoding;
    (b) two IO-bound workers overlap: wall clock ~= max(worker times), not
    the sum (the reason num_workers>0 pays off on multi-core TPU hosts)."""
    import time

    from theia_tpu.data.parallel_loader import ParallelSampleSource

    fast = [(f"fast{i}", 0.0) for i in range(8)]
    slow = [("slow0", 0.8), ("slow1", 0.8)]
    src = ParallelSampleSource(
        _SleepPartDataset([fast, slow]), num_workers=2, ordered=False,
        mp_context="fork",
    )
    order = [s["id"] for s in src]
    assert sorted(order) == sorted(x[0] for x in fast + slow)
    # all fast samples complete by ~0s; the first slow sample at 0.8s —
    # an as-completed merge yields every fast id before the LAST slow id,
    # and (with huge margin) most fast ids before the FIRST slow one
    assert order.index("slow1") > max(order.index(f"fast{i}") for i in range(8))
    assert sum(1 for x in order[: order.index("slow0")] if x.startswith("fast")) >= 6

    # (b) overlap: each worker sleeps 4 x 0.3s = 1.2s; serial would be 2.4s.
    # Worker fork/startup under a loaded pytest process can cost ~1s on the
    # 1-core host, so the clock starts only once BOTH workers have yielded
    # their zero-delay start marker — the measured window is pure decode.
    parts = [
        [(f"w{w}start", 0.0)] + [(f"w{w}s{i}", 0.3) for i in range(4)]
        for w in range(2)
    ]
    src = ParallelSampleSource(
        _SleepPartDataset(parts), num_workers=2, ordered=False, mp_context="fork"
    )
    got, t_both_started = [], None
    for s in src:
        got.append(s["id"])
        if t_both_started is None and {"w0start", "w1start"} <= set(got):
            t_both_started = time.perf_counter()
    wall = time.perf_counter() - t_both_started
    assert len(got) == 10
    assert wall < 2.0, f"workers did not overlap: wall={wall:.2f}s vs 2.4s serial"


class _DyingDataset:
    """Worker-side crash simulator: the child dies without a sentinel."""

    def split(self, n):
        return [_DyingDataset() for _ in range(n)]

    def __iter__(self):
        import os

        os._exit(1)
        yield  # pragma: no cover


def test_dead_worker_raises_not_hangs():
    """A worker that dies before sending its sentinel (e.g. spawn bootstrap
    failure) must surface as a RuntimeError within seconds — the round-5
    regression fix for the parent blocking forever on queue.get()."""
    import pytest as _pytest

    from theia_tpu.data.parallel_loader import ParallelSampleSource

    par = ParallelSampleSource(_DyingDataset(), num_workers=2, transport="queue")
    with _pytest.raises(RuntimeError, match="died"):
        list(par)


def test_shm_allocation_failure_falls_back_to_queue(monkeypatch, tmp_path):
    """If /dev/shm cannot hold the rings, the shm transport must degrade to
    the pickle/queue path with a warning — same samples, no crash."""
    import warnings

    import multiprocessing.shared_memory as shared_memory

    from theia_tpu.data.parallel_loader import ParallelSampleSource

    root = str(tmp_path)
    generate_synthetic_dataset(
        root, feature_models=MODELS, n_train=8, n_val=2, samples_per_shard=4
    )
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", seed=0,
    )
    base = sorted(bytes(s["image"][:2, :8, 0].tobytes()) for s in ds)

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(shared_memory, "SharedMemory", boom)
    par = ParallelSampleSource(ds, num_workers=2, transport="shm")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = sorted(bytes(s["image"][:2, :8, 0].tobytes()) for s in par)
    assert got == base
    assert any("fall back" in str(x.message) for x in w)


class _CleanExitDataset:
    """Worker exits 0 mid-iteration WITHOUT a sentinel (sys.exit in a lib)."""

    def split(self, n):
        return [_CleanExitDataset() for _ in range(n)]

    def __iter__(self):
        import os

        os._exit(0)
        yield  # pragma: no cover


def test_exit_zero_worker_raises_not_hangs():
    """exit code 0 without a sentinel must ALSO raise (the first fix only
    caught nonzero exit codes, so sys.exit(0) inside a dataset iterator
    spun the parent forever)."""
    import pytest as _pytest

    from theia_tpu.data.parallel_loader import ParallelSampleSource

    par = ParallelSampleSource(_CleanExitDataset(), num_workers=2, transport="queue")
    with _pytest.raises(RuntimeError, match="died"):
        list(par)


def test_shm_statvfs_guard_falls_back(monkeypatch, tmp_path):
    """tmpfs allocates lazily, so an undersized /dev/shm passes
    SharedMemory(create=True) and SIGBUSes on the first ring write — the
    statvfs pre-check must catch it and degrade to the queue transport."""
    import collections
    import os
    import warnings

    from theia_tpu.data import parallel_loader as pl

    root = str(tmp_path)
    generate_synthetic_dataset(
        root, feature_models=MODELS, n_train=8, n_val=2, samples_per_shard=4
    )
    ds, _ = get_image_video_dataset(
        dataset_root=root, feature_models=list(MODELS), dataset_mix=["imagenet"],
        split="train", seed=0,
    )
    base = sorted(bytes(s["image"][:2, :8, 0].tobytes()) for s in ds)

    fake = collections.namedtuple("statvfs", "f_bavail f_frsize")(16, 4096)  # 64 KB free
    real_statvfs = os.statvfs
    monkeypatch.setattr(
        os, "statvfs",
        lambda p: fake if p == "/dev/shm" else real_statvfs(p),
    )
    par = pl.ParallelSampleSource(ds, num_workers=2, transport="shm")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = sorted(bytes(s["image"][:2, :8, 0].tobytes()) for s in par)
    assert got == base
    assert any("fall back" in str(x.message) for x in w)


class _ScalarLeafDataset:
    """Samples with a 0-d label leaf (shape () must survive the shm ring)."""

    def split(self, n):
        return [_ScalarLeafDataset() for _ in range(n)]

    def __iter__(self):
        for i in range(4):
            yield {"x": np.full((8,), i, np.float32), "label": np.array(float(i))}


def test_shm_preserves_zero_d_leaves():
    from theia_tpu.data.parallel_loader import ParallelSampleSource

    par = ParallelSampleSource(_ScalarLeafDataset(), num_workers=2, transport="shm")
    for s in par:
        assert s["label"].shape == (), s["label"].shape
        assert float(s["label"]) == float(s["x"][0])
