"""Train-step tests: DP-mesh execution, optimizer/schedule parity vs torch,
freeze/clip semantics."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import optax

from theia_tpu.models.rvfm import Theia
from theia_tpu.models import vit as jvit
from theia_tpu.parallel.mesh import make_mesh, shard_batch
from theia_tpu.train.optim import (
    constant_with_warmup,
    cosine_restarts_with_warmup,
    make_optimizer,
    no_weight_decay_mask,
    scaled_lr,
)
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_eval_step, make_train_step

TARGETS = {"teacher/a": (24, 16, 16), "teacher/b": (12, 64, 64)}


@pytest.fixture(scope="module")
def tiny_theia():
    orig = jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"]
    jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"] = dataclasses.replace(orig, num_layers=2)
    model = Theia(
        backbone="facebook/deit-tiny-patch16-224",
        translator="lconv",
        target_feature_sizes=TARGETS,
    )
    imgs = jnp.zeros((2, 224, 224, 3), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    yield model, params
    jvit.BACKBONE_CONFIGS["facebook/deit-tiny-patch16-224"] = orig


def _batch(b, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, size=(b, 224, 224, 3), dtype=np.uint8)
    targets = {
        "teacher/a": rng.randn(b, 256, 24).astype(np.float32),
        "teacher/b": rng.randn(b, 4096, 12).astype(np.float32),
    }
    return jnp.asarray(imgs), jax.tree.map(jnp.asarray, targets)


def test_train_step_learns_and_dp_matches_single_device(tiny_theia):
    model, params = tiny_theia
    tx = make_optimizer(1e-3, weight_decay=0.01)

    imgs, targets = _batch(8)

    # single-device
    step1 = make_train_step(model, tx, donate=False)
    s0 = TrainState.create(params, tx)
    s1, m1 = step1(s0, imgs, targets)

    # 8-device DP mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    stepm = make_train_step(model, tx, mesh=mesh, donate=False)
    sm0 = TrainState.create(params, tx)
    sm1, m2 = stepm(sm0, *shard_batch(mesh, (imgs, targets)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # psum reduction order differs from a single full-batch sum; Adam's
    # first-step rsqrt amplifies that — tolerance is numeric, not semantic
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, sm1.params)
    assert max(jax.tree.leaves(diffs)) < 5e-5

    # loss decreases over a few steps on a fixed batch
    s = sm1
    losses = [float(m2["loss"])]
    for _ in range(5):
        s, m = stepm(s, *shard_batch(mesh, (imgs, targets)))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    evalm = make_eval_step(model, mesh=mesh)
    em = evalm(s.params, *shard_batch(mesh, (imgs, targets)))
    assert float(em["loss"]) < losses[0]


def test_loss_masks_affect_gradients(tiny_theia):
    model, params = tiny_theia
    tx = make_optimizer(1e-3)
    step = make_train_step(model, tx, donate=False)
    imgs, targets = _batch(2)
    masks_a = {"teacher/a": jnp.asarray(1.0), "teacher/b": jnp.asarray(0.0)}
    s0 = TrainState.create(params, tx)
    _, m = step(s0, imgs, targets, masks_a)
    # head b must receive zero gradient -> its params unchanged
    s1, _ = step(s0, imgs, targets, masks_a)
    head_b = s1.params["translator_module"]["head_teacher_b"]
    head_b0 = params["translator_module"]["head_teacher_b"]
    assert max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), head_b, head_b0))) == 0.0
    head_a = s1.params["translator_module"]["head_teacher_a"]
    head_a0 = params["translator_module"]["head_teacher_a"]
    assert max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), head_a, head_a0))) > 0.0


def test_freeze_translator(tiny_theia):
    model, params = tiny_theia
    tx = make_optimizer(1e-3)
    step = make_train_step(model, tx, freeze_translator=True, freeze_translator_start_step=0, donate=False)
    imgs, targets = _batch(2)
    s0 = TrainState.create(params, tx)
    s1, _ = step(s0, imgs, targets)
    tr1 = jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                       s1.params["translator_module"], params["translator_module"]))
    bb1 = jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                       s1.params["backbone_module"], params["backbone_module"]))
    assert max(tr1) == 0.0
    assert max(bb1) > 0.0


def test_adamw_matches_torch():
    """5 AdamW steps with identical grads: our masked optax vs torch groups."""
    rng = np.random.RandomState(0)
    w0 = rng.randn(8, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.AdamW(
        [{"params": [tb], "weight_decay": 0.0}, {"params": [tw], "weight_decay": 0.01}],
        lr=1e-3, betas=(0.9, 0.999),
    )

    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = make_optimizer(1e-3, weight_decay=0.01)
    opt_state = tx.init(params)

    for i in range(5):
        gw = rng.randn(8, 4).astype(np.float32)
        gb = rng.randn(4).astype(np.float32)
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        topt.step()
        grads = {"dense": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]), tw.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]), tb.detach().numpy(), atol=1e-6)


def test_schedules_match_torch():
    from torch.optim.lr_scheduler import (
        ConstantLR,
        CosineAnnealingWarmRestarts,
        LinearLR,
        SequentialLR,
    )

    lr = 2e-3
    warm = 10
    t0 = 40

    def torch_lrs(make):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=lr)
        sched = make(opt)
        out = []
        for _ in range(60):
            out.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return np.asarray(out)

    # constant with warmup (lr_schedulers.py:41-77)
    want = torch_lrs(lambda o: SequentialLR(
        o,
        [LinearLR(o, start_factor=1e-2, end_factor=1.0, total_iters=warm), ConstantLR(o, factor=1.0)],
        milestones=[warm],
    ))
    sched = constant_with_warmup(lr, warm)
    got = np.asarray([float(sched(i)) for i in range(60)])
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # cosine restarts with warmup (lr_schedulers.py:8-38)
    want = torch_lrs(lambda o: SequentialLR(
        o,
        [LinearLR(o, start_factor=1e-2, end_factor=1.0, total_iters=warm),
         CosineAnnealingWarmRestarts(o, T_0=t0, T_mult=1)],
        milestones=[warm],
    ))
    sched = cosine_restarts_with_warmup(lr, warm, t0)
    got = np.asarray([float(sched(i)) for i in range(60)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_lr_scaling_rule():
    # train_rvfm.py:299-301
    assert scaled_lr(2e-3, 16, 8) == pytest.approx(2e-3 * (16 * 8) / (64 * 8))


def test_no_weight_decay_mask_semantics():
    params = {
        "backbone_module": {"patch_kernel": jnp.zeros((768, 192)), "patch_bias": jnp.zeros((192,))},
        "translator_module": {
            "head_x": {
                "adapter_0": {"weight": jnp.zeros((20, 14, 14)), "bias": jnp.zeros((20, 14, 14))},
                "adapter_8": {"kernel": jnp.zeros((20, 24)), "bias": jnp.zeros((24,))},
            }
        },
    }
    mask = no_weight_decay_mask(params)
    assert mask["backbone_module"]["patch_kernel"] is True
    assert mask["backbone_module"]["patch_bias"] is False
    # (C,H,W) LayerNorm weight gets decay in the reference (ndim>1, not bias)
    assert mask["translator_module"]["head_x"]["adapter_0"]["weight"] is True
    assert mask["translator_module"]["head_x"]["adapter_0"]["bias"] is False
    assert mask["translator_module"]["head_x"]["adapter_8"]["kernel"] is True
    assert mask["translator_module"]["head_x"]["adapter_8"]["bias"] is False


def test_masked_adamw_matches_torch_skipped_params():
    """Dynamic masking must reproduce torch's skip-grad-less-params semantics:
    a masked leaf keeps params, moments AND its per-leaf step count frozen
    (torch state['step'] is per-parameter)."""
    from theia_tpu.train.optim import make_optimizer

    rng = np.random.RandomState(0)
    a0 = rng.randn(6, 3).astype(np.float32)
    b0 = rng.randn(5, 2).astype(np.float32)

    ta = torch.nn.Parameter(torch.from_numpy(a0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.AdamW([ta, tb], lr=1e-3, betas=(0.9, 0.999), weight_decay=0.01)

    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    tx = make_optimizer(1e-3, weight_decay=0.01)
    opt_state = tx.init(params)

    # b participates only on steps 0, 2, 5
    b_on = [1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
    for i in range(6):
        ga = rng.randn(6, 3).astype(np.float32)
        gb = rng.randn(5, 2).astype(np.float32)
        ta.grad = torch.from_numpy(ga.copy())
        tb.grad = torch.from_numpy(gb.copy()) if b_on[i] else None
        topt.step()
        topt.zero_grad(set_to_none=True)
        grads = {"a": jnp.asarray(ga), "b": jnp.asarray(gb) * b_on[i]}
        mask = {"a": jnp.asarray(1.0), "b": jnp.asarray(b_on[i])}
        updates, opt_state = tx.update(grads, opt_state, params, mask=mask)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-6)
    assert int(opt_state.count["a"]) == 6
    assert int(opt_state.count["b"]) == 3
    assert int(opt_state.sched_count) == 6


def test_loss_masks_freeze_opt_state(tiny_theia):
    """A masked head's Adam moments and per-leaf count must not advance."""
    model, params = tiny_theia
    tx = make_optimizer(1e-3)
    step = make_train_step(model, tx, donate=False)
    imgs, targets = _batch(2)
    masks = {"teacher/a": jnp.asarray(1.0), "teacher/b": jnp.asarray(0.0)}
    s0 = TrainState.create(params, tx)
    s1, _ = step(s0, imgs, targets, masks)
    cnt_b = jax.tree.leaves(s1.opt_state.count["translator_module"]["head_teacher_b"])
    cnt_a = jax.tree.leaves(s1.opt_state.count["translator_module"]["head_teacher_a"])
    assert all(int(c) == 0 for c in cnt_b)
    assert all(int(c) == 1 for c in cnt_a)
    mu_b = jax.tree.leaves(s1.opt_state.mu["translator_module"]["head_teacher_b"])
    assert all(float(jnp.max(jnp.abs(m))) == 0.0 for m in mu_b)


def test_plain_optax_tx_with_freeze_and_masks():
    """A vanilla optax transformation (no masked-optimizer `mask` kwarg)
    must still work with freeze_translator / loss_masks: the mask is then
    applied to the returned updates (weaker moment semantics, documented in
    step.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    targets_spec = {"facebook/sam-vit-huge": (8, 16, 16)}
    model = Theia(
        backbone="facebook/deit-tiny-patch16-224",
        translator="lconv",
        target_feature_sizes=targets_spec,
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (2, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(2, s[1] * s[2], s[0]).astype(np.float32))
        for k, s in targets_spec.items()
    }
    params = model.init(jax.random.PRNGKey(0), images)["params"]
    tx = optax.adamw(1e-3)  # plain optax: update() has no mask kwarg
    step = make_train_step(
        model, tx, main_loss="cos_l1",
        freeze_translator=True, freeze_translator_start_step=0,
    )
    state = TrainState.create(params, tx)
    before = jax.tree.map(np.asarray, params)  # step donates the state
    new_state, metrics = step(state, images, targets)
    assert np.isfinite(float(metrics["loss"]))
    # frozen from step 0: translator params unchanged, backbone trained
    same = jax.tree.map(
        lambda a, b: bool(np.all(a == np.asarray(b))),
        before["translator_module"], new_state.params["translator_module"],
    )
    assert all(jax.tree.leaves(same))
    moved = jax.tree.map(
        lambda a, b: bool(np.any(a != np.asarray(b))),
        before["backbone_module"], new_state.params["backbone_module"],
    )
    assert any(jax.tree.leaves(moved))


def test_bf16_moments_track_f32():
    """moment_dtype=bf16 (VERDICT r3 #1b lever): Adam moments stored bf16,
    update math f32 — trajectories stay within bf16 rounding of f32 AdamW."""
    rng = np.random.RandomState(3)
    w0 = rng.randn(16, 8).astype(np.float32)
    params32 = {"dense": {"kernel": jnp.asarray(w0)}}
    params16 = {"dense": {"kernel": jnp.asarray(w0)}}
    tx32 = make_optimizer(1e-3, weight_decay=0.01)
    tx16 = make_optimizer(1e-3, weight_decay=0.01, moment_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params32), tx16.init(params16)
    assert jax.tree.leaves(s16.mu)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(s16.nu)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(s32.mu)[0].dtype == jnp.float32
    for i in range(30):
        g = {"dense": {"kernel": jnp.asarray(rng.randn(16, 8).astype(np.float32))}}
        u32, s32 = tx32.update(g, s32, params32)
        params32 = optax.apply_updates(params32, u32)
        u16, s16 = tx16.update(g, s16, params16)
        params16 = optax.apply_updates(params16, u16)
    d32 = np.asarray(params32["dense"]["kernel"]) - w0
    d16 = np.asarray(params16["dense"]["kernel"]) - w0
    # per-step updates are O(lr); bf16 moment rounding perturbs the Adam
    # direction by O(2^-9) relative — parameter deltas agree to ~1%
    assert np.abs(d16 - d32).max() / np.abs(d32).max() < 0.05


def test_train_step_loss_dtype_bf16(tiny_theia):
    """loss_dtype=bf16 end-to-end: same step semantics, loss within bf16
    rounding of the f32-loss step, and training still reduces the loss."""
    model, params = tiny_theia
    imgs, targets = _batch(4)
    tx = make_optimizer(constant_with_warmup(1e-3, 10), weight_decay=0.01)
    # donate=False: both states alias the same param buffers; donation in
    # step32 would delete the arrays st16 still references
    step32 = make_train_step(model, tx, main_loss="cos_l1", donate=False)
    step16 = make_train_step(
        model, tx, main_loss="cos_l1", loss_dtype=jnp.bfloat16, donate=False
    )
    st32 = TrainState.create(params, tx)
    st16 = TrainState.create(params, tx)
    st32_1, m32 = step32(st32, imgs, targets)
    st16_1, m16 = step16(st16, imgs, targets)
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=2e-2)
    # a few more steps: loss must decrease under the bf16-loss gradients too
    st, prev = st16_1, float(m16["loss"])
    for _ in range(5):
        st, m = step16(st, imgs, targets)
    assert float(m["loss"]) < prev


@pytest.mark.slow
def test_bf16_grad_allreduce_tracks_f32(tiny_theia):
    """grad_allreduce_dtype=bfloat16 must (a) put EXACTLY ONE bf16 bucket
    all-reduce of n_params elements on the wire — no residual f32 grad
    all-reduces (shard_map's autodiff auto-psum is disabled; the DDP-bucket
    analogue halves the reference's 4 B/param NCCL traffic,
    train_rvfm.py:258) — and (b) keep the loss trajectory on the f32-wire
    trajectory over 100 steps (VERDICT r4 #5).

    The wire-dtype assertion reads the LOWERED program: the bf16 operand
    dtype is what a bf16-native interconnect (TPU ICI) moves. XLA:CPU's
    AllReducePromotion then rewrites it to convert->f32-all-reduce->convert
    in the backend, so the CPU-compiled HLO cannot show the halving."""
    import re

    model, params = tiny_theia
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    imgs, targets = _batch(8)
    sharded = shard_batch(mesh, (imgs, targets))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    trajs = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        tx = make_optimizer(1e-3, weight_decay=0.01)
        step = make_train_step(
            model, tx, mesh=mesh, donate=False, grad_allreduce_dtype=dt
        )
        if dt is not None:
            txt = step._jitted.lower(TrainState.create(params, tx), *sharded, None).as_text()
            ar_types = re.findall(r"\}\) : \(tensor<([^>]+)>\) -> tensor<[^>]+>", txt)
            big = [t for t in ar_types if not t.startswith("f32") and "x" in t]
            assert big == [f"{n_params}xbf16"], (big, n_params)
            # everything else on the wire is scalar metrics pmeans
            assert all(t == "f32" for t in ar_types if t not in big), ar_types
        s = TrainState.create(params, tx)
        losses = []
        for _ in range(100):
            s, m = step(s, *sharded)
            losses.append(float(m["loss"]))
        trajs[name] = np.asarray(losses)

    # (b) trajectory parity: same descent, point-wise within a few percent
    np.testing.assert_allclose(trajs["bf16"], trajs["f32"], rtol=5e-2, atol=1e-3)
    assert trajs["bf16"][-1] < trajs["bf16"][0]
    assert trajs["f32"][-1] < trajs["f32"][0]
