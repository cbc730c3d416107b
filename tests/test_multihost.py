"""Two-process jax.distributed test: the multi-host DP path on CPU.

Spawns two real processes that rendezvous via jax.distributed.initialize,
build a global 2-device mesh, assemble a global batch with
make_global_batch, and run one global-mean computation — validating the
multi-host machinery the TPU pod path uses (SURVEY.md §2.8).
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2  # global view

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from theia_tpu.parallel.distributed import make_global_batch

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), ("data", "model"))
    # each process contributes a distinct local batch
    local = np.full((4, 8), float(pid), np.float32)
    global_batch = make_global_batch(mesh, local)
    assert global_batch.shape == (8, 8)

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    m = float(global_mean(global_batch))
    assert abs(m - 0.5) < 1e-6, m  # mean of zeros and ones across hosts
    print(f"proc {pid} ok global_mean={m}", flush=True)
    """
)


def test_two_process_distributed_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out


TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    from jax.sharding import Mesh
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.parallel.distributed import make_global_batch
    from theia_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from theia_tpu.train.optim import make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    name = "facebook/deit-tiny-patch16-224"
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(
        jvit.BACKBONE_CONFIGS[name], num_layers=2)
    TARGETS = {"teacher/a": (24, 16, 16)}
    model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), ("data", "model"))
    tx = make_optimizer(1e-3, weight_decay=0.01)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3), jnp.uint8))["params"]
    state = TrainState.create(params, tx)
    from theia_tpu.parallel.mesh import replicated
    state = jax.device_put(state, replicated(mesh))
    step_fn = make_train_step(model, tx, mesh=mesh, donate=False)

    losses = []
    for it in range(2):
        # per-host local data; host h sees a disjoint slice of the global batch
        rng = np.random.RandomState(100 * it + pid)
        imgs = rng.randint(0, 256, (2, 224, 224, 3), np.uint8)
        tgt = {"teacher/a": rng.randn(2, 256, 24).astype(np.float32)}
        gi, gt = make_global_batch(mesh, (imgs, tgt))
        assert gi.shape[0] == 4  # global batch = 2 hosts x 2
        state, metrics = step_fn(state, gi, gt)
        losses.append(float(metrics["loss"]))

    # orbax multi-process save + restore round trip
    save_checkpoint(out_dir + "/ckpt", state, 2)
    restored = restore_checkpoint(out_dir + "/ckpt", state)
    assert int(restored.step) == 2
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), restored.params, state.params)
    assert max(jax.tree.leaves(d)) == 0.0
    print(f"proc {pid} losses={losses}", flush=True)
    """
)


def test_two_process_full_train_step_and_checkpoint(tmp_path):
    """The full jitted distill train step across 2 real processes (global
    batch assembly, SPMD grad all-reduce, orbax coordinated save/restore) —
    the multi-host path that replaces the reference's DDP train loop
    (reference train_rvfm.py:211-229). The loss trajectory must match a
    single-process run on the concatenated global batch."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    import re

    losses = [eval(re.search(r"losses=(\[.*\])", o).group(1)) for o in outs]
    assert losses[0] == losses[1]  # both hosts see identical global metrics

    # single-process reference trajectory on the concatenated batch
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    name = "facebook/deit-tiny-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        model = Theia(backbone=name, translator="lconv",
                      target_feature_sizes={"teacher/a": (24, 16, 16)})
        tx = make_optimizer(1e-3, weight_decay=0.01)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3), jnp.uint8))["params"]
        state = TrainState.create(params, tx)
        step_fn = make_train_step(model, tx, donate=False)
        ref_losses = []
        for it in range(2):
            parts = [np.random.RandomState(100 * it + pid) for pid in range(2)]
            imgs = np.concatenate([r.randint(0, 256, (2, 224, 224, 3), np.uint8) for r in parts])
            tgt = {"teacher/a": np.concatenate([r.randn(2, 256, 24).astype(np.float32) for r in parts])}
            state, metrics = step_fn(state, jnp.asarray(imgs), jax.tree.map(jnp.asarray, tgt))
            ref_losses.append(float(metrics["loss"]))
        np.testing.assert_allclose(losses[0], ref_losses, rtol=2e-5)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


E2E_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    coord, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    from theia_tpu.config import load_config
    from theia_tpu.models import vit as jvit
    from theia_tpu.train.loop import train_from_config

    name = "facebook/deit-tiny-patch16-224"
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(
        jvit.BACKBONE_CONFIGS[name], num_layers=2)

    cfg = load_config(
        "train_rvfm_imagenet",
        overrides=[
            "model/backbone=deit_tiny",
            "training/target_models=dinov2",
            f"dataset.dataset_root={root}/data",
            "dataset.dataset_ratio=1.0",
            "dataset.shuffle_buffer_size=8",
            "training.epochs=1",
            "training.batch_size=4",   # per chip; 2 procs x 1 dev -> global 8
            "training.compute_dtype=float32",
            f"logging.model_path={root}/ckpt",
            f"logging.log_path={root}/logs_{pid}",
            "logging.save_ckpt_interval=0",
        ],
    )
    summary = train_from_config(cfg, resume=False, max_steps=2)
    print(f"proc {pid} summary step={summary['step']} "
          f"eval_cos={summary['eval']['avg_eval_cos_loss']:.6f}", flush=True)
    """
)


def test_two_process_train_from_config_e2e(tmp_path):
    """The WHOLE training entry point across 2 real processes: per-host
    shard split, host loaders, global batch assembly, jitted step, the
    fixed-step multi-host eval loop, and a coordinated orbax checkpoint —
    the torchrun-equivalent path (reference train_rvfm.py:211-345)."""
    import numpy as np

    from theia_tpu.data.synthetic import generate_synthetic_dataset

    generate_synthetic_dataset(
        str(tmp_path / "data"),
        feature_models={"facebook/dinov2-large": (1024, 16, 16)},
        n_train=32, n_val=16, samples_per_shard=8,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "e2e_worker.py"
    script.write_text(E2E_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "summary step=2" in out
    # global metrics must agree across hosts
    import re

    evals = [re.search(r"eval_cos=([\d.]+)", o).group(1) for o in outs]
    assert evals[0] == evals[1]
    # a checkpoint was written cooperatively
    ckpts = list((tmp_path / "ckpt").rglob("*"))
    assert ckpts
