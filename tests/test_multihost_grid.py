"""Multi-host GRID test: 2 processes x 2 local devices (4 global devices).

test_multihost.py covers 2 procs x 1 device each — there every host owns
exactly one mesh row and `make_global_batch`'s index math is trivial. The
real pod topology (reference anchor: the DDP world at train_rvfm.py:211-229,
8 workers = hosts x chips-per-host) has each process feeding SEVERAL
addressable devices, and under DPxTP a host's local data slice spans only
PART of a mesh row (its devices sit in 2 data rows of the (2,2) mesh, or in
2 of the 4 rows of the (4,1) mesh). This is where per-host batch-to-shard
assignment typically breaks (VERDICT r3 #4).

Covered per worker (both mesh shapes, same process pair):
- mesh (4,1): pure DP, each host's local batch splits across its 2 devices;
- mesh (2,2): DPxTP, host h owns data row h (both model columns) — the
  local batch maps to one data row but two devices;
- full jitted distill train step on both meshes + loss parity with a
  single-process run on the concatenated global batch;
- orbax coordinated save/restore round trip on the (2,2) mesh.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

GRID_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    from jax.sharding import Mesh
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.parallel.distributed import make_global_batch
    from theia_tpu.parallel.mesh import replicated
    from theia_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from theia_tpu.train.optim import make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    name = "facebook/deit-tiny-patch16-224"
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(
        jvit.BACKBONE_CONFIGS[name], num_layers=2)
    TARGETS = {"teacher/a": (24, 16, 16)}
    model = Theia(backbone=name, translator="lconv", target_feature_sizes=TARGETS)
    tx = make_optimizer(1e-3, weight_decay=0.01)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3), jnp.uint8))["params"]

    results = {}
    for mesh_name, shape in [("dp4", (4, 1)), ("dp2tp2", (2, 2))]:
        mesh = Mesh(np.asarray(jax.devices()).reshape(shape), ("data", "model"))
        state = jax.device_put(TrainState.create(params, tx), replicated(mesh))
        step_fn = make_train_step(model, tx, mesh=mesh, donate=False)
        losses = []
        for it in range(2):
            # per-host local data; host h contributes a disjoint slice.
            # local batch 4 -> global 8; on (4,1) this host's 4 samples
            # split 2+2 over its 2 devices (2 mesh rows), on (2,2) all 4
            # land in data row `pid` replicated over the model axis.
            rng = np.random.RandomState(100 * it + pid)
            imgs = rng.randint(0, 256, (4, 224, 224, 3), np.uint8)
            tgt = {"teacher/a": rng.randn(4, 256, 24).astype(np.float32)}
            gi, gt = make_global_batch(mesh, (imgs, tgt))
            assert gi.shape[0] == 8
            # the host's addressable shards cover exactly its local samples
            n_local = sum(int(np.prod(s.data.shape[:1])) for s in gi.addressable_shards)
            expect = {"dp4": 4, "dp2tp2": 8}[mesh_name]  # tp replicates over model axis
            assert n_local == expect, (mesh_name, n_local)
            state, metrics = step_fn(state, gi, gt)
            losses.append(float(metrics["loss"]))
        results[mesh_name] = losses
        if mesh_name == "dp2tp2":
            save_checkpoint(out_dir + "/ckpt_grid", state, 2)
            restored = restore_checkpoint(out_dir + "/ckpt_grid", state)
            assert int(restored.step) == 2
            d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                             restored.params, state.params)
            assert max(jax.tree.leaves(d)) == 0.0

    print(f"proc {pid} grid={results}", flush=True)
    """
)


def test_two_process_two_device_grid(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "grid_worker.py"
    script.write_text(GRID_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    grids = [eval(re.search(r"grid=(\{.*\})", o).group(1)) for o in outs]
    assert grids[0] == grids[1]  # global metrics agree across hosts

    # single-process trajectory on the concatenated global batch must match
    # BOTH mesh shapes (the mesh factorization must not change the math)
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
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3), jnp.uint8)
        )["params"]
        state = TrainState.create(params, tx)
        step_fn = make_train_step(model, tx, donate=False)
        ref_losses = []
        for it in range(2):
            parts = [np.random.RandomState(100 * it + pid) for pid in range(2)]
            imgs = np.concatenate(
                [r.randint(0, 256, (4, 224, 224, 3), np.uint8) for r in parts])
            tgt = {"teacher/a": np.concatenate(
                [r.randn(4, 256, 24).astype(np.float32) for r in parts])}
            state, metrics = step_fn(state, jnp.asarray(imgs), jax.tree.map(jnp.asarray, tgt))
            ref_losses.append(float(metrics["loss"]))
        np.testing.assert_allclose(grids[0]["dp4"], ref_losses, rtol=2e-5)
        np.testing.assert_allclose(grids[0]["dp2tp2"], ref_losses, rtol=2e-5)
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig
