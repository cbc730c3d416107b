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
