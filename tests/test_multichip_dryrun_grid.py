"""dryrun_multichip at 16/32 virtual devices (VERDICT r4 #4).

The driver exercises dryrun_multichip at its own device count; these tests
pin the LARGER geometries — (16,1)/(8,2)/(4,4) and (32,1)/(16,2)/(8,4) — in
fresh subprocesses (the virtual CPU device count is fixed at backend init,
so each count needs its own process). Each run executes one full train step
per geometry and asserts loss equality vs the single-device run (the
assertion lives inside dryrun_multichip itself).
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


def _run_dryrun(n: int) -> str:
    # conftest pins XLA_FLAGS to an 8-device count in THIS process; the
    # child needs its own device count, so override rather than inherit
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import __graft_entry__ as g; "
                f"g.dryrun_multichip({n})"
            ),
        ],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=3000,
        env=env,
    )
    assert proc.returncode == 0, f"dryrun_multichip({n}) failed:\n{proc.stderr[-4000:]}"
    return proc.stdout


@pytest.mark.slow
@pytest.mark.parametrize("n,expected_meshes", [
    (16, [(16, 1), (8, 2), (4, 4)]),
    (32, [(32, 1), (16, 2), (8, 4)]),
])
def test_dryrun_multichip_grid(n, expected_meshes):
    out = _run_dryrun(n)
    meshes = [
        (int(d), int(m))
        for d, m in re.findall(r"mesh data=(\d+) x model=(\d+) loss=", out)
    ]
    # the (1,1) single-device reference runs first, then every grid geometry
    assert meshes[0] == (1, 1), out
    assert meshes[1:] == expected_meshes, out
    assert "base-geometry compile ok" in out
