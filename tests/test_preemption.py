"""Preemption-safe training: kill -9 mid-epoch, auto-resume, converge.

The reference loses up to save_ckpt_interval steps on a crash and cannot
resume optimizer state at all (reference train_rvfm.py:153-156; SURVEY.md
§5). Here a real subprocess training run is SIGKILLed mid-epoch; the rerun
must restore the newest committed orbax checkpoint (params + opt state +
step), fast-forward past completed work, and finish the schedule at the
exact total step count — no steps lost beyond the save interval, none
trained twice.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from theia_tpu.data.synthetic import generate_synthetic_dataset

CHILD = """
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import dataclasses
from theia_tpu.models import vit as jvit
name = "facebook/deit-tiny-patch16-224"
jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(
    jvit.BACKBONE_CONFIGS[name], num_layers=2)

from theia_tpu.config import load_config
from theia_tpu.train.loop import train_from_config

root = sys.argv[1]
cfg = load_config(
    "train_rvfm_imagenet",
    overrides=[
        "model/backbone=deit_tiny",
        "training/target_models=dinov2",
        f"dataset.dataset_root={root}",
        "dataset.dataset_ratio=1.0",
        "dataset.shuffle_buffer_size=8",
        "training.epochs=2",
        "training.batch_size=1",
        "training.compute_dtype=float32",
        f"logging.model_path={root}/ckpt",
        f"logging.log_path={root}/logs",
        "logging.save_ckpt_interval=1",  # commit every step
    ],
)
summary = train_from_config(cfg)  # resume=True: auto-resume on restart
print("FINAL_STEP=" + str(summary["step"]))
"""


def test_kill_mid_epoch_auto_resume(tmp_path):
    generate_synthetic_dataset(
        str(tmp_path),
        feature_models={"facebook/dinov2-large": (1024, 16, 16)},
        n_train=24,  # 3 steps/epoch on the 8-way mesh at batch 1/chip
        n_val=8,
        samples_per_shard=8,
    )
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    # the loop nests checkpoints under the run identifier
    # (logging.model_path / run_identifier_prefix)
    ckpt_dir = str(
        tmp_path / "ckpt" / "rvfm_dp1.000_facebook-deit-tiny-patch16-224_lconv"
    )
    env = dict(os.environ)
    # the child must import theia_tpu without relying on a pip install
    # (script lives under tmp_path, so sys.path[0] is NOT the repo root)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    def committed():
        # orbax commits a step by atomic rename to a bare digit dir; a cheap
        # listdir poll beats constructing a CheckpointManager per probe
        try:
            steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
        except FileNotFoundError:
            return None
        return max(steps) if steps else None

    # run 1: kill -9 as soon as the first mid-epoch step is committed
    p = subprocess.Popen(
        [sys.executable, str(script), str(tmp_path)],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    killed_at = None
    deadline = time.time() + 600
    while time.time() < deadline:
        s = committed()
        if s is not None and s >= 1:
            killed_at = s
            p.send_signal(signal.SIGKILL)
            break
        if p.poll() is not None:  # finished before we could kill: broken test
            raise AssertionError(
                "training finished before kill; output:\n" + p.stdout.read()
            )
        time.sleep(0.005)
    p.wait(timeout=60)
    assert killed_at is not None, "no checkpoint committed within deadline"
    assert p.returncode == -signal.SIGKILL

    resumable = committed()
    assert resumable is not None and resumable >= killed_at
    assert resumable < 6, "kill landed after the schedule completed"

    # run 2: same command, must auto-resume and complete the schedule
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        env=env, cwd="/root/repo", timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert out.returncode == 0, out.stdout
    # restore walks committed steps newest-first; the newest COMMITTED step
    # at resume time may exceed what we saw at kill time (an async write
    # already staged can still commit), so parse the actual resume point
    assert "resuming at step " in out.stdout, out.stdout
    resumed_from = int(out.stdout.split("resuming at step ")[1].split()[0])
    assert resumable <= resumed_from < 6
    assert "FINAL_STEP=6" in out.stdout, out.stdout
    assert committed() == 6
