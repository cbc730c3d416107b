"""Orbax checkpointing with true, preemption-safe resume.

Strictly more capable than the reference, which torch.saves model weights
only and cannot resume optimizer state — a crash there loses up to
save_ckpt_interval steps and requires a manual restart (reference:
src/theia/scripts/train/train_rvfm.py:153-156,203-206; SURVEY.md §5).
Here:

  - **async saves**: ``CheckpointSession.save`` stages device arrays to
    host and returns; the write proceeds in a background thread while the
    TPU keeps training (at most one save in flight — the next save first
    drains the previous one);
  - **atomic publication**: orbax commits each step directory by atomic
    rename, so a kill mid-write can never corrupt the latest checkpoint —
    ``latest_step`` only ever sees fully-committed steps;
  - **robust restore**: ``restore_checkpoint`` walks committed steps
    newest-first and falls back if the newest is unreadable, so a
    preempted run always resumes from the best available state;
  - the train loop (train/loop.py) fast-forwards past completed work on
    restart — kill-mid-epoch auto-resume is tested in
    tests/test_preemption.py.

Interop with reference-format checkpoints lives in
theia_tpu.models.pretrained.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _manager(ckpt_dir: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


class CheckpointSession:
    """A long-lived checkpoint manager for one training run.

    Unlike the one-shot helpers below, the manager persists across saves so
    writes can be asynchronous: ``save`` returns once arrays are staged on
    host, and the serialization/commit runs in the background while the
    accelerator computes the next steps. Call ``close`` (or use as a
    context manager) to drain the final write."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5) -> None:
        self._mgr = _manager(ckpt_dir, max_to_keep)

    def save(self, state: Any, step: int, block: bool = False) -> None:
        import orbax.checkpoint as ocp

        # at most one async save in flight: drain the previous write first
        # (also makes donated-buffer reuse safe — staging copied the arrays
        # to host before the previous save() returned)
        self._mgr.wait_until_finished()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if block:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "CheckpointSession":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def save_checkpoint(ckpt_dir: str, state: Any, step: int, max_to_keep: int = 5) -> None:
    """One-shot blocking save (scripts/tests; the train loop uses
    CheckpointSession for async saves)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target_state: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target_state``.

    With ``step=None``, committed steps are tried newest-first: if the
    newest checkpoint is unreadable (e.g. storage lost a shard after
    commit), restore falls back to the previous one instead of failing the
    run — preemption-safe resume never dead-ends on one bad directory."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    try:
        if step is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(target_state))
        steps = sorted(mgr.all_steps(), reverse=True)
        first_err: Optional[Exception] = None
        for s in steps:
            try:
                return mgr.restore(s, args=ocp.args.StandardRestore(target_state))
            except Exception as e:  # corrupt/partial step dir: fall back
                if first_err is None:
                    first_err = e  # the NEWEST step's error is the diagnostic one
                else:
                    import warnings

                    warnings.warn(f"checkpoint step {s} also unreadable: {e!r}")
        if first_err is not None:
            # every committed step failed — a systematic mismatch (structure/
            # sharding change), not corruption: surface the newest error
            raise first_err
        return None
    finally:
        mgr.close()
