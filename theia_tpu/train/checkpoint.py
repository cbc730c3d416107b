"""Orbax checkpointing with true resume (params + optimizer state + step).

Strictly more capable than the reference, which torch.saves model weights
only and cannot resume optimizer state (reference:
src/theia/scripts/train/train_rvfm.py:153-156,203-206; SURVEY.md §5).
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


def save_checkpoint(ckpt_dir: str, state: Any, step: int, max_to_keep: int = 5) -> None:
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
    """Restore into the structure/shardings of ``target_state``."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target_state))
    mgr.close()
    return restored
