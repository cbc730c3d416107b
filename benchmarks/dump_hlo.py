"""Compile the cddsv train step with an XLA dump to inspect post-optimization
HLO (which convs became VPU multiply-reduce fusions vs MXU custom-calls).

Usage: XLA dump lands in /tmp/xla_dump; pass --base for theia-base.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_dump_to=/tmp/xla_dump --xla_dump_hlo_as_text"
)

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    size = "base" if "--base" in sys.argv else "tiny"
    batch_size = 64 if size == "base" else 256
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(batch_size, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16)
        for k, s in CDDSV_TARGETS.items()
    }
    model = Theia(
        backbone=f"facebook/deit-{size}-patch16-224",
        translator="lconv",
        target_feature_sizes=CDDSV_TARGETS,
        dtype=jnp.bfloat16,
        fuse_preprocessing=True,
        fast_math=True,
    )
    params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
    tx = make_optimizer(constant_with_warmup(1e-3, 100), weight_decay=0.01)
    step = make_train_step(model, tx, main_loss="cos_l1")
    state = TrainState.create(params, tx)
    state, metrics = step(state, images, targets)
    float(metrics["loss"])
    print("compiled + ran one step; dump in /tmp/xla_dump")


if __name__ == "__main__":
    main()
