"""Compile the cddsv train step at (data,model) in {(8,1),(4,2),(2,4)} on a
virtual 8-device CPU mesh, audit every collective in the optimized HLO, and
check the comm-volume claims in parallel/tp.py against the compiled program
(VERDICT r3 #3; reference anchor SURVEY §2.8 / train_rvfm.py:211-214).

Writes benchmarks/artifacts/collectives_audit.json:
  per mesh: {by_kind_group: {"all-reduce@g2": {count, bytes}, ...},
             claims: presence of the row-parallel head all-reduce at its
             predicted per-device payload, and the DP grad all-reduce byte
             accounting vs 4*param_count}.

Usage: python benchmarks/audit_collectives.py [--size base] [--batch 64]
       [--layers N] [--devices 8|16|32]   (devices>8 writes
       collectives_audit_d{N}.json with the (N,1),(N/2,2),(N/4,4) mesh rows)
The count snapshot consumed by tests/test_collective_audit.py uses a
different (2-teacher) geometry and is owned by the test — regenerate it
with UPDATE_COLLECTIVE_FIXTURE=1 pytest tests/test_collective_audit.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --devices must take effect before jax initializes the backend
_N_DEVICES = 8
if "--devices" in sys.argv:
    _N_DEVICES = int(sys.argv[sys.argv.index("--devices") + 1])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_N_DEVICES}"
).strip()

import jax

# this container's sitecustomize registers the axon TPU backend and ignores
# JAX_PLATFORMS; the config update is the only reliable way to force CPU
jax.config.update("jax_platforms", "cpu")

import numpy as np


# the geometry grid is owned by __graft_entry__._mesh_grid so the audited
# meshes are exactly the ones the driver dryrun steps (no second copy to
# keep in sync; its guards skip degenerate data=1 TP meshes at tiny counts)
from __graft_entry__ import _mesh_grid

MESHES = _mesh_grid(_N_DEVICES)


def build_and_audit(size: str, batch: int, layers: int | None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models import vit as jvit
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.parallel.audit import audit_compiled
    from theia_tpu.parallel.mesh import make_mesh
    from theia_tpu.parallel.tp import tp_specs, train_state_shardings
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    name = f"facebook/deit-{size}-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    if layers:
        jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=layers)
    try:
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randint(0, 256, (batch, 224, 224, 3), np.uint8))
        targets = {
            k: jnp.asarray(
                rng.randn(batch, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16
            )
            for k, s in CDDSV_TARGETS.items()
        }
        model = Theia(
            backbone=name,
            translator="lconv",
            target_feature_sizes=CDDSV_TARGETS,
            dtype=jnp.bfloat16,
            fuse_preprocessing=True,
            fast_math=True,
        )
        params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
        tx = make_optimizer(constant_with_warmup(1e-3, 100), weight_decay=0.01)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        hidden = 2 * jvit.BACKBONE_CONFIGS[name].hidden_size  # lconv ladder h

        results = {}
        for n_data, n_model in MESHES:
            mesh = make_mesh(n_data=n_data, n_model=n_model)
            state_sh = (
                train_state_shardings(mesh, tx, params, tp_specs(params, n_model))
                if n_model > 1
                else None
            )
            step = make_train_step(
                model, tx, main_loss="cos_l1", mesh=mesh, state_shardings=state_sh
            )
            state = TrainState.create(params, tx)
            compiled = step._jitted.lower(state, images, targets, None).compile()
            audit = audit_compiled(compiled, _N_DEVICES)

            # --- claims check (parallel/tp.py module docstring) ---
            claims = {}
            records = audit.pop("records")
            ar = [r for r in records if r["kind"] == "all-reduce"]
            if n_model > 1:
                # row-parallel 64x64-head all-reduce: per-device payload
                # [B/n_data, 64, 64, hidden] in the model's activation dtype
                expect = (batch // n_data) * 64 * 64 * hidden * 2  # bf16
                hits = [
                    r for r in ar if r["group_size"] == n_model and r["bytes"] == expect
                ]
                claims["head_row_parallel_all_reduce"] = {
                    "expected_bytes_per_device": expect,
                    "formula": "B/n_data * 64*64 * 2*C_backbone * 2B(bf16)",
                    "found": len(hits),
                    "ok": len(hits) >= 1,
                }
                claims["model_axis_collectives"] = {
                    "count": sum(1 for r in records if r["group_size"] == n_model),
                }
            # DP grad all-reduce accounting: full data-axis groups must move
            # ~4 bytes/param (f32 grads) once per step (+ scalar metrics)
            data_ar_bytes = sum(
                r["bytes"]
                for r in ar
                if r["group_size"] == n_data and n_data > 1
            )
            claims["dp_grad_all_reduce"] = {
                "param_count": n_params,
                "grad_f32_bytes": 4 * n_params,
                "measured_data_axis_all_reduce_bytes": data_ar_bytes,
                # on square meshes (n_data == n_model) group_size alone can't
                # separate data-axis from model-axis all-reduces — the byte
                # sum conflates both, so no ratio claim is made there
                "ratio": (
                    round(data_ar_bytes / (4 * n_params), 3)
                    if n_data > 1 and n_data != n_model
                    else None
                ),
                "note": (
                    "group_size-ambiguous square mesh; bytes include "
                    "model-axis collectives" if n_data == n_model else None
                ),
            }
            audit["claims"] = claims
            results[f"data{n_data}_model{n_model}"] = audit
            print(
                json.dumps(
                    {"mesh": (n_data, n_model), "by_kind_group": audit["by_kind_group"]}
                ),
                flush=True,
            )
        return {
            "devices": _N_DEVICES,
            "size": size,
            "batch": batch,
            "layers": layers or orig.num_layers,
            "hidden": jvit.BACKBONE_CONFIGS[name].hidden_size,
            "n_params": n_params,
            "meshes": results,
        }
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count (consumed pre-import)")
    args = ap.parse_args()

    out = build_and_audit(args.size, args.batch, args.layers)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(root, "benchmarks", "artifacts")
    os.makedirs(art, exist_ok=True)
    name = (
        "collectives_audit.json" if _N_DEVICES == 8
        else f"collectives_audit_d{_N_DEVICES}.json"
    )
    path = os.path.join(art, name)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
