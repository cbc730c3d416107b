"""HLO-level collective audit for DP / DP×TP (VERDICT r3 #3).

parallel/tp.py's comm-volume table is prose; these tests check the claims
against the *compiled* program on the virtual 8-device CPU mesh:

- pure DP (8,1): every collective spans the full data axis, and the
  data-axis all-reduce bytes account for exactly the f32 gradient pytree
  (one all-reduce per step, however XLA fuses it) plus scalar metrics;
- DP×TP (4,2): the model-axis collectives exist, and the row-parallel
  64x64-head all-reduce appears at its predicted per-device payload
  B/n_data * 64*64 * 2C * 2B(bf16) (parallel/tp.py module docstring);
- counts per (kind, group) match the checked-in snapshot
  (tests/fixtures/collectives_counts.json) so a jax/XLA upgrade or a step
  refactor that silently changes the collective schedule fails loudly.
  Regenerate with UPDATE_COLLECTIVE_FIXTURE=1 pytest tests/test_collective_audit.py.

Reference anchor: SURVEY §2.8 — the reference's comm layer is DDP NCCL
all-reduce (train_rvfm.py:211-214,258) with volume fixed by torch; GSPMD
derives ours from shardings, hence the audit.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theia_tpu.models import vit as jvit
from theia_tpu.models.rvfm import Theia
from theia_tpu.parallel.audit import audit_compiled
from theia_tpu.parallel.mesh import make_mesh
from theia_tpu.parallel.tp import tp_specs, train_state_shardings
from theia_tpu.train.optim import constant_with_warmup, make_optimizer
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_train_step

FIXTURE = Path(__file__).parent / "fixtures" / "collectives_counts.json"
BATCH = 8
# one 64x64 ladder (the comm-volume claim under test) + a _cls linear head
TARGETS = {
    "facebook/sam-vit-huge": (256, 64, 64),
    "facebook/dinov2-large_cls": (1024,),
}


@pytest.fixture(scope="module")
def audits():
    name = "facebook/deit-base-patch16-224"
    orig = jvit.BACKBONE_CONFIGS[name]
    jvit.BACKBONE_CONFIGS[name] = dataclasses.replace(orig, num_layers=2)
    try:
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8))
        targets = {}
        for k, s in TARGETS.items():
            shape = (BATCH, s[0]) if len(s) == 1 else (BATCH, s[1] * s[2], s[0])
            targets[k] = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        model = Theia(
            backbone=name,
            translator="lconv",
            target_feature_sizes=TARGETS,
            dtype=jnp.bfloat16,
            fast_math=True,
        )
        params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
        tx = make_optimizer(constant_with_warmup(1e-3, 10), weight_decay=0.01)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        out = {}
        for n_data, n_model in [(8, 1), (4, 2), (2, 4)]:
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
            out[f"data{n_data}_model{n_model}"] = audit_compiled(compiled, 8)
        return out, n_params
    finally:
        jvit.BACKBONE_CONFIGS[name] = orig


def test_pure_dp_is_grad_allreduce_only(audits):
    """DP(8,1): collectives all span the data axis, and their payload is
    the f32 grad pytree (+ scalar loss metrics) — DDP-equivalent volume."""
    audit, n_params = audits
    a = audit["data8_model1"]
    assert a["total_collectives"] > 0
    for rec in a["records"]:
        assert rec["group_size"] == 8, rec
        assert rec["kind"] in ("all-reduce", "reduce-scatter", "all-gather"), rec
    grad_bytes = 4 * n_params
    total = a["total_bytes"]
    # everything beyond the grads is scalar metrics/loss — tiny
    assert grad_bytes <= total <= grad_bytes * 1.05 + 1_000_000, (total, grad_bytes)


def test_tp_head_row_parallel_claim(audits):
    """DP×TP(4,2): the 64x64 head's row-parallel all-reduce exists at the
    predicted per-device payload (tp.py docstring formula)."""
    audit, _ = audits
    a = audit["data4_model2"]
    hidden = 2 * 768  # lconv ladder width = 2*C_backbone (adapter_heads.py)
    expect = (BATCH // 4) * 64 * 64 * hidden * 2  # bf16 payload per device
    hits = [
        r
        for r in a["records"]
        if r["kind"] == "all-reduce" and r["group_size"] == 2 and r["bytes"] == expect
    ]
    assert hits, (
        f"no model-axis all-reduce of {expect} bytes; model-axis records: "
        f"{[r for r in a['records'] if r['group_size'] == 2][:20]}"
    )
    # backbone TP: at least one model-axis all-reduce per block cut
    # (attention + MLP per layer, forward; remat/backward add more)
    n_model_ars = sum(
        1 for r in a["records"] if r["kind"] == "all-reduce" and r["group_size"] == 2
    )
    assert n_model_ars >= 2 * 2  # 2 layers × (attn + mlp)


def test_counts_match_snapshot(audits):
    """Collective counts per (kind, group-size) match the checked-in
    snapshot; regenerate with UPDATE_COLLECTIVE_FIXTURE=1."""
    audit, _ = audits
    counts = {
        mesh: {k: v["count"] for k, v in a["by_kind_group"].items()}
        for mesh, a in audit.items()
    }
    if os.environ.get("UPDATE_COLLECTIVE_FIXTURE") or not FIXTURE.exists():
        FIXTURE.write_text(json.dumps(counts, indent=2) + "\n")
        if not os.environ.get("UPDATE_COLLECTIVE_FIXTURE"):
            pytest.skip("snapshot created; commit tests/fixtures/collectives_counts.json")
        return
    stored = json.loads(FIXTURE.read_text())
    assert counts == stored, (
        "collective schedule changed vs snapshot — if intentional, rerun with "
        "UPDATE_COLLECTIVE_FIXTURE=1 and commit the new fixture.\n"
        f"now: {json.dumps(counts, indent=2)}\nwas: {json.dumps(stored, indent=2)}"
    )
