"""HLO collective audit: account every cross-device collective in a
compiled (post-SPMD) program — op kind, payload bytes, replica-group size.

parallel/tp.py's module docstring *claims* per-step comm volumes for the
DP/TP cuts (one all-reduce per block after attention and after the MLP;
one row-parallel all-reduce of [B',HW,h] per translator head). This module
makes those claims checkable against the program XLA actually built:
``collective_stats`` parses the optimized HLO text, ``summarize`` groups
by (kind, group_size) so the data-axis grad all-reduce (group = n_data)
separates from the model-axis TP all-reduces (group = n_model).

Reference anchor: SURVEY §2.8 — the reference's comm layer is torch DDP's
NCCL all-reduce (train_rvfm.py:211-214,258) whose volume is fixed by
torch; here GSPMD *inserts* collectives from sharding annotations, so the
audit inspects the compiled artifact instead of trusting prose.

Consumed by benchmarks/audit_collectives.py (writes the checked-in
artifact) and tests/test_collective_audit.py (asserts counts/claims don't
silently change).
"""

from __future__ import annotations

import re
from typing import Any

_DTYPE_BYTES = {
    "pred": 1,
    "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# collective-issuing HLO ops; "-start" (async) counted, "-done" skipped so
# async pairs aren't double-counted
_KINDS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"=\s*(\([^)]*\)|\w+\[[\d,]*\](?:\{[^}]*\})?)\s+"
    r"(" + "|".join(_KINDS) + r")(-start)?\("
)
_EXPLICIT_GROUPS_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_IOTA_GROUPS_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO result shape — 'bf16[4,196,768]{2,1,0}' or a
    tuple '(f32[2]{0}, f32[2]{0})'; token-less scalars like 'f32[]' count
    as one element."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue  # e.g. 'token[]' / opaque
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str, n_devices: int) -> int:
    """Devices per replica group: explicit '{{0,1},{2,3}}' or iota
    '[groups,size]<=[...]' format; absent means all devices."""
    m = _EXPLICIT_GROUPS_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _IOTA_GROUPS_RE.search(line)
    if m:
        return int(m.group(2))
    return n_devices


def collective_stats(hlo_text: str, n_devices: int) -> list[dict[str, Any]]:
    """One record per collective instruction in optimized HLO text:
    {kind, bytes (result payload), group_size}."""
    out = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        shape_text, kind = m.group(1), m.group(2)
        out.append(
            {
                "kind": kind,
                "bytes": _shape_bytes(shape_text),
                "group_size": _group_size(line, n_devices),
            }
        )
    return out


def summarize(stats: list[dict[str, Any]]) -> dict[str, dict[str, int]]:
    """Group records by 'kind@g<group_size>' -> {count, bytes}."""
    agg: dict[str, dict[str, int]] = {}
    for r in stats:
        key = f"{r['kind']}@g{r['group_size']}"
        slot = agg.setdefault(key, {"count": 0, "bytes": 0})
        slot["count"] += 1
        slot["bytes"] += r["bytes"]
    return dict(sorted(agg.items()))


def audit_compiled(compiled: Any, n_devices: int) -> dict[str, Any]:
    """Full audit of a jax Compiled object: per-kind summary + totals."""
    stats = collective_stats(compiled.as_text(), n_devices)
    summary = summarize(stats)
    return {
        "n_devices": n_devices,
        "by_kind_group": summary,
        "total_collectives": len(stats),
        "total_bytes": sum(r["bytes"] for r in stats),
        "records": stats,
    }
