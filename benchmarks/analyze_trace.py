"""Analyze a jax.profiler trace: top ops with HLO text, source, bytes, GB/s.

Usage: python benchmarks/analyze_trace.py [--by-source] [--trace-dir DIR] [--top N]
Reads the newest *.trace.json.gz under the trace dir (default /tmp/theia_trace).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

TRACE_DIR = "/tmp/theia_trace"
N_STEPS = 5


def load_events(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return [
        e
        for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    ]


def main() -> None:
    args = sys.argv[1:]
    trace_dir = TRACE_DIR
    if "--trace-dir" in args:
        trace_dir = args[args.index("--trace-dir") + 1]
    top = int(args[args.index("--top") + 1]) if "--top" in args else 40
    events = load_events(trace_dir)

    total = sum(e["dur"] for e in events) / 1e3
    print(f"total device time {total:.1f} ms over {N_STEPS} steps = {total/N_STEPS:.2f} ms/step")

    if "--by-source" in args:
        agg = defaultdict(float)
        for e in events:
            src = e.get("args", {}).get("source", "?")
            agg[src] += e["dur"] / 1e3
        print(f"{'ms/step':>9}  source")
        for src, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{dur/N_STEPS:9.3f}  {src}")
        return

    # aggregate by op name; keep representative metadata
    agg: dict[str, dict] = {}
    for e in events:
        name = e["name"]
        a = agg.setdefault(name, {"dur": 0.0, "count": 0, "args": e.get("args", {})})
        a["dur"] += e["dur"] / 1e3
        a["count"] += 1
    print(f"{'ms/step':>8} {'GB/s':>6}  op")
    for name, a in sorted(agg.items(), key=lambda kv: -kv[1]["dur"])[:top]:
        dur_ms = a["dur"] / N_STEPS
        bytes_acc = int(a["args"].get("bytes_accessed", 0))
        gbps = bytes_acc / (dur_ms * 1e6) if dur_ms else 0.0
        long = a["args"].get("long_name", name)
        # compress: keep output shape + op + operand shapes
        long = re.sub(r"\{[0-9,]*:?T?\([^)]*\)[^}]*\}", "", long)
        long = re.sub(r"metadata=\{.*?\}", "", long)
        src = a["args"].get("source", "")
        src = src.replace("/root/repo/", "").replace("/opt/venv/lib/python3.12/site-packages/", "")
        print(f"{dur_ms:8.3f} {gbps:6.0f}  {long[:170]}")
        if src:
            print(f"{'':15}  @ {src}")


if __name__ == "__main__":
    main()
