"""Device-side timing utilities (SURVEY.md §5: tracing/profiling).

Host-side wall timing through a tunneled TPU backend is unreliable
(`block_until_ready` can return before queue drain; synchronized fetches
add tens of ms of transport latency), so the canonical measurement here
reads device-op durations out of a `jax.profiler` trace. Used by bench.py
and available to users for their own kernels.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import numpy as np

import jax


def device_op_durations(trace_dir: str) -> dict[str, list[float]]:
    """Parse the newest trace in `trace_dir`; returns {op_name: [dur_s]}
    for device-side ops."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return {}
    with gzip.open(sorted(files)[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs: dict[str, list[float]] = collections.defaultdict(list)
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")):
            durs[e["name"]].append(e["dur"] / 1e6)
    return dict(durs)


def measure_device_time(fn, *args, iters: int = 20,
                        name_prefix: str | None = None) -> float:
    """Mean device seconds per call of a jitted `fn(*args)`.

    If `name_prefix` is None, uses the largest-total op group that looks
    like a jit program ("jit_*"). Warms up (compiles) before tracing.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory(prefix="aligner_prof_") as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        durs = device_op_durations(d)
    if name_prefix is None:
        cands = {n: ds for n, ds in durs.items() if n.startswith("jit_")}
    else:
        cands = {n: ds for n, ds in durs.items()
                 if n.startswith(name_prefix)}
    if not cands:
        raise RuntimeError(
            f"no matching device ops in trace (have: {list(durs)[:5]})")
    name = max(cands, key=lambda n: sum(cands[n]))
    return float(np.mean(cands[name]))
