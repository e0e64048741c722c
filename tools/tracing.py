"""Shared device-trace timing helpers (wall-clock over the axon tunnel is unreliable:
repeated dispatches coalesce and block_until_ready can return early — only the
profiler's device-side event durations are trustworthy)."""

import glob
import gzip
import json
import shutil
from collections import defaultdict

import jax
import jax.numpy as jnp


def device_time_ms(trace_dir: str) -> dict:
    """Sum device-event durations (ms) by hlo_category from a jax.profiler trace."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e["args"].get("name", "")
            if "TPU" in name or "/device:" in name or "Device" in name:
                dev_pids.add(e["pid"])
    busy = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        cat = e.get("args", {}).get("hlo_category", "")
        if not cat:
            continue
        busy[cat] += e.get("dur", 0) / 1e3
    busy["TOTAL"] = sum(busy.values())
    return dict(busy)


def trace_op(fn, tab, idx, iters: int = 8, trace_dir: str = "/tmp/op_trace") -> dict:
    """Run `fn(tab, idx)` iters times with inter-dispatch value dependencies under a
    profiler trace; return per-iteration device ms by category."""
    out = fn(tab, idx)
    jax.block_until_ready(out)
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        cur = idx
        for _ in range(iters):
            out = fn(tab, cur)
            zero = (out.ravel()[0] * 0).astype(idx.dtype)
            cur = idx + zero
        jax.block_until_ready(cur)
        float(jnp.sum(jnp.asarray(0.0)))
    busy = device_time_ms(trace_dir)
    return {k: v / iters for k, v in busy.items()}
