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


def load_device_events(trace_dir: str):
    """Device-pid X-events from the newest jax.profiler trace under
    ``trace_dir`` as ``(name, hlo_category, dur_ms)`` tuples — the single
    parser shared by every trace-reading tool."""
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
    return [
        (e.get("name", ""), e.get("args", {}).get("hlo_category", ""),
         e.get("dur", 0) / 1e3)
        for e in events
        if e.get("ph") == "X" and e.get("pid") in dev_pids
    ]


def device_time_ms(trace_dir: str) -> dict:
    """Sum device-event durations (ms) by hlo_category from a jax.profiler trace."""
    busy = defaultdict(float)
    for _, cat, dur in load_device_events(trace_dir):
        if cat:
            busy[cat] += dur
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
        # host read OF THE DEPENDENCY CHAIN: an unrelated constant would let
        # the trace close before the final dispatches complete
        float(jnp.sum(cur.astype(jnp.float32)))
    busy = device_time_ms(trace_dir)
    return {k: v / iters for k, v in busy.items()}
