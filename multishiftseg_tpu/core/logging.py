"""Observability: loss meters, step timing, and jax.profiler trace hooks.

The reference ships only Python logging + an unused tensorboardX writer and a
``RunningMeter`` (``lib/utils/utils.py:23-61``, ``train_deeplab.py:281-307``). This
module keeps those ergonomics and adds what a TPU training loop actually needs:
device-time step timing (block_until_ready-based), throughput accounting, and
on-demand ``jax.profiler`` traces for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

log = logging.getLogger(__name__)


class RunningMeter:
    """Streaming mean of a scalar."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MultiRunningMeter:
    """Dict-of-meters (the reference ``MultiRunningMeter``)."""

    def __init__(self):
        self.meters: Dict[str, RunningMeter] = defaultdict(RunningMeter)

    def update(self, values: Dict[str, float], n: int = 1):
        for k, v in values.items():
            self.meters[k].update(v, n)

    def get_metric(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        self.meters.clear()


class StepTimer:
    """Wall-clock step timing with warmup exclusion and images/sec accounting."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.steps = 0
        self.total_time = 0.0
        self.total_items = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None, items: int = 0):
        """Call with the step output; blocks on it so device time is included."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.steps += 1
        if self.steps > self.warmup_steps:
            self.total_time += dt
            self.total_items += items
        return dt

    @property
    def items_per_sec(self) -> float:
        return self.total_items / max(self.total_time, 1e-9)

    @property
    def avg_step_ms(self) -> float:
        counted = max(self.steps - self.warmup_steps, 1)
        return 1e3 * self.total_time / counted


class ScalarWriter:
    """Persistent scalar-curve logging: append-only CSV per run.

    The reference creates a tensorboardX ``SummaryWriter``
    (``train_deeplab.py:175``, ``plot_curves_multi`` :264-279) but barely
    feeds it; here the per-epoch metrics land in a durable, dependency-free
    artifact (``<dir>/scalars.csv``: step,tag,value rows) that pandas /
    TensorBoard's CSV importer / a 5-line plot script can all consume.
    Appends flush immediately so a preempted run loses nothing.
    """

    def __init__(self, log_dir: str, filename: str = "scalars.csv"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        new = not os.path.exists(self.path)
        self._f = open(self.path, "a")
        if new:
            self._f.write("step,tag,value\n")
            self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(f"{int(step)},{tag},{float(value):.8g}\n")
        self._f.flush()

    def add_scalars(self, values: Dict[str, float], step: int):
        for tag, v in values.items():
            self.add_scalar(tag, v, step)

    def read(self) -> Dict[str, list]:
        """Parse back {tag: [(step, value), ...]} — for tests and plot tools."""
        out: Dict[str, list] = defaultdict(list)
        with open(self.path) as f:
            next(f, None)
            for line in f:
                step, tag, value = line.rstrip("\n").split(",", 2)
                out[tag].append((int(step), float(value)))
        return dict(out)

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler device trace (viewable in TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def log_compile_time(name: str):
    """Decorator logging the first-call (compile) time of a jitted function."""

    def wrap(fn):
        called = {"n": 0}

        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            if called["n"] == 0:
                jax.block_until_ready(out)
                log.info("%s first call (compile) took %.1fs", name, time.perf_counter() - t0)
            called["n"] += 1
            return out

        return inner

    return wrap
