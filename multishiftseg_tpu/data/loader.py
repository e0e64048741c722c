"""Batching + device prefetch for the host-side datasets.

Replaces the reference's ``torch.utils.data.DataLoader`` (4 worker processes, pinned
memory; ``train_deeplab.py:58-73``) with a thread-pool loader that overlaps PIL decode
/ augmentation with TPU compute and double-buffers device transfer. Static shapes come
from the crop size (train) or pad-to-bucket (eval), so every step hits the same XLA
program.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


def _stack(samples):
    """Stack a list of per-sample tuples into batched numpy arrays."""
    n = len(samples[0])
    out = []
    for i in range(n):
        vals = [s[i] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out.append(np.stack(vals))
        else:
            out.append(vals)
    return tuple(out)


class Loader:
    """Shuffling, epoch-based loader with parallel sample fetch and prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        device_put: Optional[Callable] = None,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``shard_index``/``shard_count`` implement the multi-host loading
        contract (``core.mesh.local_batch_slice``): every host draws the SAME
        seeded global shuffle, the global batch is ``batch_size * shard_count``
        samples, and this host fetches only its contiguous ``batch_size`` slice —
        host-major, matching ``make_global_mesh``'s data-axis layout."""
        from ..utils import tune_host_allocator

        tune_host_allocator()  # batch-sized allocs must not re-fault per step
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.device_put = device_put
        assert 0 <= shard_index < shard_count
        if shard_count > 1 and not drop_last:
            # a partial final global batch would give hosts different (possibly
            # empty) slice lengths and desynchronize the collective assembly in
            # shard_global_batch — the multi-host contract requires drop_last
            raise ValueError("shard_count > 1 requires drop_last=True")
        self.shard_index = shard_index
        self.shard_count = shard_count

    def __len__(self):
        n = len(self.dataset)
        gb = self.batch_size * self.shard_count
        return n // gb if self.drop_last else -(-n // gb)

    def __iter__(self) -> Iterator[Tuple]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        gb = self.batch_size * self.shard_count
        lo = self.shard_index * self.batch_size
        batches = [
            order[i * gb + lo : i * gb + lo + self.batch_size] for i in range(nb)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that honours `stop`: an abandoned iterator (consumer
            # broke early) must not leave this thread parked in q.put forever
            # pinning prefetched device batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        batch = _stack(samples)
                        if self.device_put is not None:
                            batch = self.device_put(batch)
                        if not put_or_stop(batch):
                            return
            except BaseException as e:  # noqa: BLE001
                # a worker exception must reach the consumer — swallowing it
                # here would leave the iterator blocked in q.get() forever
                put_or_stop(e)
                return
            put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def pad_to_multiple(
    img: np.ndarray, multiple: int = 32, mask: Optional[np.ndarray] = None,
    mask_fill: int = 255,
):
    """Pad HWC image (and HW mask) bottom/right to a size multiple. Returns the padded
    arrays and the original (h, w)."""
    h, w = img.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
        if mask is not None:
            mask = np.pad(mask, ((0, ph), (0, pw)), constant_values=mask_fill)
    return (img, mask, (h, w)) if mask is not None else (img, (h, w))
