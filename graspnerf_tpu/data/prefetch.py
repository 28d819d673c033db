"""Asynchronous host data pipeline: worker threads + a bounded prefetch queue.

The reference hides its (Python-side) sample assembly behind 8 DataLoader
worker processes (ref: src/nr/train/trainer.py:38 num_workers=8). Here the
equivalent is a thread pool: sample generation is numpy + the native
C++/OpenMP ray tracer (graspnerf_tpu/data/native.py), both of which release
the GIL for their hot loops, so threads overlap cleanly with each other and
with the host→device transfer of the previous batch.

Each worker owns a private dataset instance (datasets carry RandomState and
are not thread-safe); determinism per worker comes from the seed offset.

`PrefetchLoader` yields collated scene batches (leading scene axis) as numpy
trees; the trainer moves them to device. `data_wait_s` accumulates the time
the consumer actually blocked on the queue — on a healthy pipeline it stays
near zero while the device step runs.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterator, Optional

import numpy as np
import jax


def collate_scenes(samples):
    """Stack a list of per-scene sample trees along a new leading axis."""
    if len(samples) == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[None],
                                      samples[0])
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *samples)


class PrefetchLoader:
    """Background sample generation with a bounded queue.

    dataset_factory(worker_seed) -> object with .sample() -> sample tree.
    """

    def __init__(self, dataset_factory: Callable[[int], object],
                 num_workers: int = 4, scenes_per_batch: int = 1,
                 buffer_size: int = 16, seed: int = 0):
        self.scenes_per_batch = scenes_per_batch
        self._q: queue.Queue = queue.Queue(maxsize=max(buffer_size,
                                                       scenes_per_batch))
        self._stop = threading.Event()
        self._threads = []
        self.data_wait_s = 0.0
        for w in range(max(num_workers, 1)):
            ds = dataset_factory(seed + 1000 * w)
            t = threading.Thread(target=self._worker, args=(ds,), daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self, ds):
        while not self._stop.is_set():
            try:
                s = ds.sample()
            except Exception as e:  # surface worker crashes to the consumer
                s = e
            while not self._stop.is_set():
                try:
                    self._q.put(s, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        t0 = time.perf_counter()
        samples = []
        for _ in range(self.scenes_per_batch):
            s = self._q.get()
            if isinstance(s, Exception):
                self.close()
                raise s
            samples.append(s)
        self.data_wait_s += time.perf_counter() - t0
        return collate_scenes(samples)

    def pop_data_wait(self) -> float:
        w, self.data_wait_s = self.data_wait_s, 0.0
        return w

    def close(self):
        self._stop.set()

    def __del__(self):  # best-effort cleanup
        self._stop.set()
