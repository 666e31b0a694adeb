"""Streaming, host-sharded input pipeline.

Replaces the reference's torch DataLoader + DistributedSampler stack
(MVSEC.py:1221-1233): each host process owns the `process_index`-th shard of
the global index stream (no sampler object), loads samples with a thread
pool (HDF5 slicing + PNG decode release the GIL), and prefetches collated
fixed-shape numpy batches on a background queue so the accelerator never
waits on the host.

The expensive events->representation conversion is NOT done here — batches
carry padded raw event arrays and the jitted train step voxelizes on device
(ei_nexus_tpu.data.representations), removing the reference's per-event
python loops from the critical path.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[Any]) -> Any:
    """Stack a list of (possibly nested) numpy sample structures."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(collate([s[i] for s in samples])
                           for i in range(len(first)))
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    """Sharded, prefetching batch iterator over a map-style dataset.

    Args:
      dataset: object with __len__/__getitem__ returning numpy structures.
      batch_size: GLOBAL batch size; each process yields
        batch_size // process_count samples (reference batch split,
        MVSEC.py:1227).
      shuffle/drop_last/seed: epoch shuffling (seed + epoch defines the
        permutation on every host identically).
      process_index/process_count: this host's shard of the sample stream.
      num_workers: loader threads; prefetch: batches queued ahead.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 num_workers: int = 4, prefetch: int = 2):
        assert batch_size % process_count == 0, \
            "global batch size must divide evenly across hosts"
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.epoch = 0
        self.skip_batches = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0):
        """Position the loader at `epoch`, optionally starting mid-epoch.

        skip_batches: number of leading LOCAL batches of this epoch to skip
        — exact mid-epoch resume after preemption (the permutation is a
        pure function of seed+epoch, so skipping k batches reproduces the
        uninterrupted stream from step k). Reset to 0 by the next
        set_epoch call.
        """
        self.epoch = epoch
        self.skip_batches = skip_batches
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.drop_last:
            n_batches = n // self.global_batch
            order = order[: n_batches * self.global_batch]
        # host shard: strided by process index within each global batch
        return order[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch
        return -(-n // self.global_batch)

    def __iter__(self) -> Iterator[Any]:
        indices = self._epoch_indices()
        n_local = len(indices) // self.local_batch
        if not self.drop_last and len(indices) % self.local_batch:
            n_local += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        skip = self.skip_batches

        def produce_batches(fetch_many):
            for b in range(skip, n_local):
                if stop.is_set():
                    return
                batch_idx = indices[b * self.local_batch:
                                    (b + 1) * self.local_batch]
                samples = list(fetch_many(batch_idx))
                out_q.put(collate(samples))

        def producer():
            try:
                if self.num_workers > 0:
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        produce_batches(
                            lambda idx: pool.map(self.dataset.__getitem__,
                                                 idx))
                else:  # num_workers=0: fetch synchronously in this thread
                    produce_batches(
                        lambda idx: map(self.dataset.__getitem__, idx))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to consumer
                out_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterable, put, depth: int = 2):
    """Apply `put` (device_put / shard_batch / encode+put) to batches on a
    background thread, `depth` ahead of the consumer.

    ROUND-5 MEASURED, default OFF: the on-target A/B this wrapper was
    waiting for (VERDICT r4 #2) shows threaded prefetch LOSES ~5-10%
    end-to-end through the axon tunnel — inline 64.3 pairs/s vs
    prefetched 58.7/56.4 at matched host speed (EI_NEXUS_BENCH_E2E runs,
    BASELINE.md round 5). The tunneled client appears to serialize
    device_put internally, so the thread buys no overlap and its queue
    hand-off + core contention with the loader workers cost throughput.
    The mechanism stays available (enable with
    EI_NEXUS_DEVICE_PREFETCH=1) for hosts with genuinely async H2D.
    """
    if os.environ.get("EI_NEXUS_DEVICE_PREFETCH", "0") == "0":
        for item in iterable:
            yield put(item)
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                q.put(put(item))
            q.put(None)
        except BaseException as e:
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
