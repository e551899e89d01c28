"""Torch-free data loading with distributed sharding.

Capability match of ``text2motion/datasets1/dataloader.py``: the
``DistributedSampler`` (``:16-53``) with epoch-seeded deterministic shuffle
and round-up padding so every rank draws the same number of batches, and
``build_dataloader``'s collation (``:56-121``) without worker processes —
batches are tiny ([B, 196, 263] float32) and the TPU input pipeline is
host-compute-light, so synchronous prefetch of the next batch is enough.
"""

from __future__ import annotations

import math
import threading
import queue as queue_mod
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

Batch = Tuple[List[str], np.ndarray, np.ndarray]   # captions, motions, lengths


class DistributedSampler:
    """Deterministic per-rank index sampler (``dataloader.py:16-53``)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = True, round_up: bool = True, seed: int = 0):
        assert 0 <= rank < num_replicas
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.round_up = round_up
        self.seed = seed
        self.epoch = 0
        if round_up:
            self.num_samples = int(math.ceil(dataset_len / num_replicas))
            self.total_size = self.num_samples * num_replicas
        else:
            self.num_samples = len(range(rank, dataset_len, num_replicas))
            self.total_size = dataset_len

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            indices = g.permutation(self.dataset_len)
        else:
            indices = np.arange(self.dataset_len)
        if self.round_up:
            # pad by wrapping so every rank gets equal counts; tile when
            # the dataset is smaller than the pad (dataset_len <
            # num_replicas would otherwise under-pad and crash the
            # length assert — torch's sampler repeats indices the same way)
            reps = 1 + (self.total_size - 1) // max(1, len(indices))
            indices = np.tile(indices, reps)[: self.total_size]
        indices = indices[self.rank: self.total_size: self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self) -> int:
        return self.num_samples


def collate(samples: Sequence[Tuple[str, np.ndarray, int]]) -> Batch:
    captions = [s[0] for s in samples]
    motions = np.stack([s[1] for s in samples]).astype(np.float32)
    lengths = np.asarray([s[2] for s in samples], dtype=np.int32)
    return captions, motions, lengths


class DataLoader:
    """Minimal batching loader with background single-batch prefetch."""

    def __init__(self, dataset, batch_size: int,
                 sampler: Optional[DistributedSampler] = None,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, prefetch: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or DistributedSampler(
            len(dataset), shuffle=shuffle, seed=seed)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size)

    def _batches(self) -> Iterator[Batch]:
        native = getattr(self.dataset, "has_native", False)
        buf: List = []
        n_batch = 0

        def emit(idxs: List[int]) -> Batch:
            nonlocal n_batch
            if native:
                # deterministic per-batch crop seed: (seed, epoch, batch#)
                seed = ((self.sampler.seed * 1_000_003
                         + self.sampler.epoch) * 131 + n_batch) & 0x7FFFFFFF
                b = self.dataset.get_batch(idxs, seed=seed)
            else:
                b = collate([self.dataset[i] for i in idxs])
            n_batch += 1
            return b

        for idx in self.sampler:
            buf.append(idx)
            if len(buf) == self.batch_size:
                yield emit(buf)
                buf = []
        if buf and not self.drop_last:
            yield emit(buf)

    def __iter__(self) -> Iterator[Batch]:
        if not self.prefetch:
            yield from self._batches()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        _END = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer is gone: an
            # abandoned iteration (e.g. a steps-capped zip over the
            # loader) would otherwise leave this thread blocked in
            # q.put forever, leaking a thread + its queued batches per
            # abandoned epoch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def producer():
            # exceptions MUST propagate to the consumer: a dead worker with
            # a silent queue deadlocks the train loop forever
            try:
                for b in self._batches():
                    if not put(b):
                        return
                put(_END)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
