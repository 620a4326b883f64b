"""Batching loader with distributed sharding + mid-epoch resume.

Replaces torch DataLoader + (Custom)DistributedSampler
(reference dataset/__init__.py:15-79, dataset/sampler.py:12-137): a
deterministic per-epoch shuffle, per-host sharding for multi-host DP, and
`set_last_iter` fast-forward for iteration-level resume.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np


class ShardedSampler:
    def __init__(self, num_samples: int, shard_id: int = 0,
                 num_shards: int = 1, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False):
        self.num_samples = num_samples
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.last_iter = 0
        if drop_last:
            self.shard_len = num_samples // num_shards
        else:
            self.shard_len = -(-num_samples // num_shards)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_last_iter(self, last_iter: int):
        self.last_iter = last_iter

    def __len__(self):
        return self.shard_len

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            g = np.random.RandomState(self.seed + self.epoch)
            order = g.permutation(self.num_samples)
        else:
            order = np.arange(self.num_samples)
        # pad to a multiple of num_shards (wrap-around, torch-style)
        total = self.shard_len * self.num_shards
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        shard = order[self.shard_id:total:self.num_shards]
        start = self.last_iter
        self.last_iter = 0  # only skip once after resume
        return iter(shard[start:].tolist())


def _collate(samples):
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif np.isscalar(vals[0]):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """``num_workers`` > 0 enables the multi-worker analog of the
    reference torch DataLoader (dataset/__init__.py:30-53): a thread
    pool loads+transforms samples concurrently (JPEG decode / PIL warps
    release the GIL) while up to ``prefetch`` whole batches are kept in
    flight ahead of the consumer, so the input pipeline overlaps the
    accelerator step. Batch order and content are identical to the
    synchronous path."""

    def __init__(self, dataset, batch_size: int = 1,
                 sampler: Optional[ShardedSampler] = None,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = True, num_workers: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed)
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self._pool = None

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _batches(self):
        idxs = list(self.sampler)
        bs = self.batch_size
        batches = [idxs[i:i + bs] for i in range(0, len(idxs), bs)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == bs]
        return batches

    def __iter__(self):
        if self.num_workers <= 0:
            for batch in self._batches():
                yield _collate([self.dataset[i] for i in batch])
            return
        yield from self._iter_prefetch()

    def _iter_prefetch(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            # persistent pool: epochs re-iterate without re-spawning
            self._pool = ThreadPoolExecutor(
                self.num_workers, thread_name_prefix="dataloader")
        batches = self._batches()
        window: deque = deque()
        bi = 0
        try:
            while bi < len(batches) or window:
                while bi < len(batches) and len(window) < self.prefetch:
                    window.append([
                        self._pool.submit(self.dataset.__getitem__, i)
                        for i in batches[bi]])
                    bi += 1
                yield _collate([f.result() for f in window.popleft()])
        finally:
            # consumer broke out mid-epoch: drain in-flight work so the
            # next epoch starts clean (futures are cheap to finish)
            for futs in window:
                for f in futs:
                    f.cancel()
