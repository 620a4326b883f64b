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
    def __init__(self, dataset, batch_size: int = 1,
                 sampler: Optional[ShardedSampler] = None,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(self.dataset[idx])
            if len(batch) == self.batch_size:
                yield _collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield _collate(batch)
