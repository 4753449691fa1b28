"""Distributed sampler (data_sampler.py:11-54 EnlargedSampler equivalent).

Epoch-seeded permutation of num_samples * world_size indices (modulo-wrapped
into the dataset, supporting the dataset-enlarge ratio for iteration-based
training), rank-strided slice. Uses numpy's RandomState instead of a torch
Generator — the permutation differs bit-for-bit but the distribution and
determinism guarantees are identical.
"""

from __future__ import annotations

import math

import numpy as np


class EnlargedSampler:
    def __init__(self, num_items: int, num_replicas: int, rank: int,
                 ratio: int = 1):
        self.num_items = num_items
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(num_items * ratio / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        g = np.random.RandomState(self.epoch)
        indices = g.permutation(self.total_size) % self.num_items
        return iter(indices[self.rank:self.total_size:self.num_replicas]
                    .tolist())
