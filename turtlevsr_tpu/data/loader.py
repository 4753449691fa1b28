"""Prefetching batch loader.

The reference uses torch DataLoader worker processes plus an optional
background-thread prefetcher (prefetch_dataloader.py:11-41, data/__init__.py
:61-130). Here: a thread pool decodes clips (image decode releases the GIL)
and a bounded queue keeps batches ready while the TPU steps — host-side
input pipeline for a device-bound training loop.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def prefetch_iter(iterable, depth: int = 2):
    """Run `iterable` in a background thread, keeping up to `depth` items
    decoded ahead of the consumer — hides host-side frame decode behind
    device compute in the streaming-inference loop. Exceptions in the
    producer re-raise at the consumer's next pull; breaking out of the
    consuming loop is safe (the producer is a daemon and unblocks on a
    bounded put timeout)."""
    if depth < 1:
        # Queue(maxsize=0) would mean UNBOUNDED — the producer would decode
        # the whole stream into host RAM instead of "no readahead"
        raise ValueError(f"prefetch depth must be >= 1, got {depth}")
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END, _ERR = object(), object()

    def produce():
        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for item in iterable:
                if not put((None, item)):
                    return
        except BaseException as e:  # re-raised consumer-side
            put((_ERR, e))
            return
        put((_END, None))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            tag, item = q.get()
            if tag is _END:
                break
            if tag is _ERR:
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():
            q.get_nowait()


class PrefetchLoader:
    def __init__(self, dataset, sampler, batch_size: int, *,
                 num_workers: int = 2, prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, items):
        return {
            "lq": np.stack([it["lq"] for it in items]),
            "gt": np.stack([it["gt"] for it in items]),
            "key": [it["key"] for it in items],
        }

    def __iter__(self) -> Iterator[dict]:
        idx_iter = iter(self.sampler)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                batch_idx = []
                try:
                    for i in idx_iter:
                        batch_idx.append(i)
                        if len(batch_idx) == self.batch_size:
                            items = list(pool.map(self.dataset.__getitem__,
                                                  batch_idx))
                            if stop.is_set():
                                return
                            q.put(self._collate(items))
                            batch_idx = []
                    if batch_idx and not self.drop_last and not stop.is_set():
                        items = list(pool.map(self.dataset.__getitem__,
                                              batch_idx))
                        q.put(self._collate(items))
                finally:
                    q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                q.get_nowait()
