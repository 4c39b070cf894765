"""Batch assembly + prefetching host->device pipeline.

Reference behavior: torch DataLoader with 4-5 workers + pin_memory
(data.py:180-188,281) and recursive_collate for nested batch structures
(data_fr.py:69-79).

TPU design: a thread-pool loader (decode is PIL/C, releases the GIL)
feeding a small prefetch queue of ready numpy batches; the consumer
overlaps host decode with device compute because jax dispatch is async.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Sequence

import numpy as np


def recursive_collate(items: Sequence[Any]):
    """Stack a list of samples into batched arrays, recursing through
    tuples/lists/dicts (data_fr.py:69-79)."""
    first = items[0]
    if isinstance(first, dict):
        return {k: recursive_collate([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(
            recursive_collate([it[i] for it in items]) for i in range(len(first))
        )
    if isinstance(first, np.ndarray):
        return np.stack(items)
    return np.asarray(items)


class DataLoader:
    """Minimal multi-threaded dataset loader.

    dataset: supports __getitem__/__len__ (any class in data/datasets.py)
    sampler: iterable of indices (or of index-lists for batch samplers)
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        sampler: Iterable[int] | None = None,
        num_workers: int = 4,
        prefetch: int = 4,
        collate: Callable = recursive_collate,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.collate = collate
        self.drop_last = drop_last

    def _index_batches(self) -> Iterator[list[int]]:
        if self.sampler is not None:
            it = iter(self.sampler)
            first = next(it, None)
            if first is None:
                return
            if isinstance(first, (list, tuple, np.ndarray)):
                yield list(first)
                for b in it:
                    yield list(b)
                return
            batch = [first]
            for i in it:
                batch.append(i)
                if len(batch) == self.batch_size:
                    yield batch
                    batch = []
            if batch and not self.drop_last:
                yield batch
            return
        indices = list(range(len(self.dataset)))
        for lo in range(0, len(indices), self.batch_size):
            batch = indices[lo:lo + self.batch_size]
            if len(batch) < self.batch_size and self.drop_last:
                return
            yield batch

    def __iter__(self):
        if self.num_workers == 0:
            for batch in self._index_batches():
                yield self.collate([self.dataset[i] for i in batch])
            return
        yield from self._threaded_iter()

    def _threaded_iter(self):
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches())
        results: dict[int, Any] = {}
        lock = threading.Lock()
        next_emit = [0]
        task_q: queue.Queue = queue.Queue()
        for bi, batch in enumerate(batches):
            task_q.put((bi, batch))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    bi, batch = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    data = self.collate([self.dataset[i] for i in batch])
                except Exception as exc:  # surface loader errors
                    data = exc
                with lock:
                    results[bi] = data
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        n = len(list(self._index_batches()))
        return n
