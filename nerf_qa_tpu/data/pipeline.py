"""Batch assembly + prefetching host->device pipeline.

Reference behavior: torch DataLoader with 4-5 workers + pin_memory
(data.py:180-188,281) and recursive_collate for nested batch structures
(data_fr.py:69-79).

TPU design: a thread-pool loader (decode is PIL/C, releases the GIL)
feeding a small prefetch queue of ready numpy batches; the consumer
overlaps host decode with device compute because jax dispatch is async.
:func:`device_prefetch` adds the H2D leg: a small ring of batches already
transferred (device_put is async) so the chip never waits on PCIe/ICI for
the next batch.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Sequence

import numpy as np


def device_prefetch(batches: Iterable, buffer_size: int = 2, device=None):
    """Double-buffered host->device feed: keep ``buffer_size`` batches
    already device_put ahead of the consumer, overlapping transfer with
    device compute (jax transfers are async; the consumer's jitted step
    dequeues an already-resident batch)."""
    import jax

    def put(batch):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), device), batch
        )

    it = iter(batches)
    buf: collections.deque = collections.deque()
    try:
        for _ in range(max(1, buffer_size)):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        nxt = next(it, None)
        if nxt is not None:
            buf.append(put(nxt))
        yield out


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
        self._len: int | None = None

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
        """Streaming thread-pool iteration: a feeder thread submits index
        batches into a bounded task queue (no upfront materialization of
        the epoch), workers decode+collate, and batches re-emit in order
        through a results reorder buffer."""
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        results: dict[int, Any] = {}
        lock = threading.Lock()
        next_emit = [0]
        total = [None]  # set by the feeder when the sampler is exhausted
        task_q: queue.Queue = queue.Queue(
            maxsize=max(2 * self.num_workers, self.prefetch)
        )
        stop = threading.Event()
        _END = object()

        def _put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def feeder():
            count = 0
            for bi, batch in enumerate(self._index_batches()):
                if not _put(task_q, (bi, batch)):
                    return
                count += 1
            total[0] = count
            for _ in range(self.num_workers):
                if not _put(task_q, _END):
                    return
            with lock:
                if count == next_emit[0]:
                    _put(out_q, _END)

        def worker():
            while not stop.is_set():
                try:
                    item = task_q.get(timeout=0.1)
                except queue.Empty:
                    continue
                if item is _END:
                    return
                bi, batch = item
                try:
                    data = self.collate([self.dataset[i] for i in batch])
                except Exception as exc:  # surface loader errors
                    data = exc
                with lock:
                    results[bi] = data
                    while next_emit[0] in results:
                        _put(out_q, results.pop(next_emit[0]))
                        next_emit[0] += 1
                    if total[0] is not None and next_emit[0] == total[0]:
                        _put(out_q, _END)

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                item = out_q.get()
                if item is _END:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        # batch count is epoch-invariant for all samplers here
        # (SceneBalancedSampler emits min_count * n_scenes indices every
        # epoch); compute once instead of re-enumerating per call.
        if self._len is None:
            self._len = sum(1 for _ in self._index_batches())
        return self._len
