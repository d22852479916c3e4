"""Batched, shuffled, prefetching data loader (threaded decode, no torch).

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
usage (worker processes, pin_memory — ``load_data_local.py:99-104``):
a thread pool decodes/transforms images (PIL releases the GIL around codec
work), a bounded queue keeps ``prefetch`` batches ready, and
:func:`device_prefetch` double-buffers host->device transfers so the TPU
never waits on input (SURVEY.md §7: "keeping a v5e fed ... is the real
throughput risk").

Multi-host: ``shard_hosts=True`` makes each process iterate only its
``process_index``-strided slice — per-host data sharding for DP.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["DataLoader", "device_prefetch"]


class _ProducerError:
    """Wraps an exception raised in the producer thread for re-raise in the
    consuming thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Iterable over (batch_images, batch_labels) NumPy tuples.

    Each ``iter()`` reshuffles with a per-epoch seed (base_seed + epoch),
    reproducing the reference's seeded-generator loaders
    (``subset_celebra.py``, ``celebraHQ.py:70-72``) deterministically.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        shard_hosts: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, int(num_workers))
        self.prefetch = max(1, int(prefetch))
        self.shard_hosts = shard_hosts
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.shard_hosts:
            import jax

            idx = idx[jax.process_index() :: jax.process_count()]
        return idx

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        indices = self._epoch_indices()
        self._epoch += 1  # next iter() reshuffles differently
        nb = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            nb += 1
        if nb == 0:
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # the sentinel/error MUST reach the consumer even when the
            # dataset raises, or the consumer blocks on get() forever
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, chunk))
                        xs = np.stack([it[0] for it in items]).astype(np.float32)
                        ys = np.asarray([it[1] for it in items], dtype=np.int32)
                        out_q.put((xs, ys))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                out_q.put(_ProducerError(e))
                return
            finally:
                if not stop.is_set():
                    out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while True:
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Move batches to device ahead of consumption (double/triple buffer).

    ``sharding`` (e.g. ``batch_sharding(mesh)``) places each batch directly
    into its DP layout; transfers overlap with the running step.
    """
    import collections

    import jax

    buf = collections.deque()

    def put(item):
        x, y = item if isinstance(item, tuple) else (item, None)
        xd = jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
        return (xd, y)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
