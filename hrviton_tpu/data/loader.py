"""Batching / prefetching loader feeding device buffers.

Replaces CPDataLoader (/root/reference/cp_dataset.py:404-426): an infinite
iterator with shuffle, drop_last and auto-restart, plus background prefetch so
host PIL preprocessing (the get_agnostic drawing is CPU-heavy at 1024x768,
SURVEY.md §7 hard parts) overlaps device compute. Thread pool decodes samples
in parallel; string keys ('im_name', 'c_name') are carried out-of-band since
they never reach the device.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["Loader", "collate"]

_STR_KEYS = ("im_name", "c_name")


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack a list of sample dicts into a batch dict (nested one level for
    the cloth 'paired'/'unpaired' sub-dicts)."""
    out: Dict = {}
    first = samples[0]
    for k, v in first.items():
        if k in _STR_KEYS:
            if isinstance(v, dict):
                out[k] = {kk: [s[k][kk] for s in samples] for kk in v}
            else:
                out[k] = [s[k] for s in samples]
        elif isinstance(v, dict):
            out[k] = {kk: np.stack([s[k][kk] for s in samples]) for kk in v}
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    """Infinite prefetching batch loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0,
                 indices: Optional[Sequence[int]] = None,
                 process_id: int = 0, num_processes: int = 1):
        """batch_size is the GLOBAL batch. Under multi-host (num_processes>1)
        every process shuffles the identical seeded permutation and yields
        only its contiguous slice of each global chunk — the per-process
        batches concatenate (in process order) to exactly the single-host
        batch, matching shard_batch's process-local assembly."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if batch_size % num_processes:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{num_processes} processes")
        self._num_processes = num_processes
        self._proc_lo = (batch_size // num_processes) * process_id
        self._proc_hi = self._proc_lo + batch_size // num_processes
        self._indices = list(indices) if indices is not None \
            else list(range(len(dataset)))
        self._rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _epoch_batches(self) -> Iterator[List[int]]:
        idx = self._indices[:]
        if self.shuffle:
            self._rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last or self._num_processes > 1:
                    return  # ragged tails can't shard evenly across processes
                yield chunk
                continue
            yield chunk[self._proc_lo:self._proc_hi]

    def _produce(self):
        while not self._stop.is_set():
            for chunk in self._epoch_batches():
                samples = list(self._pool.map(self.dataset.__getitem__, chunk))
                batch = collate(samples)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return

    def next_batch(self) -> Dict:
        return self._q.get()

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False)
