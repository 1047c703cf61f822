"""Batching iterator with background prefetch and per-host sharding.

The device hot loop must never wait on PIL/numpy: batches are assembled
on a worker thread while the previous step runs (host/device overlap —
the reference's single-threaded DataLoader equivalent, minus torch).

Multi-host SPMD: ``host_shard`` deals samples round-robin by
(host_id, host_count) so each process feeds only its local devices —
per-host input pipeline as in SURVEY.md §2.3.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from .dataset import WordImageDataset


def host_shard(samples: Sequence, host_id: int, host_count: int) -> list:
    return list(samples[host_id::host_count])


def _stack(records: list[dict]) -> dict:
    out = {}
    for key in records[0]:
        vals = [r[key] for r in records]
        if isinstance(vals[0], str):
            out[key] = vals  # strings (word, image_name)
        else:
            out[key] = np.stack(vals)
    return out


def batches(
    dataset: WordImageDataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> Iterator[dict]:
    order = np.arange(len(dataset))
    if shuffle:
        (rng or np.random.default_rng(0)).shuffle(order)
    end = len(order) - (len(order) % batch_size) if drop_remainder else len(order)
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        if not drop_remainder and len(idx) < batch_size and len(idx) > 0:
            idx = np.concatenate([idx, idx[: batch_size - len(idx)]])
        yield _stack([dataset[int(i)] for i in idx])


def prefetch(it: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Run the upstream iterator on a worker thread."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item


def epoch_batches(
    dataset: WordImageDataset,
    batch_size: int,
    epoch: int,
    seed: int = 0,
    prefetch_depth: int = 2,
    map_fn=None,
) -> Iterator[dict]:
    """``map_fn`` (e.g. device staging / ``shard_batch``) runs on the
    prefetch worker thread, so H2D transfer dispatch overlaps the
    training step instead of costing main-thread time."""
    rng = np.random.default_rng((seed, epoch))
    it = batches(dataset, batch_size, rng)
    if map_fn is not None:
        it = (map_fn(b) for b in it)
    return prefetch(it, prefetch_depth)
