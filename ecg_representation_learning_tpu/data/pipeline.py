"""Input pipeline: double-buffered host->HBM prefetch + streaming shards.

The north star (BASELINE.json) calls for pretraining over ~850k records
(CinC21 + MIMIC-IV-ECG) that do not fit HBM: a double-buffered input pipeline
overlapping host reads + H2D transfer with device compute, so training is
never input-bound.  (The reference's pipeline is the opposite extreme: one
HDF5 row read per ``__getitem__`` with zero workers -- dataset.py:93,
ptb_dataset.py:87.)

Two layers:
  * ``prefetch_to_device``: wraps any host batch iterator; keeps ``depth``
    batches in flight via async ``jax.device_put`` (dispatch is non-blocking,
    so the transfer of batch t+1 overlaps the compute of batch t).
  * ``ShardedRecordStream``: epoch-shuffled streaming over a list of on-disk
    shards (HDF5 'data' datasets), loading one shard to host RAM at a time
    with a background thread, yielding fixed-size batches.
"""
from __future__ import annotations

import json
import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np


def prefetch_to_device(iterator: Iterator, depth: int = 2, sharding=None) -> Iterator:
    """Keep ``depth`` device-resident batches in flight ahead of the consumer.

    Non-array leaves (e.g. the corpus index of a ``MixedRecordStream``
    ``(idx, batch)`` item) pass through untouched -- they are host-side
    routing metadata, and device_put-ing them would cost a per-step sync to
    read back."""
    buf = []

    def put(x):
        if not hasattr(x, 'shape'):
            return x
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    for item in iterator:
        buf.append(jax.tree.map(put, item))
        if len(buf) >= depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


class ShardedRecordStream:
    """Stream (signals, labels?) batches from a list of HDF5 shards.

    A background thread reads shard t+1 from disk while shard t is consumed
    (the host-side half of double buffering; the device half is
    ``prefetch_to_device``).  Shard order reshuffles every epoch.
    """

    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 seed: int = 77, dataset: str = 'data', drop_last: bool = True,
                 loop: bool = False, dtype=np.float32):
        """``dtype=None`` keeps the stored dtype -- e.g. int16 ADC-count shards
        transferred raw and converted on device (train_stream wire_scale)."""
        assert shard_paths
        self.paths = list(shard_paths)
        self.batch_size = batch_size
        self.dataset = dataset
        self.drop_last = drop_last
        self.loop = loop
        self.dtype = dtype
        self.rng = np.random.default_rng(seed)

    def _load_shard(self, path: str) -> np.ndarray:
        import h5py
        with h5py.File(path, 'r') as f:
            arr = np.asarray(f[self.dataset])
            return arr if self.dtype is None else arr.astype(self.dtype)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            order = self.rng.permutation(len(self.paths))
            q: 'queue.Queue' = queue.Queue(maxsize=1)

            def producer():
                for si in order:
                    q.put(self._load_shard(self.paths[si]))
                q.put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            while True:
                shard = q.get()
                if shard is None:
                    break
                idx = self.rng.permutation(shard.shape[0])
                stop = (len(idx) // self.batch_size) * self.batch_size \
                    if self.drop_last else len(idx)
                for i in range(0, stop, self.batch_size):
                    take = idx[i:i + self.batch_size]
                    if take.size < self.batch_size and self.drop_last:
                        break
                    yield shard[take]
            t.join()
            if not self.loop:
                return


class MixedRecordStream:
    """Weighted mixture over N corpora of shards (BASELINE config 5: e.g.
    CinC21 + MIMIC-IV-ECG pretraining).

    Each corpus is its own :class:`ShardedRecordStream` (looping); every draw
    picks corpus ``i`` with probability ``weights[i]`` and yields
    ``(i, batch)`` -- whole batches stay single-corpus because corpora may
    differ in native rate, record length, and wire scale, so each needs its
    own compiled train step (``MaeTrainer.train_stream`` maps the index to
    the right per-corpus program).

    Deterministic: the corpus choice sequence is a seeded stream independent
    of the per-corpus shard/record shuffles, so a killed run resumed via
    ``itertools.islice`` replays bit-identically (the exact-resume contract
    of ``train_stream``).
    """

    def __init__(self, corpora: Sequence[Sequence[str]], batch_size: int,
                 weights: Optional[Sequence[float]] = None, seed: int = 77,
                 dataset: str = 'data', dtype=None):
        """``corpora``: one shard-path list per corpus.  ``dtype=None`` keeps
        each shard's stored dtype (int16 wire passes through raw)."""
        assert corpora and all(len(c) for c in corpora)
        w = np.asarray([1.0] * len(corpora) if weights is None else weights,
                       np.float64)
        assert w.shape == (len(corpora),) and (w > 0).all(), w
        self.weights = w / w.sum()
        # child seeds decorrelated from each other and from the mix choices
        self.streams = [
            ShardedRecordStream(paths, batch_size, seed=seed + 1000 * (i + 1),
                                dataset=dataset, loop=True, dtype=dtype)
            for i, paths in enumerate(corpora)]
        self.seed = seed

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        its = [iter(s) for s in self.streams]
        rng = np.random.default_rng(self.seed)
        while True:
            i = int(rng.choice(len(its), p=self.weights))
            yield i, next(its[i])


def device_batches(signals: np.ndarray, labels: Optional[np.ndarray],
                   batch_size: int, rng: np.random.Generator,
                   sharding=None, depth: int = 2,
                   drop_last: bool = True) -> Iterator:
    """Shuffled minibatches from host arrays, prefetched to device."""
    n = signals.shape[0]
    idx = rng.permutation(n)
    stop = (n // batch_size) * batch_size if drop_last else n

    def gen():
        for i in range(0, stop, batch_size):
            take = idx[i:i + batch_size]
            if labels is None:
                yield signals[take]
            else:
                yield signals[take], labels[take]

    return prefetch_to_device(gen(), depth=depth, sharding=sharding)
