"""Batched loader with threaded decode and device prefetch.

Replaces torch DataLoader (data/__init__.py:33-66): a thread pool decodes
and assembles samples (the reference uses n_threads=8 worker processes);
batches are asynchronously transferred so host decode overlaps device
compute. Under a dp mesh, batches are placed with the batch axis sharded
across devices.

Multi-host (SURVEY.md §2.2 "data loading sharded per host process"):
every process builds the SAME shuffled order (seed+epoch only), then
loads only its `process_index::process_count` stride of each global
batch; `prefetch_to_device` assembles the logically-global array from the
process-local shard via `jax.make_array_from_process_local_data`, so no
host ever materializes the full global batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np
import jax

from speinet_tpu.config import Config
from speinet_tpu.data.videodata import VideoDataset


class BatchIterator:
    """Shuffled epoch iterator producing stacked numpy batches."""

    def __init__(self, dataset: VideoDataset, batch_size: int, shuffle: bool,
                 seed: int, n_threads: int = 8, drop_last: bool = False,
                 process_index: int = 0, process_count: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.n_threads = n_threads
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over "
                    f"{process_count} processes")
            if not drop_last:
                raise ValueError("multi-host loading requires drop_last so "
                                 "every process sees equal shards")

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, list]]:
        epoch = self.epoch           # snapshot: shuffle and per-sample rng
        self.epoch += 1              # streams share one epoch label
        rng = np.random.default_rng((self.seed, epoch))
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)

        def fetch(i):
            # per-sample rng stream: deterministic given (seed, epoch, index)
            srng = np.random.default_rng((self.seed, epoch, int(i)))
            return self.ds.__getitem__(int(i), rng=srng)

        with ThreadPoolExecutor(max_workers=self.n_threads) as pool:
            for start in range(0, len(order), self.batch_size):
                chunk = order[start : start + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                # per-process stride of the global batch: this process
                # decodes only 1/P of the samples
                chunk = chunk[self.process_index::self.process_count]
                samples = list(pool.map(fetch, chunk))
                inputs = np.stack([s[0] for s in samples])
                gts = np.stack([s[1] for s in samples])
                labels = np.stack([s[2] for s in samples])
                names = [s[3] for s in samples]
                if len(samples[0]) > 4:      # bm mode: 5th stream
                    yield inputs, gts, labels, names, np.stack([s[4] for s in samples])
                else:
                    yield inputs, gts, labels, names


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Overlap host batch assembly with device compute.

    Wraps a batch iterator; numpy arrays are device_put (optionally with a
    NamedSharding so the batch axis lands sharded across the dp mesh)
    `depth` batches ahead of consumption.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    multihost = sharding is not None and jax.process_count() > 1

    def place(a):
        if not (isinstance(a, np.ndarray) and sharding is not None):
            return a
        if multihost:
            # each process holds 1/P of the batch; assemble the global
            # jax.Array from the process-local shard (no host gathers all)
            return jax.make_array_from_process_local_data(sharding, a)
        return jax.device_put(a, sharding)

    def put(batch):
        q.put(tuple(place(a) for a in batch))

    def producer():
        try:
            for batch in iterator:
                put(batch)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


DATASET_MODES = {
    # name-based dataset dispatch (parity: data/__init__.py:41-42 dynamic
    # import of data.<name>): DVD_NFS -> videodata_nfs.py semantics,
    # DVD -> videodata.py (blur-map stream), DVD_ORI -> videodata-ori.py
    "DVD_NFS": "nsf",
    "DVD": "bm",
    "DVD_ORI": "plain",
}


def make_dataset(cfg: Config, name: str, train: bool) -> VideoDataset:
    mode = DATASET_MODES.get(name.upper())
    if mode is None:
        raise NotImplementedError(f"Dataset [{name}] is not found")
    return VideoDataset(cfg, name=name, train=train, mode=mode)


class Data:
    """Train + test loaders (parity: data/__init__.py:33-66)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        if not cfg.test_only:
            trainset = make_dataset(cfg, cfg.data_train, train=True)
            self.loader_train = BatchIterator(trainset, cfg.batch_size,
                                              shuffle=True, seed=cfg.seed,
                                              n_threads=cfg.n_threads,
                                              drop_last=True,
                                              process_index=jax.process_index(),
                                              process_count=jax.process_count())
        else:
            self.loader_train = None
        testset = make_dataset(cfg, cfg.data_test, train=False)
        self.loader_test = BatchIterator(testset, 1, shuffle=False,
                                         seed=cfg.seed, n_threads=cfg.n_threads)
