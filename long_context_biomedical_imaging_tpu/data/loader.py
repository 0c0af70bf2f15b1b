"""Host-side streaming batch loader.

Replaces torch DataLoader + DistributedSampler (ref: trainer/trainer_base.py:
126-135,276-283): a thread-pool prefetch pipeline that yields batched numpy
arrays. Multi-host runs shard subjects by `jax.process_index()` (each process
loads only its slice, like DistributedSampler); single-process multi-chip
sharding happens at device-put time in the trainer.

Batch-size-1 batches are duplicated like the reference (BatchNorm needs >1
sample; ref: trainer_base.py:161-164).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 4, prefetch_batches: int = 4,
                 drop_last: bool = False, duplicate_singleton: bool = True,
                 pad_to_batch: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.drop_last = drop_last
        self.duplicate_singleton = duplicate_singleton
        self.pad_to_batch = pad_to_batch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
            rng.shuffle(idx)
        # shard across processes (DistributedSampler equivalent)
        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1:
            idx = idx[pi::pc]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def collate(batch_idx):
            items = list(self._pool.map(self.dataset.__getitem__, batch_idx))
            images = np.stack([it[0] for it in items])
            labels = np.stack([it[1] for it in items])
            ids = [it[2] for it in items]
            n_valid = images.shape[0]
            if n_valid == 1 and self.duplicate_singleton:
                images = np.concatenate([images, images])
                labels = np.concatenate([labels, labels])
                ids = ids + ids
                n_valid = 2
            if self.pad_to_batch and images.shape[0] < self.batch_size:
                # pad with repeats so the compiled step sees one static shape;
                # n_valid lets metrics ignore the padding
                reps = self.batch_size - images.shape[0]
                images = np.concatenate([images, images[:1].repeat(reps, axis=0)])
                labels = np.concatenate([labels, labels[:1].repeat(reps, axis=0)])
            return images, labels, ids, n_valid

        def put_or_stop(item) -> bool:
            # never block forever: an early-exiting consumer (e.g. --debug)
            # sets `stop` and must be able to unblock a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        error: list = []

        def producer():
            try:
                for b in batches:
                    if stop.is_set() or not put_or_stop(collate(b)):
                        return
            except BaseException as e:  # surfaced to the consumer below
                error.append(e)
            finally:
                # The end-of-epoch sentinel must never be dropped: block (with
                # stop-awareness) rather than put_nowait, which silently loses
                # it when the queue is full and leaves the consumer hung.
                put_or_stop(None)

        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                try:
                    item = q.get(timeout=5.0)
                except queue.Empty:
                    if not thread.is_alive():
                        break  # producer died without a sentinel
                    continue
                if item is None:
                    break
                yield item
            if error:
                raise error[0]
        finally:
            stop.set()
            # drain so a producer blocked on a full queue can observe `stop`
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=5.0)
            self._pool.shutdown(wait=False)
