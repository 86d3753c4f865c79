"""Threaded prefetching batch loader (replaces torch DataLoader + DDP sampler).

Each host builds its own loader over its shard of the clean list (the dataset
already shards by host_id). Worker threads synthesize examples (numpy +
scipy release the GIL in fftconvolve/resample), batches are stacked and
prefetched ahead of the accelerator.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class BatchLoader:
    """Iterate (noisy [B, L], clean [B, L]) batches for one epoch at a time."""

    def __init__(self, dataset, batch_size: int, *, num_workers: int = 4,
                 drop_last: bool = True, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def epoch(self, epoch: int):
        """Generator of batches for the given epoch (deterministic order)."""
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(indices)
        if self.drop_last:
            indices = indices[: len(indices) - len(indices) % self.batch_size]

        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Never block forever on a full queue: if the consumer exits
            # early (preemption SIGTERM, an exception in the train step, a
            # break out of the epoch), it sets `stop` and no longer drains —
            # an unconditional q.put() would then leak this thread, the
            # worker pool, and the prefetched batches it pins.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Any worker exception must reach the consumer — a silently dead
            # producer would leave the training loop blocked on q.get()
            # forever (observed with a bad config: the mixing draw raised in
            # a worker and the whole trainer hung).
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                    for batch_idx in batches:
                        if stop.is_set():
                            break
                        items = list(ex.map(self.dataset.__getitem__, batch_idx))
                        arrays = tuple(
                            np.stack([item[i] for item in items])
                            for i in range(len(items[0]))
                            if isinstance(items[0][i], np.ndarray)
                        )
                        if not put(arrays):
                            return
            except BaseException as exc:  # noqa: BLE001 — re-raised consumer-side
                put(exc)
            else:
                put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            thread.join(timeout=5.0)
            if thread.is_alive():
                # A worker mid-__getitem__ can exceed the join timeout; the
                # daemon thread exits on its next stop check so the leak is
                # bounded, but the stall must be observable, not silent.
                from fullsubnet_plus_tpu.utils import logger

                logger.log(
                    "[Loader] WARNING: producer thread still alive 5 s after "
                    "stop — a dataset worker is slow to finish its batch; it "
                    "will exit on its next stop check"
                )
