"""Prefetching data loader.

Replaces the reference's torch DataLoader worker pool (ref: train.py:43-51)
with a thread-pool pipeline: cv2 jpeg decode releases the GIL, so threads
saturate host IO while the TPU computes; batches are staged ``prefetch``
deep.  Deterministic per-epoch shuffling and per-sample RNG streams replicate
``worker_init_reset_seed`` determinism (ref: thirdparty/utils/data_utils.py:14-21).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from otpose_tpu.data.pipeline import collate_host_samples


class Loader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 8888, drop_last: bool = False,
                 prefetch: int = 2, native_host: bool = True,
                 process_index: int = 0, process_count: int = 1):
        # native_host: route each sample's warp/normalize/target-gen through
        # the C++/OpenMP batch kernels when native/libotpose_io.so is built
        # (float-bilinear warp, ~1 u8 LSB vs cv2's fixed point — see
        # PoseTrackDataset.get_sample_host)
        self.native_host = native_host
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self._start_iteration = 0
        # multi-host jobs: batch_size is the GLOBAL batch; every process
        # computes the same shuffled index batches (same seed/epoch) and
        # loads only its contiguous row block — process-major, matching how
        # P('data') lays rows over jax.devices() (parallel/distributed.py::
        # local_row_block).  Sample RNG is index-keyed, so the augmentation
        # draw for a given sample is identical no matter which host loads it.
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            assert drop_last, "multi-host loading requires drop_last=True"
            assert batch_size % process_count == 0, \
                f"global batch {batch_size} not divisible by {process_count}"

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_start_iteration(self, k: int):
        """Skip the first ``k`` batches of the NEXT iteration pass only
        (iteration-exact preemption resume).  Exact because both the epoch
        shuffle and the per-sample augmentation RNG are index-keyed, not
        sequence-keyed — skipped batches consume no randomness."""
        self._start_iteration = int(k)

    def _index_batches(self):
        n = len(self.dataset)
        idxs = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idxs)
        batches = [idxs[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.process_count > 1:
            per = self.batch_size // self.process_count
            lo = self.process_index * per
            batches = [b[lo:lo + per] for b in batches]
        start, self._start_iteration = self._start_iteration, 0
        return batches[start:]

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_sample(args):
            bidx, within, idx = args
            rng = np.random.RandomState(
                (self.seed + self.epoch * 1_000_003 + idx) % (2 ** 31))
            return self.dataset.get_sample_host(int(idx), rng=rng,
                                                native_ok=self.native_host)

        def producer():
            # Any sample-load failure is forwarded to the consumer instead of
            # silently killing this thread (which would hang out_q.get()).
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for bidx, batch_idxs in enumerate(batches):
                        if stop.is_set():
                            break
                        args = [(bidx, j, idx) for j, idx in enumerate(batch_idxs)]
                        samples = list(pool.map(load_sample, args))
                        out_q.put(collate_host_samples(samples))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
