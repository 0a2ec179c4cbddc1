"""Host -> device feeding: threaded decode + double-buffered prefetch.

Replaces the reference's ``DataLoader(num_workers=8, pin_memory=True)``
(reference ``run.py:155``, ``trainer.py:305-310``) with a JAX-native pipeline:
a thread pool decodes/collates numpy batches while ``PrefetchLoader`` keeps
``prefetch`` batches already transferred to device memory, so the accelerator
never waits on PIL/h5py. Augmentation does NOT happen here — it runs on device
inside the jitted train step (see ``data/transforms.py``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import numpy as np

#: formats the C++ decoders handle (PNG 8/16-bit ct 0/2/3/4/6 non-interlaced,
#: baseline TIFF none/packbits, PNM) — anything else uses the PIL threads.
NATIVE_EXTS = {"pgm", "ppm", "png", "tif", "tiff"}


def native_loader_for(dataset, batch_size: int, num_workers: int = 4):
    """Build a ``data.native.NativeBatchLoader`` over an inference ``Run``
    dataset when the native fast path applies (all pair files in
    ``NATIVE_EXTS`` and the first pair probe-decodes — PNG/TIFF variants the
    minimal decoders reject fall back to the Python loader's PIL threads).
    Returns None when inapplicable."""
    try:
        from piv_liteflownet_tpu.data.native import (NativeBatchLoader,
                                                     NativeSeqLoader, get_lib,
                                                     image_read)
    except Exception:  # pragma: no cover
        return None
    if get_lib() is None:
        return None
    if hasattr(dataset, "index_pairs") and hasattr(dataset, "reader"):
        # packed .pivseq container (data/pivseq.PivseqRun): mmap + dequantize,
        # no decode — the production multi-chip serving feed
        try:
            return NativeSeqLoader(dataset, batch_size,
                                   threads=max(2, num_workers))
        except Exception:
            return None
    pairs = getattr(dataset, "pairs", None)
    if not pairs:
        return None
    exts = {p.rsplit(".", 1)[-1].lower() for pair in pairs for p in pair}
    if not exts <= NATIVE_EXTS:
        return None
    try:
        probe = image_read(pairs[0][0])
    except Exception:
        return None
    h, w = probe.shape[0], probe.shape[1]
    # oversubscription on small hosts collapses throughput (measured: 8
    # threads on 1 cpu = 2.4 pairs/s vs 13.1 at 4; work/prof_ingest.py)
    import os as _os

    threads = max(2, min(num_workers, 4 * (_os.cpu_count() or 1)))
    return NativeBatchLoader(pairs, batch_size, h, w, threads=threads)


def native_train_loader_for(dataset, batch_size: int, num_workers: int = 4,
                            shuffle: bool = True, seed: int = 0,
                            drop_last: bool = True):
    """Native training ingest over a file-triplet dataset (PIVData-style
    ``.samples`` of (img1, img2, flo) paths): C++ image + .flo decode on a
    pthread pool, replacing the Python ``BatchLoader``'s per-sample PIL path
    in the trainer (reference analog: ``DataLoader(num_workers=8,
    pin_memory=True)``, reference ``trainer.py:305-310``). Returns None when
    the dataset has no path triplets or a format the minimal decoders
    reject."""
    try:
        from piv_liteflownet_tpu.data.native import (NativeTrainLoader, flo_read,
                                                     get_lib, image_read)
    except Exception:  # pragma: no cover
        return None
    if get_lib() is None:
        return None
    samples = getattr(dataset, "samples", None)
    if not samples or len(samples[0]) != 3:
        return None
    exts = {p.rsplit(".", 1)[-1].lower() for s in samples for p in s[:2]}
    if not exts <= NATIVE_EXTS:
        return None
    try:
        probe = image_read(samples[0][0])
        fprobe = flo_read(samples[0][2])
    except Exception:
        return None
    import os as _os

    threads = max(2, min(num_workers, 4 * (_os.cpu_count() or 1)))
    return NativeTrainLoader(
        samples, batch_size, probe.shape[0], probe.shape[1],
        fprobe.shape[0], fprobe.shape[1], threads=threads,
        shuffle=shuffle, seed=seed, drop_last=drop_last)


def _collate(samples):
    """Stack a list of dataset samples into batch arrays.

    Supports ((img1, img2), name) inference samples and
    ((img1, img2), flow) training samples.
    """
    firsts, seconds, metas = [], [], []
    for (i1, i2), meta in samples:
        firsts.append(i1)
        seconds.append(i2)
        metas.append(meta)
    im1 = np.stack(firsts)
    im2 = np.stack(seconds)
    if isinstance(metas[0], np.ndarray):
        metas = np.stack(metas)
    return (im1, im2), metas


class BatchLoader:
    """Sequential batched loader with threaded sample decode.

    Yields ``((im1[B,H,W,3], im2[B,H,W,3]), metas)``. The final partial batch
    is emitted as-is (shape bucketing / padding is the caller's choice).
    """

    def __init__(self, dataset, batch_size: int = 1, num_workers: int = 4,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle stream to a global epoch number so a resumed run
        sees the same batch order as an uninterrupted one (the torch analog is
        ``DistributedSampler.set_epoch``)."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        self._epoch += 1
        bs = self.batch_size
        batches = [idx[i : i + bs] for i in range(0, len(idx), bs)]
        if self.drop_last and batches and len(batches[-1]) < bs:
            batches.pop()

        if self.num_workers <= 0:
            # torch DataLoader semantics: num_workers=0 loads synchronously
            # in the calling thread (reference run.py/trainer.py pass it
            # through from --number_workers)
            for batch_idx in batches:
                yield _collate([self.dataset[int(i)] for i in batch_idx])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # Pipeline: keep 2 batches of futures in flight.
            pending = []
            bi = 0

            def submit(batch_idx):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in batch_idx]

            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < 2:
                    pending.append(submit(batches[bi]))
                    bi += 1
                futs = pending.pop(0)
                yield _collate([f.result() for f in futs])


class PrefetchLoader:
    """Wrap an iterator of numpy batches; keep ``prefetch`` batches on device.

    The JAX answer to pinned-memory prefetch: ``jax.device_put`` happens on a
    background thread (optionally with a target ``Sharding`` for multi-chip
    data parallelism) while the main thread consumes already-resident arrays.
    """

    def __init__(self, inner: Iterable, prefetch: int = 2, sharding=None):
        self.inner = inner
        self.prefetch = prefetch
        self.sharding = sharding

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        import jax

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def put(x):
            if not isinstance(x, np.ndarray) or x.dtype == object:
                return x  # names / metadata stay on host
            if self.sharding is not None:
                return jax.device_put(x, self.sharding)
            return jax.device_put(x)

        def producer():
            try:
                for batch in self.inner:
                    q.put(jax.tree.map(put, batch))
            except Exception as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
