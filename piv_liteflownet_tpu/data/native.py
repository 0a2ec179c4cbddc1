"""ctypes bindings for the native I/O runtime (libpivio).

The C++ side (``data/_native/pivio.cpp``) provides C-speed ``.flo`` codecs,
PGM/PPM decode, and a pthread-pool batch loader that keeps a ring of decoded
float32 NHWC batches ahead of the device feed — the native replacement for
the reference's DataLoader worker processes (reference ``run.py:155``).

The library is built lazily on first use (g++ is in the base image); all
entry points degrade gracefully to the Python implementations if the build
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "pivio.cpp")
_LIB_PATH = os.path.join(_HERE, "_native", "libpivio.so")
_lock = threading.Lock()
_lib = None


def build_library(force: bool = False) -> Optional[str]:
    """Compile libpivio.so if needed; returns its path or None on failure."""
    with _lock:
        if not force and os.path.isfile(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
        ):
            return _LIB_PATH
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
            _SRC, "-lz", "-o", _LIB_PATH,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            return _LIB_PATH
        except Exception:
            return None


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.pivio_flo_read.restype = ctypes.c_int
    lib.pivio_flo_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.pivio_flo_write.restype = ctypes.c_int
    lib.pivio_flo_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pivio_image_read.restype = ctypes.c_int
    lib.pivio_image_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.pivio_loader_create.restype = ctypes.c_void_p
    lib.pivio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pivio_loader_create_flow.restype = ctypes.c_void_p
    lib.pivio_loader_create_flow.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pivio_loader_next_flow.restype = ctypes.c_int
    lib.pivio_loader_next_flow.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pivio_loader_batches.restype = ctypes.c_long
    lib.pivio_loader_batches.argtypes = [ctypes.c_void_p]
    lib.pivio_loader_next.restype = ctypes.c_int
    lib.pivio_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.pivio_loader_destroy.restype = None
    lib.pivio_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.pivio_seq_info.restype = ctypes.c_int
    lib.pivio_seq_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.pivio_seq_read_frame.restype = ctypes.c_int
    lib.pivio_seq_read_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.pivio_seqloader_create.restype = ctypes.c_void_p
    lib.pivio_seqloader_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def flo_read(path: str, bands: int = 2) -> np.ndarray:
    """Native .flo read (same contract as utils.flow_io.read_flow)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libpivio unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pivio_flo_read(path.encode(), None, 0, ctypes.byref(h), ctypes.byref(w), bands)
    if rc != 0:
        raise IOError(f"flo_read({path}) failed rc={rc}")
    out = np.empty((h.value, w.value, bands), np.float32)
    rc = lib.pivio_flo_read(path.encode(), _fptr(out), out.size,
                            ctypes.byref(h), ctypes.byref(w), bands)
    if rc != 0:
        raise IOError(f"flo_read({path}) failed rc={rc}")
    return out


def flo_write(path: str, flow: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libpivio unavailable")
    flow = np.ascontiguousarray(flow, np.float32)
    h, w, bands = flow.shape
    rc = lib.pivio_flo_write(path.encode(), _fptr(flow), h, w, bands)
    if rc != 0:
        raise IOError(f"flo_write({path}) failed rc={rc}")


def image_read(path: str) -> np.ndarray:
    """Native PGM/PPM decode -> float32 RGB HWC in [0, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libpivio unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pivio_image_read(path.encode(), None, 0, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"image_read({path}) failed rc={rc}")
    out = np.empty((h.value, w.value, 3), np.float32)
    rc = lib.pivio_image_read(path.encode(), _fptr(out), out.size,
                              ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"image_read({path}) failed rc={rc}")
    return out


class NativeTrainLoader:
    """Threaded native triplet loader: (img1, img2, .flo target) batches.

    Feeds the trainer's BatchLoader position over file-triplet datasets
    (PIVData-style ``.samples``): images decoded by the C++ PNG/TIFF/PNM
    decoders, flows by the native .flo codec, batches assembled by the
    pthread pool. Yields ``((im1 [B,H,W,3], im2 [B,H,W,3]), flow [B,H,W,2])``
    like the Python ``BatchLoader`` over a training dataset.

    Shuffle order is drawn per-epoch from ``seed + epoch`` (the
    ``set_epoch`` resume contract); the underlying C loader is recreated
    per epoch with the permuted path lists — creation is microseconds next
    to an epoch of decoding.
    """

    def __init__(self, triplets: Sequence[Tuple[str, str, str]], batch_size: int,
                 height: int, width: int, fh: int, fw: int, threads: int = 4,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False):
        if get_lib() is None:
            raise RuntimeError("libpivio unavailable")
        self.triplets = list(triplets)
        self.batch = batch_size
        self.h, self.w, self.fh, self.fw = height, width, fh, fw
        self.threads = threads
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self):
        n = len(self.triplets)
        return n // self.batch if self.drop_last else -(-n // self.batch)

    def __iter__(self):
        lib = get_lib()
        order = np.arange(len(self.triplets))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        if self.drop_last:
            order = order[: len(order) // self.batch * self.batch]
        trips = [self.triplets[i] for i in order]
        n = len(trips)
        p1 = (ctypes.c_char_p * n)(*[t[0].encode() for t in trips])
        p2 = (ctypes.c_char_p * n)(*[t[1].encode() for t in trips])
        pf = (ctypes.c_char_p * n)(*[t[2].encode() for t in trips])
        handle = lib.pivio_loader_create_flow(
            p1, p2, pf, n, self.batch, self.h, self.w, self.fh, self.fw,
            self.threads)
        try:
            imgs = np.empty((2, self.batch, self.h, self.w, 3), np.float32)
            flow = np.empty((self.batch, self.fh, self.fw, 2), np.float32)
            for _ in range(lib.pivio_loader_batches(handle)):
                valid = lib.pivio_loader_next_flow(handle, _fptr(imgs), _fptr(flow))
                if valid < 0:
                    break
                yield (imgs[0, :valid].copy(), imgs[1, :valid].copy()), flow[:valid].copy()
        finally:
            lib.pivio_loader_destroy(handle)


def seq_read_frame(path: str, i: int, h: int, w: int) -> np.ndarray:
    """Native one-shot .pivseq frame decode -> float32 RGB HWC [0,1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libpivio unavailable")
    out = np.empty((h, w, 3), np.float32)
    rc = lib.pivio_seq_read_frame(path.encode(), i, _fptr(out), out.size)
    if rc != 0:
        raise IOError(f"seq_read_frame({path}, {i}) failed rc={rc}")
    return out


class NativeSeqLoader:
    """Threaded batch loader over a packed ``.pivseq`` container: mmap'd raw
    frames dequantized straight into the batch ring — the decode-free ingest
    that feeds multi-chip serving (PNG inflate caps at ~8 pairs/s/core at
    1024^2, BASELINE.md). Yields ``((im1 [B,H,W,3], im2 [B,H,W,3]), names)``
    like ``NativeBatchLoader``."""

    def __init__(self, dataset, batch_size: int, threads: int = 4):
        """``dataset`` is a ``data.pivseq.PivseqRun`` (path + index_pairs +
        original-name pairs)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libpivio unavailable")
        self._lib = lib
        self.pairs = list(dataset.pairs)
        self.batch = batch_size
        self.h, self.w = dataset.reader.h, dataset.reader.w
        n = len(dataset.index_pairs)
        i1 = (ctypes.c_long * n)(*[p[0] for p in dataset.index_pairs])
        i2 = (ctypes.c_long * n)(*[p[1] for p in dataset.index_pairs])
        self._handle = lib.pivio_seqloader_create(
            dataset.path.encode(), i1, i2, n, batch_size, threads)
        if not self._handle:
            raise IOError(f"pivio_seqloader_create({dataset.path}) failed")
        self.n_batches = lib.pivio_loader_batches(self._handle)

    def __len__(self):
        return int(self.n_batches)

    def __iter__(self):
        buf = np.empty((2, self.batch, self.h, self.w, 3), np.float32)
        for bi in range(self.n_batches):
            valid = self._lib.pivio_loader_next(self._handle, _fptr(buf))
            if valid < 0:
                break
            names = [p[0] for p in
                     self.pairs[bi * self.batch : bi * self.batch + valid]]
            yield (buf[0, :valid].copy(), buf[1, :valid].copy()), names

    def close(self):
        if self._handle:
            self._lib.pivio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Threaded native pair loader over PGM/PPM/PNG/TIFF files.

    Yields ``((im1 [B,H,W,3], im2 [B,H,W,3]), names)`` like the Python
    ``BatchLoader`` (short final batches are trimmed).
    """

    def __init__(self, pairs: Sequence[Tuple[str, str]], batch_size: int,
                 height: int, width: int, threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libpivio unavailable")
        self._lib = lib
        self.pairs = list(pairs)
        self.batch = batch_size
        self.h, self.w = height, width
        n = len(self.pairs)
        self._p1 = (ctypes.c_char_p * n)(*[p[0].encode() for p in self.pairs])
        self._p2 = (ctypes.c_char_p * n)(*[p[1].encode() for p in self.pairs])
        self._handle = lib.pivio_loader_create(
            self._p1, self._p2, n, batch_size, height, width, threads)
        self.n_batches = lib.pivio_loader_batches(self._handle)

    def __len__(self):
        return int(self.n_batches)

    def __iter__(self):
        buf = np.empty((2, self.batch, self.h, self.w, 3), np.float32)
        for bi in range(self.n_batches):
            valid = self._lib.pivio_loader_next(self._handle, _fptr(buf))
            if valid < 0:
                break
            names = [p[0] for p in self.pairs[bi * self.batch : bi * self.batch + valid]]
            yield (buf[0, :valid].copy(), buf[1, :valid].copy()), names

    def close(self):
        if self._handle:
            self._lib.pivio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
