"""ctypes binding for the native C++ packed-dataset reader (`native/packed_reader.cpp`).

A background C++ thread mmaps LITPKDS chunk files, walks a shuffled block order, and
assembles int32 batches into a prefetch ring; Python only copies ready buffers out.
This is the native-runtime replacement for the reference's torch DataLoader worker
pool. Falls back transparently to the pure-NumPy `PackedDataset` if the shared
library is absent (`build_native()` compiles it with g++).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "packed_reader.cpp"
_LIB = _REPO / "native" / "libpackedreader.so"

_lib = None


def build_native(force: bool = False) -> Path:
    """Compile the shared library (g++ -O2 -fPIC -shared)."""
    if _LIB.exists() and not force:
        return _LIB
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
            str(_SRC), "-o", str(_LIB),
        ],
        check=True,
    )
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists():
        build_native()
    lib = ctypes.CDLL(str(_LIB))
    lib.pr_create.restype = ctypes.c_void_p
    lib.pr_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
        ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_ulonglong,
    ]
    lib.pr_next.restype = ctypes.c_int
    lib.pr_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.pr_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativePackedBatches:
    """Iterator of ``(batch, block_size)`` int32 batches, produced by the C++
    prefetching reader. Same file-sharding math as `PackedDataset`."""

    def __init__(
        self,
        filenames: Sequence[str],
        batch_size: int,
        block_size: int,
        n_chunks: Optional[int] = None,
        seed: int = 12345,
        shuffle: bool = True,
        wrap: bool = False,
        num_processes: int = 1,
        process_rank: int = 0,
        prefetch_depth: int = 4,
        skip_batches: int = 0,
    ):
        lib = _load()
        # shard files across processes (reference packed_dataset.py:48-56 math)
        num_shards = num_processes
        shard_id = process_rank
        max_num_files = len(filenames) // num_shards * num_shards
        shard = list(filenames)[shard_id:max_num_files:num_shards]
        if not shard:
            raise ValueError("no files assigned to this shard")
        self._files = [str(f).encode() for f in shard]
        arr = (ctypes.c_char_p * len(self._files))(*self._files)
        self._batch = batch_size
        self._block = block_size
        # skip_batches: data-loader resume — the producer replays the seeded
        # shuffle and skips that many batches without reading payload bytes
        self._handle = lib.pr_create(
            arr, len(self._files), block_size,
            n_chunks if n_chunks is not None else len(self._files),
            seed, int(shuffle), int(wrap), batch_size, prefetch_depth,
            skip_batches * batch_size,
        )
        self._lib = lib
        self._buf = np.empty((batch_size, block_size), np.int32)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        ok = self._lib.pr_next(
            self._handle, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        if not ok:
            raise StopIteration
        return self._buf.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.pr_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
