"""Noise database: LMDB-compatible reader + a native packed format.

The reference stores MUSAN noise wavs in LMDB with a pickled '__keys__'
list (/root/reference/wesep/dataset/lmdb_data.py:21-44, built by
tools/make_lmdb.py). lmdb is not available in this image, so the native
format is a single packed file: a json index {key: (offset, size)} followed
by concatenated wav bytes, mmap'd read-only. `NoiseStore` auto-detects
(LMDB dir vs .pack file) and exposes the same random_one() API.
"""

import json
import mmap
import os
import random
import struct
from typing import List, Tuple

__all__ = ["NoiseStore", "build_pack"]

_MAGIC = b"WESEPNZ1"


def build_pack(wav_files: List[str], out_path: str, keys: List[str] = None):
    """Pack wav files into a single store (tools/make_lmdb.py equivalent).

    Noise keys should start with 'noise_'/'speech_'/'music_' like the musan
    prep: keys beginning with 'speech' select the [10,30] dB SNR range in
    add_noise (/root/reference/wesep/dataset/processor.py:657-662).
    """
    if keys is None:
        keys = [os.path.splitext(os.path.basename(p))[0] for p in wav_files]
    index = {}
    offset = 0
    blobs = []
    for key, path in zip(keys, wav_files):
        with open(path, "rb") as f:
            data = f.read()
        index[key] = (offset, len(data))
        blobs.append(data)
        offset += len(data)
    index_bytes = json.dumps(index).encode("utf8")
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(index_bytes)))
        f.write(index_bytes)
        for b in blobs:
            f.write(b)
    return out_path


class _PackReader:
    def __init__(self, path: str):
        self._f = open(path, "rb")
        magic = self._f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a wesep noise pack")
        (index_len,) = struct.unpack("<Q", self._f.read(8))
        self.index = json.loads(self._f.read(index_len).decode("utf8"))
        self._data_start = 16 + index_len
        self._mm = mmap.mmap(
            self._f.fileno(), 0, access=mmap.ACCESS_READ
        )
        self.keys = list(self.index.keys())

    def get(self, key: str) -> bytes:
        offset, size = self.index[key]
        start = self._data_start + offset
        return self._mm[start : start + size]


class _LmdbReader:
    def __init__(self, path: str):
        import pickle

        import lmdb

        self.db = lmdb.open(
            path, readonly=True, lock=False, readahead=False, meminit=False
        )
        with self.db.begin(write=False) as txn:
            self.keys = pickle.loads(txn.get("__keys__".encode()))

    def get(self, key: str) -> bytes:
        with self.db.begin(write=False) as txn:
            return txn.get(key.encode())


class NoiseStore:
    """Uniform random access over a noise db
    (reference LmdbData, lmdb_data.py:21-44)."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            self._reader = _LmdbReader(path)
        else:
            self._reader = _PackReader(path)
        self.keys = self._reader.keys

    def random_one(self) -> Tuple[str, bytes]:
        key = self.keys[random.randint(0, len(self.keys) - 1)]
        return key, self._reader.get(key)

    def get(self, key: str) -> bytes:
        return self._reader.get(key)
