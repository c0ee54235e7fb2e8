"""LMDB-backed dataset storage.

Rebuild of the reference's *_lmdb dataset twins + lib/utils/lmdb_utils.py:
image bytes and annotation text stored under relative-path keys in one LMDB
environment per corpus. Reads go through the C `lmdb` package when
installed, else through the pure-python reader (data/minilmdb.py — the
on-disk format is stable and read-only access needs no locking), so the
backend works in this image without the package.
"""

from __future__ import annotations

import io

import numpy as np


class LmdbBackend:
    """Key-value reader: decode_image(key) and decode_text(key)."""

    def __init__(self, lmdb_path: str):
        try:
            import lmdb

            env = lmdb.open(lmdb_path, readonly=True, lock=False,
                            readahead=False, meminit=False)
            self._get = lambda k: env.begin(write=False).get(k)
        except ImportError:
            from mmtrack_tpu.data.minilmdb import Env

            env = Env(lmdb_path)
            self._get = env.get
        self._env = env

    def read_bytes(self, key: str) -> bytes:
        val = self._get(key.encode())
        if val is None:
            raise KeyError(f"lmdb key not found: {key}")
        return bytes(val)

    def decode_image(self, key: str) -> np.ndarray:
        import cv2
        buf = np.frombuffer(self.read_bytes(key), np.uint8)
        im = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)

    def decode_text(self, key: str) -> str:
        return self.read_bytes(key).decode()

    def loadtxt(self, key: str, delimiter: str = ",") -> np.ndarray:
        return np.loadtxt(io.StringIO(self.decode_text(key)), delimiter=delimiter)


def wrap_dataset_with_lmdb(dataset_cls, lmdb_path: str, *args, **kwargs):
    """Create a dataset whose image loader reads from LMDB (the *_lmdb twin
    pattern): file paths become keys relative to the corpus root."""
    backend = LmdbBackend(lmdb_path)
    root = args[0] if args else kwargs["root"]

    def lmdb_loader(path: str):
        key = path[len(root):].lstrip("/")
        return backend.decode_image(key)

    kwargs["image_loader"] = lmdb_loader
    return dataset_cls(*args, **kwargs)
