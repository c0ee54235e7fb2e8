"""LMDB-backed dataset storage (optional).

Rebuild of the reference's *_lmdb dataset twins + lib/utils/lmdb_utils.py:
image bytes and annotation text stored under relative-path keys in one LMDB
environment per corpus. The `lmdb` package is not in this image, so the
backend is import-gated; the file-system datasets are the default path.
"""

from __future__ import annotations

import io

import numpy as np


class LmdbBackend:
    """Key-value reader: decode_image(key) and decode_text(key)."""

    def __init__(self, lmdb_path: str):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "LMDB-backed datasets need the 'lmdb' package; use the "
                "file-system dataset classes instead") from e
        self._env = lmdb.open(lmdb_path, readonly=True, lock=False,
                              readahead=False, meminit=False)

    def read_bytes(self, key: str) -> bytes:
        with self._env.begin(write=False) as txn:
            val = txn.get(key.encode())
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
