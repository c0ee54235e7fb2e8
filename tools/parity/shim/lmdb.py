"""Minimal lmdb stub for the parity harness (SPT's lib/utils/lmdb_utils
imports it at module load; the parity paths never open an environment).
The real LMDB-backed data path lives in mmtrack_tpu/data/lmdb_backend.py."""


def open(*args, **kwargs):  # noqa: A001 - mirrors the lmdb API name
    raise RuntimeError("lmdb stub: no LMDB environments in the parity harness")
