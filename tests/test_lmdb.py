"""Pure-python LMDB backend: fixture round-trip through the dataset path.

Writes a real LMDB data file with data/minilmdb.py's writer (meta pages,
leaf/branch pages, overflow chains for image-sized blobs) and reads it
back through the reader and the LmdbBackend dataset plumbing — the
exercisable equivalent of the reference's *_lmdb dataset twins
(ViPT/lib/train/dataset/lasot_lmdb.py + lib/utils/lmdb_utils.py)."""

import os

import cv2
import numpy as np
import pytest

from mmtrack_tpu.data.lmdb_backend import LmdbBackend, wrap_dataset_with_lmdb
from mmtrack_tpu.data.minilmdb import Env, write_fixture


def test_minilmdb_roundtrip_small_and_overflow(tmp_path):
    rng = np.random.RandomState(0)
    items = {
        "small": b"hello",
        "empty": b"",
        "anno/groundtruth.txt": "10,20,30,40\n11,21,31,41\n",
        # > 1 page: exercises F_BIGDATA + overflow chains
        "big": rng.bytes(3 * 4096 + 123),
        "big2": rng.bytes(10000),
    }
    # enough small keys to force multiple leaves + a branch root
    for i in range(300):
        items[f"k{i:04d}"] = (f"value-{i}" * 3).encode()

    path = write_fixture(str(tmp_path / "corpus"), items)
    env = Env(path)
    assert env.entries == len(items)
    assert env.depth == 2  # branch root over several leaves
    for k, v in items.items():
        want = v.encode() if isinstance(v, str) else v
        assert env.get(k) == want, k
    assert env.get("missing") is None
    assert env.keys() == sorted(kk.encode() if isinstance(kk, str) else kk
                                for kk in items)
    env.close()


def test_minilmdb_single_leaf(tmp_path):
    path = write_fixture(str(tmp_path / "one"), {"a": b"1", "b": b"2"})
    env = Env(path)
    assert env.depth == 1 and env.entries == 2
    assert env.get(b"a") == b"1" and env.get(b"b") == b"2"
    env.close()


def test_lmdb_backend_decodes_images_and_text(tmp_path):
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([yy * 5, xx * 3, (yy + xx) * 2], axis=-1).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    write_fixture(str(tmp_path / "corpus"), {
        "seq/img/0001.jpg": buf.tobytes(),
        "seq/groundtruth.txt": "1,2,3,4\n5,6,7,8\n",
    })
    be = LmdbBackend(str(tmp_path / "corpus"))
    out = be.decode_image("seq/img/0001.jpg")
    assert out.shape == (48, 64, 3)
    # jpeg is lossy; content must match to compression noise
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 12
    gt = be.loadtxt("seq/groundtruth.txt")
    np.testing.assert_array_equal(gt, [[1, 2, 3, 4], [5, 6, 7, 8]])
    with pytest.raises(KeyError):
        be.read_bytes("nope")


def test_wrap_dataset_with_lmdb(tmp_path):
    """The *_lmdb twin pattern: a dataset whose image loader resolves
    file paths as corpus-relative LMDB keys."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    root = str(tmp_path / "root")
    write_fixture(str(tmp_path / "corpus"), {"seq0/0001.png": buf.tobytes()})

    captured = {}

    class FakeDataset:
        def __init__(self, root, image_loader=None):
            captured["loader"] = image_loader

    wrap_dataset_with_lmdb(FakeDataset, str(tmp_path / "corpus"), root)
    out = captured["loader"](os.path.join(root, "seq0/0001.png"))
    np.testing.assert_array_equal(out, img)  # png is lossless
