"""Submission packagers + RGB eval-dataset layouts.

Round-trips the GOT-10k / TrackingNet packagers (eval/submission.py)
against the reference transform scripts' exact output bytes
(RGBD/models/OSTrack/lib/test/utils/transform_{got10k,trackingnet}.py),
and exercises the lasot/got10k/otb/trackingnet layouts of
eval/datasets.py::load_sequence on synthetic fixtures.
"""

import io
import os
import zipfile

import numpy as np
import pytest

from mmtrack_tpu.eval.datasets import load_sequence
from mmtrack_tpu.eval.ope import save_result
from mmtrack_tpu.eval.submission import transform_got10k, transform_trackingnet

BOXES = np.array([[10, 20, 30, 40], [11, 21, 31, 41], [12, 22, 32, 42]], float)
TIMES = np.array([0.031, 0.012, 0.013])


def _ref_bytes_boxes() -> bytes:
    """What the reference writes: loadtxt(int) -> savetxt('%d', ',')."""
    buf = io.BytesIO()
    np.savetxt(buf, BOXES.astype(int), fmt="%d", delimiter=",")
    return buf.getvalue()


def _ref_bytes_times() -> bytes:
    """pytracking save_time bytes (running.py:30-32)."""
    buf = io.BytesIO()
    np.savetxt(buf, TIMES, delimiter="\t", fmt="%f")
    return buf.getvalue()


def _write_src(results_root, dataset, config, seqs):
    d = os.path.join(results_root, dataset, config)
    os.makedirs(d)
    for s in seqs:
        # pytracking source format: tab ints + _time.txt (running.py:26-32)
        np.savetxt(os.path.join(d, f"{s}.txt"), BOXES.astype(int),
                   delimiter="\t", fmt="%d")
        np.savetxt(os.path.join(d, f"{s}_time.txt"), TIMES,
                   delimiter="\t", fmt="%f")
    # an "all"-named summary file the packager must skip
    with open(os.path.join(d, "all_results.txt"), "w") as f:
        f.write("ignored\n")
    return d


def test_transform_got10k_roundtrip(tmp_path):
    root = str(tmp_path)
    src = _write_src(root, "got10k", "cfg", ["seq_a", "seq_b"])
    raw_zip, submit_zip = transform_got10k(root, "cfg")
    # reference removes the unzipped trees (transform_got10k.py:41-42)
    assert not os.path.exists(src)
    assert os.path.exists(raw_zip) and os.path.exists(submit_zip)
    zf = zipfile.ZipFile(submit_zip)
    names = sorted(n for n in zf.namelist() if not n.endswith("/"))
    assert names == [
        "seq_a/seq_a_001.txt", "seq_a/seq_a_time.txt",
        "seq_b/seq_b_001.txt", "seq_b/seq_b_time.txt",
    ]
    assert zf.read("seq_a/seq_a_001.txt") == _ref_bytes_boxes()
    assert zf.read("seq_a/seq_a_time.txt") == _ref_bytes_times()
    # raw zip keeps the sources verbatim, minus nothing (reference zips all)
    raw = zipfile.ZipFile(raw_zip)
    assert "seq_a.txt" in raw.namelist() and "all_results.txt" in raw.namelist()


def test_transform_got10k_converts_time_value(tmp_path):
    """Results written by this repo's default driver (float CSV boxes +
    _time.value) package to identical submission bytes."""
    root = str(tmp_path)
    d = os.path.join(root, "got10k", "cfg")
    os.makedirs(d)
    res = {"boxes": BOXES + 0.7, "confidences": np.ones(2), "elapsed": 1.0,
           "times": TIMES}
    save_result(os.path.join(d, "seq_a.txt"), res)  # %.14f + _time.value
    _, submit_zip = transform_got10k(root, "cfg")
    zf = zipfile.ZipFile(submit_zip)
    # astype(int) truncation of 10.7 -> 10 matches reference save_bb
    assert zf.read("seq_a/seq_a_001.txt") == _ref_bytes_boxes()
    assert zf.read("seq_a/seq_a_time.txt") == _ref_bytes_times()
    assert not any("confidence" in n for n in zf.namelist())


def test_transform_trackingnet_roundtrip(tmp_path):
    root = str(tmp_path)
    _write_src(root, "trackingnet", "cfg", ["tn1", "tn2"])
    raw_zip, submit_zip = transform_trackingnet(root, "cfg")
    zf = zipfile.ZipFile(submit_zip)
    names = sorted(n for n in zf.namelist() if not n.endswith("/"))
    # flat layout, timing files skipped (transform_trackingnet.py:17-25)
    assert names == ["tn1.txt", "tn2.txt"]
    assert zf.read("tn1.txt") == _ref_bytes_boxes()
    assert os.path.exists(raw_zip)


# --- RGB eval layouts ---

def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb"):
        pass


def test_lasot_layout(tmp_path):
    seq = tmp_path / "airplane" / "airplane-1"
    gt = np.array([[1, 2, 3, 4], [2, 3, 4, 5], [3, 4, 5, 6]], float)
    os.makedirs(seq)
    np.savetxt(seq / "groundtruth.txt", gt, delimiter=",", fmt="%d")
    np.savetxt(seq / "full_occlusion.txt", np.array([[0, 1, 0]]),
               delimiter=",", fmt="%d")
    np.savetxt(seq / "out_of_view.txt", np.array([[0, 0, 0]]),
               delimiter=",", fmt="%d")
    s = load_sequence(str(seq), "lasot")
    assert len(s) == 3 and s.dtype == "color"
    assert s.rgb_frames[0].endswith("img/00000001.jpg")
    assert s.x_frames == [None] * 3
    assert list(s.visible) == [True, False, True]
    assert s.save_fmt == "%d" and s.time_style == "txt"
    np.testing.assert_array_equal(s.gt, gt)


def test_got10k_layout_test_split(tmp_path):
    seq = tmp_path / "GOT-10k_Test_000001"
    os.makedirs(seq)
    # single init row (test split) + frames sorted by integer stem
    np.savetxt(seq / "groundtruth.txt", np.array([[5, 6, 7, 8.0]]),
               delimiter=",", fmt="%.4f")
    for i in (10, 2, 1):
        _touch(str(seq / f"{i:08d}.jpg"))
    s = load_sequence(str(seq), "got10k")
    assert [os.path.basename(f) for f in s.rgb_frames] == [
        "00000001.jpg", "00000002.jpg", "00000010.jpg"]
    assert s.gt.shape == (1, 4) and s.dtype == "color"


def test_trackingnet_layout(tmp_path):
    frames = tmp_path / "TEST" / "frames" / "seqX"
    anno = tmp_path / "TEST" / "anno"
    os.makedirs(frames); os.makedirs(anno)
    np.savetxt(anno / "seqX.txt", np.array([[1, 1, 2, 2.0]]),
               delimiter=",", fmt="%.2f")
    for i in (0, 1, 11, 2):
        _touch(str(frames / f"{i}.jpg"))
    s = load_sequence(str(frames), "trackingnet")
    assert [os.path.basename(f) for f in s.rgb_frames] == [
        "0.jpg", "1.jpg", "2.jpg", "11.jpg"]
    assert s.name == "seqX" and s.gt.shape == (1, 4)


def test_otb_layout_weird_delimiters(tmp_path):
    seq = tmp_path / "Basketball"
    os.makedirs(seq / "img")
    # OTB annos mix comma and whitespace rows; reference loads with
    # delimiter=(',', None) (otbdataset.py:42-43)
    with open(seq / "groundtruth_rect.txt", "w") as f:
        f.write("1\t2\t3\t4\n5\t6\t7\t8\n")
    for i in (1, 2):
        _touch(str(seq / "img" / f"{i:04d}.jpg"))
    s = load_sequence(str(seq), "otb")
    assert len(s) == 2 and s.dtype == "color"
    np.testing.assert_array_equal(s.gt, [[1, 2, 3, 4], [5, 6, 7, 8]])


def test_save_result_time_txt_style(tmp_path):
    res = {"boxes": BOXES + 0.9, "confidences": np.ones(2), "elapsed": 1.0,
           "times": TIMES}
    path = str(tmp_path / "r" / "seq.txt")
    save_result(path, res, fmt="%d", delimiter="\t", time_style="txt")
    with open(path, "rb") as f:
        buf = io.BytesIO()
        np.savetxt(buf, (BOXES + 0.9).astype(int), fmt="%d", delimiter="\t")
        assert f.read() == buf.getvalue()
    with open(str(tmp_path / "r" / "seq_time.txt"), "rb") as f:
        assert f.read() == _ref_bytes_times()
