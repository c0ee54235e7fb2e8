"""Aux subsystem tests: env settings, logging, TraX protocol, analysis."""

import io
import os

import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.eval.analysis import (
    analyze_attributes,
    analyze_fscore,
    analyze_longterm,
    analyze_ope,
    analyze_speed,
    print_results,
)
from mmtrack_tpu.eval.datasets import EvalSequence
from mmtrack_tpu.eval.ope import result_path, save_result
from mmtrack_tpu.eval.vot import VOT, Rectangle, TraxServer, run_vot_exp
from mmtrack_tpu.utils.env import EnvironmentSettings, create_default_local_file, load_env_settings
from mmtrack_tpu.utils.logging import MetricLogger


def test_env_settings_roundtrip(tmp_path):
    path = str(tmp_path / "local.yaml")
    create_default_local_file(path)
    env = load_env_settings(path)
    assert isinstance(env, EnvironmentSettings)
    with pytest.raises(FileNotFoundError):
        env.dataset_root("LasHeR")
    env.datasets["lasher_dir"] = "/data/lasher"
    assert env.dataset_root("LasHeR_all") == "/data/lasher"


def test_metric_logger(tmp_path):
    log = MetricLogger(str(tmp_path), "t")
    log.write(10, {"loss": 1.5}, epoch=1)
    log.write(20, {"loss": 1.2}, epoch=1)
    recs = log.read_all()
    assert len(recs) == 2 and recs[1]["loss"] == 1.2
    assert os.path.exists(log.text_path)


# ---------------------------------------------------------------- TraX

def _trax_dialog(client_lines):
    fin = io.StringIO("".join(l + "\n" for l in client_lines))
    fout = io.StringIO()
    return fin, fout


def test_trax_handshake_and_loop():
    fin, fout = _trax_dialog([
        '@@TRAX:initialize "file:///a/c1.jpg" "file:///a/d1.png" "10.0,20.0,30.0,40.0"',
        '@@TRAX:frame "file:///a/c2.jpg" "file:///a/d2.png"',
        '@@TRAX:quit',
    ])
    handle = VOT("rectangle", channels="rgbd", fin=fin, fout=fout)
    r = handle.region()
    assert (r.x, r.y, r.width, r.height) == (10.0, 20.0, 30.0, 40.0)
    first = handle.frame()
    assert first == ["/a/c1.jpg", "/a/d1.png"]
    handle.report(Rectangle(11, 21, 29, 39), confidence=0.9)
    second = handle.frame()
    assert second == ["/a/c2.jpg", "/a/d2.png"]
    handle.report(Rectangle(12, 22, 28, 38))
    assert handle.frame() is None

    out = fout.getvalue()
    assert "@@TRAX:hello" in out and "trax.channels=color;depth" in out
    assert '@@TRAX:state "11.0000,21.0000,29.0000,39.0000" confidence=0.900000' in out


class _EchoTracker:
    def initialize(self, image, info):
        self.box = info["init_bbox"]

    def track(self, image):
        return {"target_bbox": self.box, "best_score": 0.7}


def test_run_vot_exp_with_stub_tracker(tmp_path, monkeypatch):
    # write real tiny images so composition reads succeed
    import cv2
    rgbp = str(tmp_path / "c.jpg")
    xp = str(tmp_path / "x.jpg")
    cv2.imwrite(rgbp, np.zeros((40, 50, 3), np.uint8))
    cv2.imwrite(xp, np.zeros((40, 50, 3), np.uint8))
    fin, fout = _trax_dialog([
        f'@@TRAX:initialize "file://{rgbp}" "file://{xp}" "5.0,6.0,10.0,12.0"',
        f'@@TRAX:frame "file://{rgbp}" "file://{xp}"',
        '@@TRAX:quit',
    ])
    run_vot_exp(_EchoTracker, channels="rgbt", dtype="rgbrgb", fin=fin, fout=fout)
    out = fout.getvalue()
    # init echo (the toolkit blocks on it, reference vot.py:55) + 1 frame
    assert out.count("@@TRAX:state") == 2
    assert "5.0000,6.0000,10.0000,12.0000" in out


def test_mask_region_roundtrip():
    from mmtrack_tpu.eval.vot import (Mask, _decode_region, _encode_region,
                                      rect_from_mask)
    m = np.zeros((5, 7), np.uint8)
    m[1:4, 2:5] = 1
    s = _encode_region(Mask(3, 4, m))
    assert s.startswith("m3,4,7,5,")
    r = _decode_region(s)
    assert (r.x, r.y) == (3, 4)
    np.testing.assert_array_equal(r.mask, m)
    rect = rect_from_mask(r)
    assert (rect.x, rect.y, rect.width, rect.height) == (5.0, 5.0, 3.0, 3.0)


class _StubRefiner:
    """Stands in for ARcmSeg: paints the reported box as the mask."""

    class rt:
        mask_threshold = 0.5

    def initialize(self, image, box):
        self.shape = image.shape[:2]

    def refine(self, image, box):
        m = np.zeros(image.shape[:2], np.float32)
        x, y, w, h = [int(v) for v in box]
        m[max(y, 0):y + h, max(x, 0):x + w] = 1.0
        return box, m


def test_run_vot_exp_mask_protocol(tmp_path):
    """Mask init -> rect seed; states reported as RLE masks via the
    Alpha-Refine plug-in interface (VERDICT round-trip requirement)."""
    import cv2
    from mmtrack_tpu.eval.vot import Mask, _encode_region

    rgbp = str(tmp_path / "c.jpg")
    xp = str(tmp_path / "x.png")
    cv2.imwrite(rgbp, np.zeros((40, 50, 3), np.uint8))
    cv2.imwrite(xp, np.full((40, 50), 900, np.uint16))

    init_mask = np.zeros((12, 10), np.uint8)
    init_mask[2:10, 1:9] = 1
    region = _encode_region(Mask(5, 6, init_mask))
    fin, fout = _trax_dialog([
        f'@@TRAX:initialize "file://{rgbp}" "file://{xp}" "{region}"',
        f'@@TRAX:frame "file://{rgbp}" "file://{xp}"',
        '@@TRAX:quit',
    ])
    run_vot_exp(_EchoTracker, channels="rgbd", dtype="rgbcolormap",
                fin=fin, fout=fout, mask=True, refine_factory=_StubRefiner)
    out = fout.getvalue()
    # init echo + 1 tracked frame
    assert out.count("@@TRAX:state") == 2
    state_line = [l for l in out.splitlines() if "@@TRAX:state" in l][-1]
    assert '"m' in state_line  # mask region reported
    # decode the reported mask: it must cover the init rect (6,8,8,8)
    from mmtrack_tpu.eval.vot import _decode_region
    enc = state_line.split('"')[1]
    rep = _decode_region(enc)
    assert rep.mask.shape == (40, 50)
    assert rep.mask[10, 8] == 1 and rep.mask[0, 0] == 0


class _MaskTracker:
    """Natively mask-predicting tracker (the LWL interface)."""

    predicts_segmentation_mask = True

    def initialize(self, image, info):
        self.box = info["init_bbox"]
        # the native path must receive the full-image init mask
        assert "init_mask" in info
        assert info["init_mask"].shape == image.shape[:2]
        self.init_mask_sum = float(info["init_mask"].sum())

    def track(self, image):
        m = np.zeros(image.shape[:2], bool)
        x, y, w, h = [int(v) for v in self.box]
        m[y:y + h, x:x + w] = True
        return {"target_bbox": self.box, "segmentation": m,
                "best_score": 0.8}


def test_run_vot_exp_native_mask_tracker(tmp_path):
    """A predicts_segmentation_mask tracker (LWL) reports its OWN mask and
    consumes the init mask verbatim — no Alpha-Refine involved."""
    import cv2
    from mmtrack_tpu.eval.vot import Mask, _decode_region, _encode_region

    rgbp = str(tmp_path / "c.jpg")
    xp = str(tmp_path / "x.png")
    cv2.imwrite(rgbp, np.zeros((40, 50, 3), np.uint8))
    cv2.imwrite(xp, np.full((40, 50), 900, np.uint16))

    init_mask = np.zeros((12, 10), np.uint8)
    init_mask[2:10, 1:9] = 1
    region = _encode_region(Mask(5, 6, init_mask))
    fin, fout = _trax_dialog([
        f'@@TRAX:initialize "file://{rgbp}" "file://{xp}" "{region}"',
        f'@@TRAX:frame "file://{rgbp}" "file://{xp}"',
        '@@TRAX:quit',
    ])
    run_vot_exp(_MaskTracker, channels="rgbd", dtype="rgbcolormap",
                fin=fin, fout=fout, mask=True,
                refine_factory=lambda: (_ for _ in ()).throw(
                    AssertionError("refiner must not be built")))
    out = fout.getvalue()
    assert out.count("@@TRAX:state") == 2
    state_line = [l for l in out.splitlines() if "@@TRAX:state" in l][-1]
    enc = state_line.split('"')[1]
    rep = _decode_region(enc)
    assert rep.mask.shape == (40, 50)
    # the tracker painted its init rect (6, 8, 8, 8)
    assert rep.mask[10, 8] == 1 and rep.mask[0, 0] == 0


# ---------------------------------------------------------------- analysis

def _fake_results(tmp_path, n_seqs=2, n=10):
    seqs = []
    for i in range(n_seqs):
        _, gt = make_synthetic_sequence(n_frames=n, height=100, width=140, seed=i)
        seq = EvalSequence(f"s{i}", [None] * n, [None] * n, gt,
                           visible=np.ones(n, bool))
        boxes = gt.copy()
        boxes[n // 2:] += 5.0  # degrade second half
        res = {"boxes": boxes, "confidences": np.full(n - 1, 0.8),
               "elapsed": 0.5}
        save_result(result_path(str(tmp_path), "DS", "cfg", seq.name), res)
        seqs.append(seq)
    return seqs


def test_analyze_ope_and_fscore(tmp_path):
    seqs = _fake_results(tmp_path)
    rep = analyze_ope(seqs, str(tmp_path), "DS", "cfg")
    assert 0.0 < rep["overall"]["success_auc"] <= 1.0
    assert set(rep["per_sequence"]) == {"s0", "s1"}
    txt = print_results(rep, "cfg")
    assert "SR" in txt and "PR" in txt

    fs = analyze_fscore(seqs, str(tmp_path), "DS", "cfg")
    assert 0.0 < fs["fscore"] <= 1.0


def test_analyze_attributes_and_longterm_and_speed(tmp_path):
    seqs = _fake_results(tmp_path)
    n = len(seqs[0].gt)
    attrs = {s.name: {"dark": np.ones(n), "occ": np.zeros(n)} for s in seqs}
    rep = analyze_attributes(seqs, str(tmp_path), "DS", "cfg", attrs)
    assert "dark" in rep and "occ" not in rep

    # mark the tail occluded for the long-term split
    for s in seqs:
        s.visible[n // 2:] = False
    lt = analyze_longterm(seqs, str(tmp_path), "DS", "cfg")
    assert "pre_occlusion" in lt and "post_occlusion" in lt
    assert lt["pre_occlusion"]["fscore"] >= lt["post_occlusion"]["fscore"]

    sp = analyze_speed(seqs, str(tmp_path), "DS", "cfg")
    assert sp["mean_fps"] > 0
