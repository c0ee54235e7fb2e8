"""Multi-object evaluation wrapper (eval/multi_object.py) vs the
reference's semantics (RGBD/models/DeT/pytracking/evaluation/
multi_object_wrapper.py): per-object info splitting, labeled-mask merge
(argmax of soft masks over threshold, background 0), mid-sequence object
entry, and the merge_results override hook."""

from __future__ import annotations

import numpy as np

from mmtrack_tpu.eval.multi_object import (
    MultiObjectWrapper,
    run_multi_object_sequence,
)


class ScriptedTracker:
    """Returns a fixed box offset per instance and a soft disk mask."""

    created = 0

    def __init__(self):
        ScriptedTracker.created += 1
        self.idx = ScriptedTracker.created
        self.inits = []
        self.box = None

    def initialize(self, image, info):
        self.inits.append(info)
        self.box = list(map(float, info["init_bbox"]))
        return None

    def track(self, image):
        self.box = [self.box[0] + 1.0, self.box[1], self.box[2], self.box[3]]
        H, W = image.shape[:2]
        soft = np.zeros((H, W), np.float32)
        x, y, w, h = map(int, self.box)
        soft[y:y + h, x:x + w] = 0.4 + 0.1 * self.idx  # 0.5/0.6/0.7...
        return {"target_bbox": list(self.box),
                "segmentation": (soft > 0.5).astype(np.uint8),
                "segmentation_soft": soft,
                "best_score": 0.9}


def _frames(n=4, H=32, W=48):
    return [np.zeros((H, W, 3), np.uint8) for _ in range(n)]


def test_split_info_and_init_other():
    ScriptedTracker.created = 0
    w = MultiObjectWrapper(ScriptedTracker)
    labels = np.zeros((32, 48), np.uint8)
    labels[2:6, 2:6] = 1
    labels[10:14, 10:14] = 2
    info = {"object_ids": ["1", "2"], "init_object_ids": ["1", "2"],
            "sequence_object_ids": ["1", "2"],
            "init_bbox": {"1": [2, 2, 4, 4], "2": [10, 10, 4, 4]},
            "init_mask": labels}
    out = w.initialize(_frames()[0], info)

    # one tracker per object, each saw only its own binary mask + others'
    assert len(w.trackers) == 2
    t1 = w.trackers["1"]
    assert t1.inits[0]["object_ids"] == ["1"]
    assert t1.inits[0]["init_mask"].sum() == 16
    assert (t1.inits[0]["init_mask"][2:6, 2:6] == 1).all()
    assert set(t1.inits[0]["init_other"].keys()) == {"1", "2"}
    assert t1.inits[0]["init_other"]["2"]["init_bbox"] == [10, 10, 4, 4]

    # merged init output: per-object dicts, defaults filled from init info
    assert out["target_bbox"]["2"] == [10, 10, 4, 4]
    # labeled merged segmentation from the per-object init masks
    assert out["segmentation"][3, 3] == 1 and out["segmentation"][11, 11] == 2
    assert out["segmentation"][0, 0] == 0


def test_labeled_mask_merge_argmax_and_threshold():
    ScriptedTracker.created = 0
    w = MultiObjectWrapper(ScriptedTracker)
    frames = _frames()
    # overlapping boxes: object 2's soft mask (0.6) beats object 1's (0.5)
    info = {"object_ids": ["1", "2"], "init_object_ids": ["1", "2"],
            "init_bbox": {"1": [4, 4, 8, 8], "2": [5, 4, 8, 8]}}
    w.initialize(frames[0], info)
    out = w.track(frames[1])
    seg = out["segmentation"]
    # overlap region -> argmax picks object 2; soft=0.5 is NOT > 0.5 so
    # object-1-only pixels stay background (threshold is strict, ref :83)
    assert seg[6, 10] == 2
    assert (seg != 1).all()
    assert out["target_bbox"]["1"][0] == 5.0  # box advanced by the step


def test_mid_sequence_object_entry():
    ScriptedTracker.created = 0
    frames = _frames(5)
    init_info = {"object_ids": ["1", "3"], "init_object_ids": ["1"],
                 "init_bbox": {"1": [2, 2, 4, 4]}}
    frame_infos = [None,
                   {"object_ids": ["1", "3"], "init_object_ids": ["3"],
                    "init_bbox": {"3": [20, 10, 6, 6]}},
                   None, None]
    res = run_multi_object_sequence(ScriptedTracker, frames, init_info,
                                    frame_infos)
    assert res["boxes"]["1"].shape == (5, 4)
    assert res["boxes"]["3"].shape == (5, 4)
    # object 3 has NaN rows before its entry at frame index 2
    assert np.isnan(res["boxes"]["3"][:2]).all()
    assert res["boxes"]["3"][2][0] == 20.0  # init frame reports init box
    assert res["boxes"]["3"][3][0] == 21.0  # then tracks
    # object 1 tracked through every frame
    assert res["boxes"]["1"][4][0] == 2.0 + 4


def test_merge_results_override():
    class Custom(ScriptedTracker):
        def merge_results(self, out_all):
            return {"n_objects": len(out_all)}

    ScriptedTracker.created = 0
    w = MultiObjectWrapper(Custom)
    info = {"object_ids": ["1", "2"], "init_object_ids": ["1", "2"],
            "init_bbox": {"1": [2, 2, 4, 4], "2": [8, 8, 4, 4]}}
    out = w.initialize(_frames()[0], info)
    assert out == {"n_objects": 2}
