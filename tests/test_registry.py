"""Registry smoke: every entry constructs; light ones track a frame."""

import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.registry import TRACKER_REGISTRY, build_tracker, list_trackers


def test_registry_surface():
    names = list_trackers()
    # the reference's tracker surface, by family
    for required in ("vipt_deep_rgbd", "vipt_deep_rgbt", "vipt_deep_rgbe",
                     "ostrack", "dimp50", "det_dimp50_max", "mfdimp",
                     "siamfc", "pymdnet", "manet", "stark_s", "stark_st",
                     "spt", "mixformer_rgbd", "kys", "lwl"):
        assert required in names
    assert "vipt_deep_rgbt" in list_trackers("rgbt")
    assert "vipt_deep_rgbt" not in list_trackers("rgbd")
    with pytest.raises(KeyError):
        build_tracker("nope")


@pytest.mark.slow
def test_registry_siamfc_tracks():
    tracker = build_tracker("siamfc")
    frames, gt = make_synthetic_sequence(n_frames=3, height=160, width=200)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    out = tracker.track(frames[1])
    assert np.isfinite(out["target_bbox"]).all()
