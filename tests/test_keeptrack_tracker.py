"""KeepTrack end-to-end tracker test (small DiMP runtime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.dimp import DiMPNet
from mmtrack_tpu.trackers.keep_track import PeakMatchConfig
from mmtrack_tpu.trackers.keeptrack_tracker import KeepTrackRuntime, KeepTrackTracker

RT = KeepTrackRuntime(image_sample_size=96, sample_memory_size=6,
                      train_skipping=3, scale_memory=4,
                      peaks=PeakMatchConfig(num_peaks=4),
                      use_augmentation=False)


def test_runtime_defaults_match_release_parameters():
    """Pin the runtime to keep_track/release.py:12-88 (super_dimp_hinge
    geometry + certainty-weighted memory)."""
    rt = KeepTrackRuntime()
    assert rt.image_sample_size == 30 * 16
    assert rt.search_area_scale == 8.0
    assert rt.border_mode == "inside_major"
    assert rt.patch_max_scale_change == 1.5
    assert rt.box_refinement_space == "relative"
    assert rt.box_refinement_iter == 10
    assert rt.box_refinement_step_length == 2.5e-3
    assert rt.output_sigma_factor == 0.25
    assert rt.use_certainty_for_weight_computation
    assert rt.certainty_ths == 0.5
    assert rt.id0_weight_increase
    # inherited DiMP constants release.py repeats (sample memory, lr,
    # train_skipping, thresholds)
    assert rt.sample_memory_size == 50 and rt.learning_rate == 0.01
    assert rt.train_skipping == 20 and rt.target_not_found_threshold == 0.25


@pytest.mark.slow
def test_keeptrack_tracker_end_to_end():
    net = DiMPNet(merge_type=None, optimizer_type="hinge")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=5, height=120, width=160)
    tracker = KeepTrackTracker(net, params, RT)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    st = tracker.state
    assert st["peaks"]["peak_scores"].shape == (4,)
    assert st["scale_ring"].shape == (4,)
    for t in range(1, 5):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
        assert np.isfinite(out["best_score"])
    assert int(tracker.state["frame_num"]) == 5
    # the collection was created on the first tracked frame (reference
    # semantics: the match memory is empty at init) and identities persist —
    # the counter equals the number of distinct tracks ever seen (>= 1)
    assert int(tracker.state["peaks"]["object_id_cntr"]) >= 1
    assert bool(tracker.state["mem_ok"])


def test_occlusion_rescale_matches_reference_semantics():
    """_occlusion_rescale == the fork's list arithmetic
    (keep_track.py:538-548): window to the last `scale_memory`, keep
    scales >= the most recent, average the newest max(2,min(30,counter))."""
    import numpy as np
    from mmtrack_tpu.trackers.keeptrack_tracker import _occlusion_rescale

    rt = KeepTrackRuntime(scale_memory=8)

    def torch_semantics(history, counter):
        num_scales = max(2, min(30, counter))
        ts = np.asarray(history[-8:], np.float64)
        ts = ts[ts >= ts[-1]]
        return float(ts[-num_scales:].mean())

    def ours(history, counter):
        ring = np.zeros(8, np.float32)
        for i, v in enumerate(history):
            ring[i % 8] = v
        return float(_occlusion_rescale(rt, jnp.asarray(ring),
                                        jnp.asarray(len(history)),
                                        jnp.asarray(counter)))

    hist = [1.0, 1.2, 0.9, 1.1, 1.05]
    for counter in (1, 2, 3, 5):
        np.testing.assert_allclose(ours(hist, counter),
                                   torch_semantics(hist, counter), rtol=1e-6)
    # ring wraparound (more history than slots)
    hist10 = [1.0, 1.3, 0.8, 1.1, 0.95, 1.25, 1.02, 0.99, 1.15, 1.04]
    for counter in (2, 4, 30):
        np.testing.assert_allclose(ours(hist10, counter),
                                   torch_semantics(hist10, counter),
                                   rtol=1e-6)
