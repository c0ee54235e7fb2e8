"""DiMP tracker runtime tests: flag lattice, memory, end-to-end steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.dimp import DiMPNet
from mmtrack_tpu.trackers.dimp_tracker import (
    FLAG_HARD_NEG,
    FLAG_NORMAL,
    FLAG_NOT_FOUND,
    DiMPRuntime,
    DiMPTracker,
    _get_iounet_box,
    _localize_advanced,
    _sample_geometry,
    _update_memory,
)

# use_augmentation=False: these unit tests exercise the single-init-sample
# memory/localization math; the augmented init path is covered by
# tests/test_augment.py and the golden DiMP trajectory.
RT = DiMPRuntime(image_sample_size=96, sample_memory_size=8, train_skipping=3,
                 use_augmentation=False)


def test_iounet_box_roundtrip():
    rt = RT
    pos = jnp.asarray([50.0, 70.0])
    sz = jnp.asarray([20.0, 30.0])
    sample_pos = jnp.asarray([48.0, 72.0])
    box = _get_iounet_box(rt, pos, sz, sample_pos, jnp.asarray(2.0))
    # center maps back
    cx = box[0] + (box[2] - 1) / 2
    cy = box[1] + (box[3] - 1) / 2
    back_y = (cy - (rt.image_sample_size - 1) / 2) * 2.0 + sample_pos[0]
    back_x = (cx - (rt.image_sample_size - 1) / 2) * 2.0 + sample_pos[1]
    assert float(back_y) == pytest.approx(50.0, abs=1e-4)
    assert float(back_x) == pytest.approx(70.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(box[2:]), [15.0, 10.0], atol=1e-5)


def _loc_state():
    return {"pos": jnp.asarray([50.0, 50.0]), "target_sz": jnp.asarray([20.0, 20.0])}


def test_localize_normal_peak():
    S = RT.score_sz
    scores = jnp.zeros((S, S)).at[3, 4].set(1.0)
    t, flag, ms = _localize_advanced(RT, scores, _loc_state(),
                                     jnp.asarray([50.0, 50.0]), jnp.asarray(1.0))
    assert int(flag) == FLAG_NORMAL
    assert float(ms) == pytest.approx(1.0)
    # displacement from center scaled to image: (3-c, 4-c) * (96/out)
    c = (S - 1) / 2
    out = S - (RT.kernel_size + 1) % 2
    np.testing.assert_allclose(np.asarray(t), [(3 - c) * 96 / out, (4 - c) * 96 / out],
                               rtol=1e-5)


def test_localize_not_found():
    S = RT.score_sz
    scores = jnp.full((S, S), 0.1)
    _, flag, _ = _localize_advanced(RT, scores, _loc_state(),
                                    jnp.asarray([50.0, 50.0]), jnp.asarray(1.0))
    assert int(flag) == FLAG_NOT_FOUND


def test_localize_distractor_far_is_hard_negative():
    S = RT.score_sz
    c = int((S - 1) / 2)
    # main peak at previous target position (center), distractor far away
    scores = jnp.zeros((S, S)).at[c, c].set(1.0).at[0, 0].set(0.9)
    _, flag, _ = _localize_advanced(RT, scores, _loc_state(),
                                    jnp.asarray([50.0, 50.0]), jnp.asarray(1.0))
    assert int(flag) == FLAG_HARD_NEG


def test_update_memory_fills_then_replaces_min_weight():
    rt = RT
    M, S, C = rt.sample_memory_size, rt.feat_sz, 4
    state = {
        "memory_feat": jnp.zeros((M, S, S, C)),
        "memory_boxes": jnp.zeros((M, 4)),
        "sample_weights": jnp.zeros(M).at[0].set(1.0),
        "num_stored": jnp.asarray(1, jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
    }
    feat = jnp.ones((S, S, C))
    box = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    lr = jnp.asarray(0.01)
    # fill all slots
    for i in range(1, M):
        state = _update_memory(rt, state, feat * i, box * i, lr)
        assert int(state["prev_replace_ind"]) == i
        assert float(state["sample_weights"].sum()) == pytest.approx(1.0, abs=1e-5)
    assert int(state["num_stored"]) == M
    # memory full: replaces the min-weight non-init slot
    w_before = np.asarray(state["sample_weights"])
    expect = int(np.argmin(np.where(np.arange(M) >= 1, w_before, np.inf)))
    state = _update_memory(rt, state, feat * 99, box * 99, lr)
    assert int(state["prev_replace_ind"]) == expect
    np.testing.assert_allclose(np.asarray(state["memory_boxes"][expect]),
                               np.asarray(box) * 99, rtol=1e-5)
    # init sample keeps its minimum weight share
    assert float(state["sample_weights"][0]) >= rt.init_samples_minimum_weight - 1e-5


@pytest.mark.slow
def test_dimp_tracker_end_to_end():
    net = DiMPNet(merge_type="max")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=5, height=120, width=160)
    tracker = DiMPTracker(net, params, RT)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    st = tracker.state
    assert float(st["sample_weights"][0]) == 1.0 and int(st["num_stored"]) == 1
    for t in range(1, 5):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and np.isfinite(out["best_score"])
        assert b[2] > 0 and b[3] > 0
    st = tracker.state
    assert int(st["frame_num"]) == 5
    assert float(st["sample_weights"].sum()) == pytest.approx(1.0, abs=1e-4)


def test_sample_geometry_matches_reference_replicate_and_inside_major():
    """_sample_geometry vs a numpy mirror of the reference's sample_patch
    integer geometry (preprocessing.py:57-150, df=1): pos.long()
    truncation, round/trunc side, (szl-1)//2 split, and the
    inside/inside_major shrink + shift-inside + overhang-centering path
    used by super_dimp/KeepTrack (keep_track/release.py:14-15)."""

    def ref_geometry(pos, scale, S, mode, im_hw, max_change):
        # float32 arithmetic throughout, as torch's f32 tensors compute it
        sample = np.float32(np.float32(scale) * S)
        if mode in ("inside", "inside_major"):
            shr = np.array([sample, sample], np.float32) \
                / np.array(im_hw, np.float32)
            shr = shr.max() if mode == "inside" else shr.min()
            shr = np.float32(min(max(shr, np.float32(1.0)),
                                 np.float32(max_change)))
            szl = max(int(np.float32(sample / shr)), 2)  # .long() truncation
        else:
            szl = max(round(float(sample)), 2)
        posl = np.trunc(pos).astype(np.int64)
        tl = posl - (szl - 1) // 2
        br = posl + szl // 2 + 1
        if mode in ("inside", "inside_major"):
            im = np.asarray(im_hw, np.int64)
            shift = np.clip(-tl, 0, None) - np.clip(br - im, 0, None)
            tl, br = tl + shift, br + shift
            outside = (np.clip(-tl, 0, None) + np.clip(br - im, 0, None)) // 2
            shift = (-tl - outside) * (outside > 0)
            tl, br = tl + shift, br + shift
        return float(szl), tl.astype(np.float64), 0.5 * (tl + br - 1)

    rng = np.random.RandomState(3)
    for mode in ("replicate", "inside_major", "inside"):
        rt = DiMPRuntime(image_sample_size=480, border_mode=mode,
                         patch_max_scale_change=1.5)
        for _ in range(40):
            im_hw = (int(rng.randint(100, 500)), int(rng.randint(100, 700)))
            pos = rng.uniform(-20, max(im_hw) + 20, (2,))
            scale = float(rng.uniform(0.05, 1.5))
            szl, tl, sp, ss = _sample_geometry(
                rt, jnp.asarray(pos, jnp.float32), jnp.float32(scale),
                im_hw=im_hw if mode != "replicate" else None)
            e_szl, e_tl, e_sp = ref_geometry(pos, scale, 480, mode, im_hw,
                                             1.5)
            assert float(szl) == e_szl, (mode, pos, scale)
            np.testing.assert_allclose(np.asarray(tl), e_tl, atol=1e-4)
            np.testing.assert_allclose(np.asarray(sp), e_sp, atol=1e-4)


def test_prdimp_tracker_end_to_end():
    """PrDiMP-50 recipe (KL Newton optimizer + softmax localization +
    relative box refinement + inside_major borders) runs the full loop on
    a small runtime; constants pinned to the AR fork's prdimp50.py."""
    from mmtrack_tpu.models.dimp import build_prdimp50
    from mmtrack_tpu.trackers.dimp_tracker import prdimp50_runtime

    rt = prdimp50_runtime()
    assert rt.image_sample_size == 22 * 16 and rt.search_area_scale == 6.0
    assert rt.border_mode == "inside_major"
    assert rt.patch_max_scale_change == 1.5
    assert rt.score_preprocess == "softmax"
    assert rt.target_not_found_threshold == 0.04
    assert rt.box_refinement_space == "relative"
    assert rt.box_refinement_iter == 10
    assert rt.box_refinement_step_length == 2.5e-3

    net = build_prdimp50()
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(
        jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160)
    small = prdimp50_runtime(image_sample_size=96, sample_memory_size=8,
                             train_skipping=3, use_augmentation=False)
    tracker = DiMPTracker(net, params, small)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    for t in range(1, 4):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
        # softmax-preprocessed confidence is a probability
        assert 0.0 <= out["best_score"] <= 1.0
    assert int(tracker.state["frame_num"]) == 4
