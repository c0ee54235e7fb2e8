"""KeepTrack peak-matching tests."""

import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.trackers.keep_track import (
    NEG_ID,
    PeakMatchConfig,
    extract_peaks,
    gather_descriptors,
    init_peak_state,
    match_peaks,
    peak_keypoints,
    update_peak_state,
)

CFG = PeakMatchConfig(num_peaks=4)
# the chronological occlusion logic is disabled in the reference's release
# configuration (release.py:80); enable it to test the marker machinery
CFG_CHRONO = PeakMatchConfig(num_peaks=4, disable_chrono=False)


def _map_with_peaks(peaks, shape=(19, 19)):
    m = np.zeros(shape, np.float32)
    for (y, x), s in peaks:
        m[y, x] = s
    return jnp.asarray(m)


def test_extract_peaks_topk_and_nms():
    m = _map_with_peaks([((5, 5), 1.0), ((5, 6), 0.9),   # NMS suppresses (5,6)
                         ((12, 3), 0.7), ((2, 15), 0.4)])
    scores, coords, valid = extract_peaks(m, CFG)
    s = np.asarray(scores)
    c = np.asarray(coords)
    assert s[0] == 1.0 and tuple(c[0]) == (5, 5)
    assert s[1] == 0.7 and tuple(c[1]) == (12, 3)
    assert s[2] == 0.4
    assert not bool(valid[3])  # only 3 true peaks


def test_gather_descriptors_normalized():
    feat = jnp.asarray(np.random.RandomState(0).randn(19, 19, 8).astype(np.float32))
    coords = jnp.asarray([[5.0, 5.0], [12.0, 3.0]])
    d = gather_descriptors(feat, coords)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0,
                               rtol=1e-5)


def test_peak_keypoints_image_coordinates():
    """Score-map cells map to image coords through the search-area box
    (extract_descriptors_and_keypoints, keep_track.py:1188-1193):
    kpt = (side-1) * cell/(S-1) + tl."""
    coords = jnp.asarray([[0.0, 0.0], [18.0, 18.0], [9.0, 0.0]])
    k = np.asarray(peak_keypoints(coords, 19, jnp.asarray([100.0, 50.0]),
                                  jnp.asarray(181.0)))
    np.testing.assert_allclose(k[0], [100.0, 50.0])
    np.testing.assert_allclose(k[1], [280.0, 230.0])   # tl + (side-1)
    np.testing.assert_allclose(k[2], [190.0, 50.0])


def test_match_peaks_mutual_nn():
    rng = np.random.RandomState(1)
    d_prev = rng.randn(4, 8).astype(np.float32)
    d_prev /= np.linalg.norm(d_prev, axis=1, keepdims=True)
    # current peaks: permuted copies of prev 0/1, one new
    d_cur = np.stack([d_prev[1], d_prev[0], rng.randn(8).astype(np.float32)], 0)
    d_cur = np.concatenate([d_cur, rng.randn(1, 8).astype(np.float32)])
    d_cur /= np.linalg.norm(d_cur, axis=1, keepdims=True)
    c_prev = jnp.asarray([[5.0, 5.0], [10.0, 10.0], [0.0, 0.0], [0.0, 0.0]])
    c_cur = jnp.asarray([[11.0, 10.0], [5.0, 6.0], [15.0, 15.0], [0.0, 0.0]])
    valid_prev = jnp.asarray([True, True, False, False])
    valid_cur = jnp.asarray([True, True, True, False])
    idx, prob = match_peaks(jnp.asarray(d_prev), c_prev, valid_prev,
                            jnp.asarray(d_cur), c_cur, valid_cur, CFG)
    assert int(idx[0]) == 1 and int(idx[1]) == 0  # identity follows descriptor
    assert int(idx[2]) == NEG_ID and int(idx[3]) == NEG_ID
    assert float(prob[0]) > 0.5


def _identity_sequence():
    """Target descriptor persists; a distractor appears and disappears."""
    rng = np.random.RandomState(2)
    target = rng.randn(8).astype(np.float32)
    distractor = rng.randn(8).astype(np.float32)
    return target / np.linalg.norm(target), distractor / np.linalg.norm(distractor)


def _frame(peaks, K=4):
    zero = np.zeros(8, np.float32)
    scores = jnp.asarray([p[0] for p in peaks] + [0.0] * (K - len(peaks)))
    coords = jnp.asarray([p[1] for p in peaks] + [[0.0, 0.0]] * (K - len(peaks)))
    desc = jnp.asarray(np.stack([p[2] for p in peaks]
                                + [zero] * (K - len(peaks))))
    valid = jnp.asarray([True] * len(peaks) + [False] * (K - len(peaks)))
    return scores, coords, desc, valid


def test_identity_tracking_and_redetection():
    target, distractor = _identity_sequence()

    # frame 0: strong target at (5,5)
    s, c, d, v = _frame([(0.9, [5.0, 5.0], target)])
    state = init_peak_state(CFG, s, c, c, v, d)
    assert int(state["selected_object_id"]) == 0
    assert int(state["object_id_cntr"]) == 1   # counter = number of peaks

    # frame 1: target moved + a distractor appears with a high-but-lower score
    s, c, d, v = _frame([(0.85, [15.0, 15.0], distractor),
                         (0.8, [6.0, 5.0], target)])
    state, sel_peak, lost = update_peak_state(state, CFG, s, c, c, v, d)
    # identity sticks with the matched target peak (track best 0.9 > 0.85)
    assert int(sel_peak) == 1 and not bool(lost)

    # frame 2: target vanishes -> not found
    s, c, d, v = _frame([(0.1, [15.0, 15.0], distractor)])
    s = s.at[0].set(0.1)
    state, sel_peak, lost = update_peak_state(state, CFG, s, c, c, v, d)
    assert bool(lost)

    # frame 3: a strong fresh peak -> redetect
    s, c, d, v = _frame([(0.6, [7.0, 6.0], target)])
    state, sel_peak, lost = update_peak_state(state, CFG, s, c, c, v, d)
    assert not bool(lost) and int(sel_peak) == 0


def test_uncertain_init_offsets_ids():
    """PeakCollection created at frame_num >= 10 starts uncertain: the id
    counter, selected id, and occlusion markers begin at 1
    (keep_track.py:266-270)."""
    target, _ = _identity_sequence()
    s, c, d, v = _frame([(0.9, [5.0, 5.0], target), (0.4, [9.0, 9.0], target)])
    state = init_peak_state(CFG, s, c, c, v, d, certain=False)
    assert int(state["selected_object_id"]) == 1
    assert int(np.asarray(state["object_ids"])[0]) == 1
    assert int(state["object_id_cntr"]) == 3
    assert int(state["occlusion_id_state"]) == 1
    assert not bool(state["selection_certain"])


def test_jump_to_stronger_track():
    """Reference behavior (keep_track.py:327-336): if the top peak's track
    accumulates a higher score than the selected track, identity jumps."""
    target, distractor = _identity_sequence()
    s = jnp.asarray([0.9, 0.0, 0.0, 0.0])
    c = jnp.asarray([[5.0, 5.0]] + [[0.0, 0.0]] * 3)
    d = jnp.asarray(np.stack([target] + [np.zeros(8, np.float32)] * 3))
    v = jnp.asarray([True, False, False, False])
    state = init_peak_state(CFG, s, c, c, v, d)

    s2 = jnp.asarray([0.95, 0.8, 0.0, 0.0])
    c2 = jnp.asarray([[15.0, 15.0], [6.0, 5.0], [0.0, 0.0], [0.0, 0.0]])
    d2 = jnp.asarray(np.stack([distractor, target] + [np.zeros(8, np.float32)] * 2))
    v2 = jnp.asarray([True, True, False, False])
    state, sel_peak, lost = update_peak_state(state, CFG, s2, c2, c2, v2, d2)
    assert int(sel_peak) == 0 and not bool(lost)  # jumped to the 0.95 track


def test_occlusion_excludes_preexisting_distractor_on_lost_frame():
    """With the chronological logic ENABLED, the occlusion marker advances
    to the pre-frame id counter BEFORE the redetect scan (reference
    PeakCollection.update) — an old distractor track alive since before
    the occlusion must NOT steal the identity, even with a strong score.
    Caught live: the stale marker let it redetect immediately."""
    target, distractor = _identity_sequence()

    # frame 0: strong target (certainty builds) + frame 1 keeps it certain
    s, c, d, v = _frame([(0.95, [5.0, 5.0], target)])
    state = init_peak_state(CFG_CHRONO, s, c, c, v, d)
    s, c, d, v = _frame([(0.9, [5.5, 5.0], target),
                         (0.7, [15.0, 15.0], distractor)])
    state, sel_peak, lost = update_peak_state(state, CFG_CHRONO, s, c, c, v, d)
    assert not bool(lost)
    distractor_id = int(np.asarray(state["object_ids"])[1])

    # target vanishes; the PRE-EXISTING distractor stays strong — it must
    # not be redetected as the target on the lost frame
    s, c, d, v = _frame([(0.8, [15.5, 15.0], distractor)])
    state, sel_peak, lost = update_peak_state(state, CFG_CHRONO, s, c, c, v, d)
    assert bool(lost), "old distractor stole the identity on the lost frame"
    assert int(state["selected_object_id"]) != distractor_id


def test_release_mode_redetects_immediately():
    """With disable_chronological_occlusion_redetection_logic=True (the
    release default, release.py:80) the occlusion markers pin to 0, so ANY
    sufficiently strong peak redetects — including a pre-existing
    distractor track (keep_track.py:351-354 force the markers to 0)."""
    target, distractor = _identity_sequence()
    s, c, d, v = _frame([(0.95, [5.0, 5.0], target)])
    state = init_peak_state(CFG, s, c, c, v, d)
    s, c, d, v = _frame([(0.9, [5.5, 5.0], target),
                         (0.7, [15.0, 15.0], distractor)])
    state, sel_peak, lost = update_peak_state(state, CFG, s, c, c, v, d)
    assert not bool(lost)
    distractor_id = int(np.asarray(state["object_ids"])[1])

    s, c, d, v = _frame([(0.8, [15.5, 15.0], distractor)])
    state, sel_peak, lost = update_peak_state(state, CFG, s, c, c, v, d)
    assert not bool(lost) and int(sel_peak) == 0
    assert int(state["selected_object_id"]) == distractor_id
    assert int(state["occlusion_id_state"]) == 0
