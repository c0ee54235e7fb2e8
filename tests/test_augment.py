"""DiMP init-augmentation set (ops/augment.py vs the reference transform
semantics, pytracking/features/augmentation.py + dimp.py:331-400)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtrack_tpu.ops.augment import (
    BLUR_SIGMAS,
    ROTATE_ANGLES,
    RELATIVE_SHIFTS,
    _blur,
    _gauss_kernel,
    _rotated_window,
    _window,
    dimp_init_augmentations,
    feature_dropout,
    num_image_augmentations,
)

S = 64  # output (sample) size for tests; expanded patch is 2S


def _expanded(seed=0, channels=3):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(0, 1, (2 * S, 2 * S, channels)).astype(np.float32))


def test_window_identity_is_center_crop():
    e = _expanded()
    w = _window(e, S, jnp.zeros(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(w),
                                  np.asarray(e)[S // 2:S // 2 + S, S // 2:S // 2 + S])


def test_window_shift_moves_content():
    e = _expanded()
    s = jnp.asarray([5, -7], jnp.int32)
    w = _window(e, S, s)
    base = S // 2
    np.testing.assert_array_equal(
        np.asarray(w), np.asarray(e)[base - 5:base - 5 + S, base + 7:base + 7 + S])


def test_flip_window():
    e = _expanded()
    w = _window(jnp.flip(e, axis=1), S, jnp.zeros(2, jnp.int32))
    expect = np.asarray(e)[:, ::-1][S // 2:S // 2 + S, S // 2:S // 2 + S]
    np.testing.assert_array_equal(np.asarray(w), expect)


def test_gauss_kernel_normalized():
    for sigma in (1.0, 2.0, 3.0):
        k = np.asarray(_gauss_kernel(sigma))
        assert k.shape[0] == 2 * int(np.ceil(2 * sigma)) + 1
        np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)


def test_blur_matches_numpy_separable():
    e = _expanded(1, channels=2)
    out = np.asarray(jax.jit(lambda x: _blur(x, (2.0, 2.0)))(e))
    k = np.asarray(_gauss_kernel(2.0))
    ref = np.asarray(e)
    from numpy import apply_along_axis
    ref = apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 0, ref)
    ref = apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 1, ref)
    # compare away from the zero-padded frontier
    np.testing.assert_allclose(out[8:-8, 8:-8], ref[8:-8, 8:-8], atol=1e-4)


def test_rotate_zero_is_identity():
    e = _expanded()
    w = _rotated_window(e, S, 0.0, jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(_window(e, S, jnp.zeros(2, jnp.int32))),
        atol=1e-5)


def test_rotate_moves_peak_consistently():
    # a bright dot off-center must move along a circle under rotation
    e = np.zeros((2 * S, 2 * S, 1), np.float32)
    c = (2 * S - 1) / 2.0
    e[int(c) + 20, int(c)] = 1.0  # 20 px below center
    e = jnp.asarray(e)
    w = np.asarray(_rotated_window(e, S, 90.0, jnp.zeros(2, jnp.int32)))
    iy, ix = np.unravel_index(np.argmax(w[..., 0]), w.shape[:2])
    # 90 deg rotation about the center maps (dy,dx)=(20,0) onto dx=+-20, dy=0
    cy = (S - 1) / 2.0
    assert abs(iy - cy) <= 1.5
    assert abs(abs(ix - cy) - 20) <= 1.5


def test_init_augmentation_batch_layout():
    e = _expanded(2, channels=6)
    patches, shifts = jax.jit(
        lambda x, r: dimp_init_augmentations(x, S, r))(e, jax.random.PRNGKey(0))
    n = num_image_augmentations()
    assert patches.shape == (n, S, S, 6)
    assert shifts.shape == (n, 2)
    # identity first, zero shift (dimp.py:373 'Always put identity first')
    np.testing.assert_array_equal(np.asarray(shifts[0]), [0, 0])
    # relative shifts are the deterministic +-0.6 corners
    expect = [[int(r[0] * S / 2), int(r[1] * S / 2)] for r in RELATIVE_SHIFTS]
    np.testing.assert_array_equal(np.asarray(shifts[1:5], np.int32), expect)
    # every patch differs from the identity patch
    for i in range(1, n):
        assert float(jnp.abs(patches[i] - patches[0]).max()) > 1e-3
    # random shifts bounded by random_shift_factor/2 * S
    assert np.abs(np.asarray(shifts[5:])).max() <= S / 6 + 1e-6


def test_feature_dropout():
    feat = jnp.ones((8, 8, 32))
    out = feature_dropout(feat, jax.random.PRNGKey(1), 2, 0.2)
    assert out.shape == (2, 8, 8, 32)
    o = np.asarray(out)
    for i in range(2):
        per_channel = o[i].reshape(-1, 32)
        zeroed = np.all(per_channel == 0, axis=0)
        kept = ~zeroed
        assert zeroed.any() or True  # stochastic; scale check below is exact
        np.testing.assert_allclose(per_channel[:, kept], 1.0 / 0.8, atol=1e-6)


@pytest.mark.slow
def test_augmented_init_localizes_on_all_training_views():
    """The filter optimized over the full augmented set must put its score
    peak at the target on EVERY in-set view (identity + rotations) — the
    correctness property of label placement under the transforms (a
    mislabeled rotation or shift would displace the peak).

    Round-3 root-cause of the former xfail ("augmented init must BEAT the
    single-sample filter on rotated views"): that premise is false. Run
    through the parity shims, the REFERENCE'S OWN generate_init_samples +
    get_filter shows the same ordering on this synthetic setup — its
    single-sample filter out-discriminates its augmented filter at every
    angle (0.34 vs 0.25 center-margin, incl. the in-set 45/-45). With a
    random-weight backbone on a synthetic block, fitting 13 diverse views
    with one linear 4x4 filter trades per-view margin for cross-view
    robustness; augmentation's benefit is tracking robustness, not
    per-view margin. (The former test also evaluated -30deg, which is not
    in ROTATE_ANGLES = (10, -10, 45, -45).) Our transforms themselves are
    now pixel-checked against the reference's in
    tools/parity/check_augmentation.py: window/flip exact, blur 2e-7,
    rotation within cv2's fixed-point remap quantization."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.dimp_tracker import (DiMPRuntime,
                                                   dimp_init_state,
                                                   _sample_geometry,
                                                   _normalize)
    from mmtrack_tpu.ops.crop import crop_at
    from mmtrack_tpu.ops.augment import ROTATE_ANGLES, _rotated_window
    from functools import partial

    frames, gt = make_synthetic_sequence(n_frames=2, height=120, width=160,
                                         seed=23)
    net = DiMPNet(merge_type="max")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(
        jax.random.PRNGKey(5))

    rt = DiMPRuntime(image_sample_size=96, sample_memory_size=20,
                     train_skipping=3)
    state = jax.jit(partial(dimp_init_state, rt, net))(
        params, jnp.asarray(frames[0]), jnp.asarray(gt[0], jnp.float32))
    crop_sz, tl, _, _ = _sample_geometry(rt, state["pos"],
                                         state["target_scale"])
    expanded = _normalize(crop_at(jnp.asarray(frames[0]), state["pos"],
                                  crop_sz * 2, rt.image_sample_size * 2))
    for ang in (0.0,) + tuple(ROTATE_ANGLES):
        view = _rotated_window(expanded, rt.image_sample_size, ang,
                               jnp.zeros(2, jnp.int32))
        bf = net.apply(params, view[None], method=DiMPNet.extract_backbone)
        cf = net.apply(params, bf,
                       method=DiMPNet.extract_classification_feat)
        scores = np.asarray(net.apply(params, state["filter"], cf,
                                      method=DiMPNet.classify)[0])
        S_ = scores.shape[0]
        c = S_ // 2
        iy, ix = np.unravel_index(scores.argmax(), scores.shape)
        assert abs(iy - c) <= 2 and abs(ix - c) <= 2, (ang, iy, ix)


def test_rotate_matches_cv2_warpaffine():
    """_rotated_window must reproduce the reference's Rotate transform:
    forward R = [[cos,sin],[-sin,cos]] handed to cv2.warpAffine (which
    inverts it internally). Caught live: applying R directly as the
    dst->src map rotates by -angle."""
    import cv2
    import math as m

    rng = np.random.RandomState(3)
    S = 32
    e = rng.rand(2 * S, 2 * S).astype(np.float32)
    for angle in (17.0, -40.0):
        a = m.pi * angle / 180
        c = (np.expand_dims(np.array(e.shape[:2]), 1) - 1) / 2
        R = np.array([[m.cos(a), m.sin(a)], [-m.sin(a), m.cos(a)]])
        H = np.concatenate([R, c - R @ c], 1)
        ref = cv2.warpAffine(e, H, e.shape[1::-1],
                             borderMode=cv2.BORDER_REPLICATE)
        base = S // 2
        ref_win = ref[base:base + S, base:base + S]
        got = np.asarray(_rotated_window(
            jnp.asarray(e)[..., None], S, angle,
            jnp.zeros(2, jnp.int32)))[..., 0]
        # interiors must agree (bilinear kernels differ slightly at border
        # replication); compare away from the window edge
        np.testing.assert_allclose(got[2:-2, 2:-2], ref_win[2:-2, 2:-2],
                                   atol=2e-2)
