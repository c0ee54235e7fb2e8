"""KYS scene-propagation tracker: cost volume, shifts, predictor, loop.

Reference: keep_track_vot2021/ltr/models/motion/{cost_volume,resp_predictor,
conv_gru}.py + pytracking/tracker/kys/dimp_motion.py. The reference ships
no KYS parameter file; runtime-constant tests pin the tracker code's own
defaults.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtrack_tpu.models.kys import (ResponsePredictor, build_kysnet,
                                    center_shift_translation,
                                    local_cost_volume, shift_features)


def test_cost_volume_matches_naive():
    """Matmul + diagonal box-sum == the correlation-sampler semantics
    (SpatialCorrelationSampler(kernel, 2*md+1) + remap_cost_volume)."""
    r = np.random.RandomState(0)
    H = W = 6
    C, md, K = 4, 2, 3
    f_cur = r.randn(1, H, W, C).astype(np.float32)
    f_prev = r.randn(1, H, W, C).astype(np.float32)
    cv = np.asarray(local_cost_volume(jnp.asarray(f_cur), jnp.asarray(f_prev),
                                      md, K))[0]
    rp = K // 2
    f1p = np.pad(f_cur[0], ((rp, rp), (rp, rp), (0, 0)))
    f2p = np.pad(f_prev[0], ((rp, rp), (rp, rp), (0, 0)))
    naive = np.zeros((H * W, H, W), np.float32)
    for qy in range(H):
        for qx in range(W):
            for py in range(H):
                for px in range(W):
                    if abs(qy - py) <= md and abs(qx - px) <= md:
                        naive[qy * W + qx, py, px] = sum(
                            np.dot(f1p[py + ky, px + kx], f2p[qy + ky, qx + kx])
                            for ky in range(K) for kx in range(K))
    np.testing.assert_allclose(cv, naive, atol=1e-4)


def test_shift_features_matches_grid_sample():
    """Bilinear translation == affine_grid + grid_sample(zeros,
    align_corners=False), the reference shift_features (motion layers.py)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    r = np.random.RandomState(1)
    x = r.randn(2, 3, 8, 8).astype(np.float32)
    t = np.array([0.3, -0.45], np.float32)  # (t_x, t_y) normalized
    T = torch.eye(2).repeat(2, 1, 1)
    T = torch.cat([T, torch.tensor(t).view(1, 2, 1).repeat(2, 1, 1)], dim=2)
    grid = F.affine_grid(T, (2, 3, 8, 8), align_corners=False)
    ref = F.grid_sample(torch.tensor(x), grid, align_corners=False).numpy()
    ours = np.asarray(shift_features(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_center_shift_centers_the_box():
    """CenterShiftFeatures semantics: after the shift, the box center lands
    on the feature-map center."""
    S, stride = 8, 16
    box = jnp.asarray([40.0, 72.0, 32.0, 16.0])  # center (56, 80) px
    t = center_shift_translation(box, (S, S), stride)
    # shift in feature pixels = t * S/2; center cell = S/2
    cx, cy = 56.0 / stride, 80.0 / stride
    np.testing.assert_allclose(
        np.asarray(t) * S / 2, [cx - S / 2, cy - S / 2], atol=1e-6)


def test_response_predictor_shapes_and_ranges():
    H = W = 6
    P, d = H * W, 8
    pred = ResponsePredictor(state_dim=d)
    r = np.random.RandomState(0)
    cv = jnp.asarray(r.randn(1, P, H, W), jnp.float32)
    score = jnp.asarray(r.rand(1, H, W), jnp.float32)
    label = jnp.asarray(r.rand(1, H, W), jnp.float32)

    # init touching both entry points
    def init_fn(m):
        st = m.init_state(label)
        return m(cv, st, score)
    params = jax.jit(lambda k: pred.init(k, method=init_fn))(
        jax.random.PRNGKey(0))

    st0 = pred.apply(params, label, method=ResponsePredictor.init_state)
    assert st0.shape == (1, H, W, d)
    np.testing.assert_array_less(np.abs(np.asarray(st0)), 1.0 + 1e-6)  # tanh

    fused, st1, aux = pred.apply(params, cv, st0, score)
    assert fused.shape == (1, H, W)
    assert st1.shape == (1, H, W, d)
    # sigmoid response
    assert float(jnp.min(fused)) >= 0.0 and float(jnp.max(fused)) <= 1.0
    # propagation weights normalize over previous positions per current cell
    w = np.asarray(aux["cost_volume_processed"])  # (1, P, H, W)
    np.testing.assert_allclose(w.sum(axis=1), np.ones((1, H, W)), atol=1e-5)
    # confidence = max over prev, in (0, 1]
    conf = np.asarray(aux["propagation_conf"])
    assert (conf > 0).all() and (conf <= 1.0 + 1e-6).all()


def test_dimp_threshold_and_window_gate_response():
    H = W = 4
    pred = ResponsePredictor(state_dim=4)
    r = np.random.RandomState(2)
    cv = jnp.asarray(r.randn(1, H * W, H, W), jnp.float32)
    label = jnp.asarray(r.rand(1, H, W), jnp.float32)
    score = jnp.zeros((1, H, W)).at[0, 1, 2].set(1.0)

    def init_fn(m):
        return m(cv, m.init_state(label), score)
    params = jax.jit(lambda k: pred.init(k, method=init_fn))(
        jax.random.PRNGKey(1))
    st = pred.apply(params, label, method=ResponsePredictor.init_state)
    fused, _, _ = pred.apply(params, cv, st, score, 0.5, None)
    f = np.asarray(fused[0])
    # every cell whose dimp score <= 0.5 is zeroed (resp_predictor.py:546)
    mask = np.asarray(score[0]) > 0.5
    assert (f[~mask] == 0).all() and f[mask].min() > 0

    win = jnp.zeros((H, W)).at[1, 2].set(1.0)
    fused_w, _, _ = pred.apply(params, cv, st, score, None, win)
    fw = np.asarray(fused_w[0])
    assert (fw[~np.asarray(win, bool)] == 0).all()


def test_kys_runtime_defaults():
    """No parameter file exists in the reference; pin the dimp_motion.py
    .get defaults + the DiMP-50 base geometry."""
    from mmtrack_tpu.trackers.kys_tracker import KYSRuntime
    rt = KYSRuntime()
    assert rt.image_sample_size == 288 and rt.search_area_scale == 5.0
    assert rt.target_not_found_threshold_fused == 0.05
    assert rt.dimp_threshold == 0.05
    assert rt.remove_offset_in_fused_score
    assert rt.perform_hn_mining_dimp
    assert rt.target_neighborhood_scale_safe == 2.2
    assert rt.move_feat_to_center and rt.prev_feat_remove_subpixel_shift
    assert rt.reset_state_during_occlusion
    assert rt.output_sigma_factor == 0.25


def test_kys_tracker_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.trackers.kys_tracker import KYSRuntime, KYSTracker

    net = build_kysnet()
    im = jnp.zeros((1, 96, 96, 3))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props,
                                        method="init_forward"))(
        jax.random.PRNGKey(0))

    rt = KYSRuntime(image_sample_size=96, sample_memory_size=8,
                    train_skipping=3, use_augmentation=False)
    frames, gt = make_synthetic_sequence(n_frames=5, height=120, width=160)
    tracker = KYSTracker(net, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    st = tracker.state
    assert not bool(st["gru_valid"])
    assert st["motion_feat"].shape[-1] == 1024  # layer3 motion features
    for t in range(1, 5):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
        assert 0.0 <= out["best_score"] <= 1.0  # sigmoid-fused confidence
    st = tracker.state
    assert int(st["frame_num"]) == 5
    # the GRU state engages after the first tracked frame
    assert bool(st["gru_valid"])
    assert np.isfinite(np.asarray(st["gru_state"])).all()
