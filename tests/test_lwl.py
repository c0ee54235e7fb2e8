"""LWL few-shot segmentation tracker: resizes, seg->box, paste, loop.

Reference: keep_track_vot2021/ltr/models/lwl/ + pytracking/tracker/lwl/
lwl.py. Full-network weight parity lives in tools/parity/check_lwl.py
(wrapped by test_parity_torch.py); these tests pin the tracker-side math
and run the loop end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtrack_tpu.models.lwl import build_lwl, interpolate, resize_bicubic
from mmtrack_tpu.trackers.lwl_tracker import (LWLRuntime, LWLTracker,
                                              _mask_to_box, _paste_scores,
                                              _seg_to_box)

RT = LWLRuntime(image_sample_size=96, sample_memory_size=4,
                net_opt_iter=3, net_opt_update_iter=1)


def test_resize_bicubic_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    r = np.random.RandomState(0)
    x = r.randn(2, 3, 7, 9).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), (13, 20), mode="bicubic",
                        align_corners=False).numpy()
    ours = np.asarray(resize_bicubic(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (13, 20)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_seg_to_box_var_mode():
    """'var' seg_to_bb: probability center of mass + sqrt(var) * factor
    (lwl.py:288-303)."""
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    prob = np.exp(-0.5 * (((yy - 40) / 6) ** 2 + ((xx - 20) / 4) ** 2))
    pos, sz = _seg_to_box(RT, jnp.asarray(prob), jnp.zeros(2), jnp.ones(2))
    np.testing.assert_allclose(np.asarray(pos), [40, 20], atol=0.5)
    # sigma * 4
    np.testing.assert_allclose(np.asarray(sz), [24, 16], rtol=0.05)


def test_seg_to_box_min_area_gate():
    """Tiny (or the init +-100 raw) masks keep the previous state
    (lwl.py:284-286)."""
    prob = jnp.zeros((64, 64)).at[3, 3].set(1.0)
    pos0, sz0 = jnp.asarray([10.0, 11.0]), jnp.asarray([5.0, 6.0])
    pos, sz = _seg_to_box(RT, prob, pos0, sz0)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos0))
    np.testing.assert_array_equal(np.asarray(sz), np.asarray(sz0))


def test_paste_scores_matches_interpolate_then_paste():
    """The inverse-map gather == F.interpolate(scale) + integer paste with
    -100 fill (convert_scores_crop_to_image, lwl.py:335-364)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rt = LWLRuntime(image_sample_size=32)
    r = np.random.RandomState(1)
    scores = r.randn(32, 32).astype(np.float32)
    H, W = 70, 90
    sample_pos = np.array([30.0, 42.0], np.float32)
    sample_scale = np.float32(1.375)

    ours = np.asarray(_paste_scores(rt, jnp.asarray(scores),
                                    jnp.asarray(sample_pos),
                                    jnp.asarray(sample_scale), (H, W)))

    re = F.interpolate(torch.tensor(scores)[None, None],
                       scale_factor=float(sample_scale),
                       mode="bilinear")[0, 0].numpy()
    ref = np.full((H, W), -100.0, np.float32)
    r1 = int(sample_pos[0] - 0.5 * re.shape[0])
    c1 = int(sample_pos[1] - 0.5 * re.shape[1])
    r2, c2 = r1 + re.shape[0], c1 + re.shape[1]
    r1p, c1p = max(0, -r1), max(0, -c1)
    r2p, c2p = max(r2 - H, 0), max(c2 - W, 0)
    ref[r1 + r1p:r2 - r2p, c1 + c1p:c2 - c2p] = \
        re[r1p:re.shape[0] - r2p, c1p:re.shape[1] - c2p]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mask_to_box():
    m = jnp.zeros((20, 30), bool).at[5:9, 10:17].set(True)
    np.testing.assert_array_equal(np.asarray(_mask_to_box(m)), [10, 5, 7, 4])
    # empty mask: the reference's [0,0,0,0]-vertices path gives (0,0,1,1)
    np.testing.assert_array_equal(
        np.asarray(_mask_to_box(jnp.zeros((20, 30), bool))), [0, 0, 1, 1])


def test_lwl_runtime_defaults():
    rt = LWLRuntime()
    assert rt.image_sample_size == 480 and rt.search_area_scale == 6.0
    assert rt.sample_memory_size == 32
    assert rt.min_mask_area == 100.0 and rt.seg_to_bb_sz_factor == 4.0
    assert rt.max_scale_change == (0.95, 1.1)


def test_lwl_tracker_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    net = build_lwl(num_filters=2, label_encoder_dims=(4, 8, 8),
                    decoder_mdim=16, optim_iter=2)
    im = jnp.zeros((1, 96, 96, 3))
    m = jnp.zeros((1, 96, 96))
    params = jax.jit(lambda r: net.init(r, im, im, m))(jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160)
    tracker = LWLTracker(net, params, RT)
    assert tracker.predicts_segmentation_mask
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    st = tracker.state
    assert int(st["num_stored"]) == 1
    # the init wire is the reference's raw +-100 mask scaling (lwl.py:57)
    raw = np.asarray(st["seg_prob_im"])
    assert set(np.unique(raw)).issubset({-100.0, 100.0})
    for t in range(1, 4):
        out = tracker.track(frames[t])
        assert out["segmentation"].shape == frames[t].shape[:2]
        assert np.isfinite(out["target_bbox"]).all()
    st = tracker.state
    assert int(st["frame_num"]) == 4
    # memory engaged after frame 2 (update gate: frame_num > 2)
    assert int(st["num_stored"]) >= 2
    assert np.isfinite(np.asarray(st["filter"])).all()


def test_lwl_tracker_accepts_init_mask():
    net = build_lwl(num_filters=2, label_encoder_dims=(4, 8, 8),
                    decoder_mdim=16, optim_iter=2)
    im = jnp.zeros((1, 96, 96, 3))
    m = jnp.zeros((1, 96, 96))
    params = jax.jit(lambda r: net.init(r, im, im, m))(jax.random.PRNGKey(0))
    frame = np.zeros((80, 100, 3), np.float32)
    mask = np.zeros((80, 100), np.float32)
    mask[20:40, 30:60] = 1.0
    tracker = LWLTracker(net, params, RT)
    tracker.initialize(frame, {"init_bbox": [30, 20, 30, 20],
                               "init_mask": mask})
    assert tracker.state is not None


def test_lwl_box_encoder_init_and_training():
    """The LWL-box variant (lwl_box_net.py): box->mask-encoding init on
    the full frame + LWTLBoxActor-style training step."""
    from mmtrack_tpu.train.optim import build_optimizer
    from mmtrack_tpu.train.train_step import TrainState
    from mmtrack_tpu.train import zoo_actors

    net = build_lwl(num_filters=2, label_encoder_dims=(4, 8, 8),
                    decoder_mdim=16, optim_iter=2, use_box_encoder=True,
                    box_label_encoder_dims=(8, 8))
    S = 96
    r = np.random.RandomState(0)
    im = jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32))
    m = jnp.zeros((1, S, S))

    def init_fn(mod):
        out = mod(im, im, m)
        bf = mod.extract_backbone(im)
        tm = mod.extract_target_model_features(bf)
        mod.mask_from_box(jnp.asarray([[20.0, 20.0, 40.0, 30.0]]), tm, bf,
                          (S, S))
        return out

    params = jax.jit(lambda k: net.init(k, method=init_fn))(
        jax.random.PRNGKey(0))
    assert "box_label_encoder" in params["params"]

    # box-init path in the tracker (no init_mask supplied)
    frame = np.random.RandomState(1).randint(
        0, 255, (96, 96, 3)).astype(np.float32)
    tracker = LWLTracker(net, params, RT)
    tracker.initialize(frame, {"init_bbox": [20, 20, 40, 30]})
    # the wire holds the box decoder's raw logits, not the +-100 scaling
    raw = np.asarray(tracker.state["seg_prob_im"])
    assert not set(np.unique(raw)).issubset({-100.0, 100.0})
    assert np.isfinite(raw).all()

    mask = np.zeros((1, S, S), np.float32)
    mask[:, 25:55, 22:60] = 1.0
    batch = {"train_images": im,
             "train_anno": jnp.asarray([[22.0, 25.0, 38.0, 30.0]]),
             "train_masks": jnp.asarray(mask)}
    tx = build_optimizer(params, lr=1e-3, weight_decay=0.0,
                         lr_drop_step=10_000, grad_clip_norm=1.0)
    st = TrainState.create(params, tx)
    step = jax.jit(zoo_actors.make_lwl_box_train_step(net, tx))
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(8):
        rng, k = jax.random.split(rng)
        st, stats = step(st, batch, k)
        losses.append(float(stats["Loss/total"]))
    assert losses[-1] < losses[0], losses


def test_crop_mask_nearest_matches_torch_is_mask_path():
    """_crop_mask_nearest == sample_patch(is_mask=True): zero-pad crop +
    F.interpolate(mode='nearest') with the floor(dst*in/out) index rule
    (preprocessing.py:133,145)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from mmtrack_tpu.trackers.lwl_tracker import _crop_mask_nearest

    r = np.random.RandomState(0)
    img = (r.rand(40, 50) > 0.5).astype(np.float32)
    S = 24
    for tl_y, tl_x, szl in [(-5, 3, 31), (10, 20, 37), (25, 40, 19)]:
        t = torch.tensor(img)[None, None]
        pad = (-tl_x, tl_x + szl - 50, -tl_y, tl_y + szl - 40)
        patch = F.pad(t, tuple(int(v) for v in pad))  # zero fill
        ref = F.interpolate(patch, (S, S), mode="nearest")[0, 0].numpy()
        ours = np.asarray(_crop_mask_nearest(
            jnp.asarray(img), jnp.asarray([float(tl_y), float(tl_x)]),
            jnp.asarray(float(szl)), S))
        np.testing.assert_array_equal(ours, ref, err_msg=str((tl_y, tl_x, szl)))
