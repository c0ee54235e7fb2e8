"""STARK/SPT and MixFormer tests (small configs for 1-core CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.mixformer import MixFormer
from mmtrack_tpu.models.stark import STARK, sine_position_embedding
from mmtrack_tpu.trackers.mixformer_tracker import MixFormerRuntime, MixFormerTracker
from mmtrack_tpu.trackers.stark_tracker import STARKRuntime, STARKTracker

STARK_SMALL = dict(template_size=64, search_size=96, dim=64, heads=4,
                   enc_layers=2, dec_layers=2)
MF_SMALL = dict(template_size=64, search_size=96, stage_dims=(16, 32, 48),
                stage_depths=(1, 1, 2), stage_heads=(1, 2, 3))


def test_sine_position_embedding_properties():
    pos = np.asarray(sine_position_embedding(4, 6, 64))
    assert pos.shape == (24, 64)
    assert np.isfinite(pos).all()
    # distinct positions get distinct codes
    assert np.unique(pos.round(5), axis=0).shape[0] == 24


@pytest.mark.parametrize("six", [False, True])
def test_stark_forward(six):
    model = STARK(six_channel=six, **STARK_SMALL)
    C = 6 if six else 3
    z = jnp.zeros((1, 64, 64, C))
    x = jnp.zeros((1, 96, 96, C))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, z, x))(params)
    b = np.asarray(out["pred_boxes"])
    assert b.shape == (1, 4)
    assert (b >= -1e-3).all() and (b <= 1 + 1e-3).all()


def test_stark_score_head():
    model = STARK(score_head=True, **STARK_SMALL)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 96, 96, 3))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, z, x))(params)
    s = float(out["pred_scores"][0])
    assert 0.0 < s < 1.0


def test_stark_tracker_end_to_end():
    model = STARK(score_head=True, **STARK_SMALL)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 96, 96, 3))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160,
                                         channels=3)
    rt = STARKRuntime(template_size=64, search_size=96, dynamic_template=True,
                      update_interval=2, update_threshold=0.0)
    tracker = STARKTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    z0 = np.asarray(tracker.state["z_dyn"])
    for t in range(1, 4):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
    # dynamic template refreshed at the interval (threshold 0)
    assert not np.allclose(z0, np.asarray(tracker.state["z_dyn"]))


def test_mixformer_forward_shapes():
    model = MixFormer(in_channels=6, **MF_SMALL)
    z = jnp.zeros((2, 64, 64, 6))
    x = jnp.zeros((2, 96, 96, 6))
    params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, z, z, x))(params)
    assert out["pred_boxes"].shape == (2, 4)
    assert out["pred_scores"].shape == (2,)
    s = np.asarray(out["pred_scores"])
    assert ((s > 0) & (s < 1)).all()


def test_mixformer_template_isolation():
    """Mixed attention: template features must not depend on the search
    (template/online-template queries only see template keys,
    mixformerrgbd_online.py:262-270)."""
    model = MixFormer(in_channels=3, **MF_SMALL)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    x1 = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    params = jax.jit(lambda r: model.init(r, z, z, x1))(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, s: model.apply(
        p, z, z, s, run_score_head=False, return_features=True))
    t1 = f(params, x1)["template_feat"]
    t2 = f(params, x2)["template_feat"]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_mixformer_scale_adaptive_samf():
    """SAMF mode: multiple search scales, best one selected per frame."""
    model = MixFormer(in_channels=6, **MF_SMALL)
    z = jnp.zeros((1, 64, 64, 6))
    x = jnp.zeros((1, 96, 96, 6))
    params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=3, height=120, width=160)
    rt = MixFormerRuntime(template_size=64, search_size=96,
                          scale_factors=(0.8, 1.0, 1.25))
    tracker = MixFormerTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    out = tracker.track(frames[1])
    b = out["target_bbox"]
    assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0


def test_mixformer_tracker_end_to_end():
    model = MixFormer(in_channels=6, **MF_SMALL)
    z = jnp.zeros((1, 64, 64, 6))
    x = jnp.zeros((1, 96, 96, 6))
    params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160)
    rt = MixFormerRuntime(template_size=64, search_size=96,
                          update_interval=2, online_threshold=0.0)
    tracker = MixFormerTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    for t in range(1, 4):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0


def test_mixformer_ot_mask_exact():
    """Masked K-slot ring with n valid slots must equal the joint forward
    with exactly n online templates: the ot_mask reproduces the reference's
    grow-from-1 set_online (mixformerrgbd_online.py:324-388) with static
    shapes."""
    model = MixFormer(in_channels=3, **MF_SMALL)
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ots = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    params = jax.jit(lambda r: model.init(r, z, ots, x))(jax.random.PRNGKey(0))

    for n in (1, 2, 4):
        exact = model.apply(params, z, ots[:, :n], x)
        # pad the ring with garbage (scaled noise) in the masked slots
        pad = jnp.concatenate(
            [ots[:, :n], 13.0 * ots[:, n:] + 7.0], axis=1)
        mask = (jnp.arange(4) < n)[None]
        masked = model.apply(params, z, pad, x, ot_mask=mask)
        np.testing.assert_allclose(np.asarray(masked["pred_boxes"]),
                                   np.asarray(exact["pred_boxes"]),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(masked["score_logits"]),
                                   np.asarray(exact["score_logits"]),
                                   atol=2e-5)


def test_mixformer_ring_grows_like_reference():
    """Ring bookkeeping: concat while len < K (forget pointer untouched),
    then replace at the forget pointer (tracker:167-183)."""
    model = MixFormer(in_channels=6, **MF_SMALL)
    z = jnp.zeros((1, 64, 64, 6))
    x = jnp.zeros((1, 96, 96, 6))
    params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=9, height=120, width=160)
    rt = MixFormerRuntime(template_size=64, search_size=96,
                          update_interval=2, online_size=3,
                          online_threshold=0.0)
    tracker = MixFormerTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    expect = [(1, 0), (2, 0), (2, 0), (3, 0), (3, 0), (3, 1), (3, 1), (3, 2)]
    seen = []
    for t in range(1, 9):
        tracker.track(frames[t])
        seen.append((int(tracker.state["n_online"]),
                     int(tracker.state["forget_id"])))
    assert seen == expect, seen
