"""STM space-time memory mask tracker (models/stm.py, stm_tracker.py).

Reference: keep_track_vot2021/pytracking/tracker/stm/{model.py,stm.py}
(the fork's vendored single-object STM)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.stm import STMNet, build_stm
from mmtrack_tpu.trackers.stm_tracker import (STMRuntime, STMTracker,
                                              _paste_prob, _seg_to_state)

RT = STMRuntime(image_sample_size=96, mem_slots=4, memory_skip_rate=2)


def _params(model):
    f = jnp.zeros((1, 96, 96, 3))
    m = jnp.zeros((1, 96, 96))
    return jax.jit(lambda r: model.init(r, f, m))(jax.random.PRNGKey(0))


def test_memory_read_prefers_matching_key():
    """The space-time read (model.py:129-152) must put its attention mass
    on the memory position whose key matches the query."""
    model = build_stm()
    params = _params(model)
    r = np.random.RandomState(0)
    frame = jnp.asarray(r.rand(1, 96, 96, 3).astype(np.float32))
    k, v = model.apply(params, frame, jnp.zeros((1, 96, 96)),
                       method="memorize")
    h = k.shape[1]
    assert k.shape == (1, h, h, model.keydim)
    assert v.shape == (1, h, h, model.valdim)
    # a bank holding the query's own keys + an invalid junk slot: the
    # junk must not contribute (validity mask folds it out)
    qk = model.apply(params, frame, method="query_features")[0]
    qk = model.apply(params, frame, k, v, jnp.ones((1,)), method="segment")
    assert qk.shape == (96, 96)
    assert float(jnp.min(qk)) >= 0.0 and float(jnp.max(qk)) <= 1.0

    junk_k = jnp.full_like(k[0], 1e3)[None]
    keys2 = jnp.concatenate([k, junk_k], axis=0)
    vals2 = jnp.concatenate([v, jnp.full_like(v[0], 1e3)[None]], axis=0)
    p_valid = model.apply(params, frame, keys2, vals2,
                          jnp.asarray([1.0, 0.0]), method="segment")
    p_ref = model.apply(params, frame, k, v, jnp.ones((1,)),
                        method="segment")
    np.testing.assert_allclose(np.asarray(p_valid), np.asarray(p_ref),
                               atol=1e-5)


def test_seg_to_state_modes():
    prob = np.zeros((60, 80), np.float32)
    prob[20:30, 40:56] = 1.0
    pos0 = jnp.asarray([10.0, 10.0])
    sz0 = jnp.asarray([12.0, 16.0])
    # md_hack: center of mass moves, size fixed (stm.py:193-198)
    pos, sz = _seg_to_state(RT, jnp.asarray(prob), pos0, sz0)
    np.testing.assert_allclose(np.asarray(pos), [24.5, 47.5], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sz), np.asarray(sz0))
    # var mode re-estimates the size
    rt_var = STMRuntime(image_sample_size=96, seg_to_bb_mode="var")
    _, sz_var = _seg_to_state(rt_var, jnp.asarray(prob), pos0, sz0)
    assert float(sz_var[0]) > 0 and float(sz_var[1]) > float(sz_var[0])


def test_paste_prob_zero_fill():
    rt = STMRuntime(image_sample_size=32)
    prob = jnp.ones((32, 32))
    out = _paste_prob(rt, prob, jnp.asarray([20.0, 20.0]),
                      jnp.asarray(1.0), (60, 80))
    o = np.asarray(out)
    assert o[20, 20] == 1.0 and o[50, 70] == 0.0  # zero outside (stm.py:253)


def test_stm_tracker_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    model = build_stm()
    params = _params(model)
    frames, gt = make_synthetic_sequence(n_frames=5, height=120, width=160)
    tracker = STMTracker(model, params, RT)
    assert tracker.predicts_segmentation_mask
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    st = tracker.state
    assert float(st["mem_valid"].sum()) == 1.0  # init frame only
    for t in range(1, 5):
        out = tracker.track(frames[t])
        assert out["segmentation"].shape == frames[t].shape[:2]
        assert np.isfinite(out["target_bbox"]).all()
    st = tracker.state
    assert int(st["frame_num"]) == 5
    # schedule (skip=2): commits at frames 2 and 4 -> 3 valid slots
    assert float(st["mem_valid"].sum()) == 3.0
    # md_hack keeps the size equal to init
    np.testing.assert_allclose(np.asarray(st["target_sz"]),
                               [gt[0][3], gt[0][2]], rtol=0.2)
