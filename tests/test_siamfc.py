"""SiamFC + xcorr op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.siamfc import SiamFC
from mmtrack_tpu.ops.xcorr import depthwise_xcorr, depthwise_xcorr_pallas, xcorr
from mmtrack_tpu.trackers.siamfc_tracker import SiamFCRuntime, SiamFCTracker


def test_xcorr_matches_manual():
    rng = np.random.RandomState(0)
    z = rng.randn(2, 2, 3).astype(np.float32)
    x = rng.randn(1, 4, 5, 3).astype(np.float32)
    got = np.asarray(xcorr(jnp.asarray(z), jnp.asarray(x)))[0]
    want = np.zeros((3, 4))
    for i in range(3):
        for j in range(4):
            want[i, j] = (x[0, i:i + 2, j:j + 2] * z).sum()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depthwise_xcorr_matches_manual():
    rng = np.random.RandomState(1)
    z = rng.randn(2, 2, 3).astype(np.float32)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    got = np.asarray(depthwise_xcorr(jnp.asarray(z), jnp.asarray(x)))
    want = np.zeros((2, 3, 3, 3))
    for n in range(2):
        for i in range(3):
            for j in range(3):
                want[n, i, j] = (x[n, i:i + 2, j:j + 2] * z).sum(axis=(0, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depthwise_xcorr_pallas_matches_xla():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(6, 6, 256).astype(np.float32))
    x = jnp.asarray(rng.randn(3, 22, 22, 256).astype(np.float32))
    # interpret mode on CPU; compiled on TPU
    try:
        got = depthwise_xcorr_pallas(z, x)
    except Exception:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            got = depthwise_xcorr_pallas(z, x)
    want = depthwise_xcorr(z, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


def test_siamfc_model_shapes():
    model = SiamFC()
    z = jnp.zeros((1, 127, 127, 3))
    x = jnp.zeros((1, 255, 255, 3))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    zf = jax.jit(lambda p, a: model.apply(p, a, method=SiamFC.embed))(params, z)
    assert zf.shape == (1, 6, 6, 256)
    xf = jax.jit(lambda p, a: model.apply(p, a, method=SiamFC.embed))(params, x)
    assert xf.shape == (1, 22, 22, 256)
    score = jax.jit(lambda p, a, b: model.apply(p, a, b))(params, z, x)
    assert score.shape == (1, 17, 17)


def test_siamfc_tracker_end_to_end():
    model = SiamFC()
    z = jnp.zeros((1, 127, 127, 6))
    x = jnp.zeros((1, 255, 255, 6))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=4, height=160, width=200)
    rt = SiamFCRuntime()
    assert rt.response_sz == 17 and rt.upsampled_sz == 272
    tracker = SiamFCTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    for t in range(1, 4):
        out = tracker.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
