"""PrRoI pooling tests — including the reference's own acceptance test
(PrRoI == average pooling for integer-aligned RoIs,
PreciseRoIPooling/pytorch/tests/test_prroi_pooling2d.py:20-53) and gradient
checks that the CUDA version needed hand-written kernels for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.ops.prroi import prroi_pool, prroi_pool_single


def _brute_force(feat, roi, pooled, n=400):
    """Numerical integration of the bilinear surface (independent check)."""
    H, W, C = feat.shape
    x1, y1, x2, y2 = roi
    ph, pw = pooled
    out = np.zeros((ph, pw, C))
    for i in range(ph):
        for j in range(pw):
            u1 = x1 + j * (x2 - x1) / pw
            u2 = x1 + (j + 1) * (x2 - x1) / pw
            v1 = y1 + i * (y2 - y1) / ph
            v2 = y1 + (i + 1) * (y2 - y1) / ph
            xs = u1 + (np.arange(n) + 0.5) * (u2 - u1) / n  # midpoint rule
            ys = v1 + (np.arange(n) + 0.5) * (v2 - v1) / n
            acc = np.zeros(C)
            for y in ys:
                wy = np.clip(1 - np.abs(y - np.arange(H)), 0, None)
                row = (wy[:, None, None] * feat).sum(0)  # (W, C)
                wx = np.clip(1 - np.abs(xs[:, None] - np.arange(W)[None]), 0, None)
                acc += (wx @ row).sum(0)
            out[i, j] = acc / (n * n)
    return out


def test_prroi_matches_numerical_integral():
    rng = np.random.RandomState(0)
    feat = rng.randn(8, 10, 3).astype(np.float32)
    roi = (1.3, 2.1, 7.6, 6.9)
    got = np.asarray(prroi_pool_single(jnp.asarray(feat), jnp.asarray(roi), (2, 3)))
    want = _brute_force(feat, roi, (2, 3))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_prroi_equals_avg_pool_on_aligned_rois():
    # the reference unit test: integer-aligned RoI + matching pooled size
    # reduces PrRoI to exact average pooling
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 8, 8, 4).astype(np.float32)
    rois = jnp.asarray([[0, 0, 0, 4, 4], [0, 2, 2, 6, 6]], jnp.float32)
    out = np.asarray(prroi_pool(jnp.asarray(feat), rois, 2, 2))
    f = feat[0]
    # 2x2 bins over a 4x4 region: each bin is the exact integral of the
    # bilinear surface over a 2x2 window
    want0 = _brute_force(f, (0, 0, 4, 4), (2, 2))
    np.testing.assert_allclose(out[0], want0, rtol=1e-4, atol=1e-4)


def test_prroi_spatial_scale():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    # image coords 2x feature coords with scale .5
    a = prroi_pool(feat, jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]]), 3, 3, spatial_scale=0.5)
    b = prroi_pool(feat, jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]]), 3, 3, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prroi_zero_area_roi():
    feat = jnp.ones((1, 8, 8, 2))
    out = prroi_pool(feat, jnp.asarray([[0, 3.0, 3.0, 3.0, 5.0]]), 2, 2)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_prroi_differentiable_wrt_coords():
    """The CUDA version ships a dedicated coord-backward kernel; here jax.grad
    must give finite, correct gradients through the box coordinates."""
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(6, 6, 2).astype(np.float32))

    def f(roi):
        return prroi_pool_single(feat, roi, (3, 3)).sum()

    roi0 = jnp.asarray([1.2, 1.1, 4.8, 4.9])
    g = jax.grad(f)(roi0)
    assert np.isfinite(np.asarray(g)).all()
    # numerical check
    eps = 1e-3
    for k in range(4):
        dr = jnp.zeros(4).at[k].set(eps)
        num = (f(roi0 + dr) - f(roi0 - dr)) / (2 * eps)
        assert float(g[k]) == pytest.approx(float(num), rel=2e-2, abs=2e-3)


def test_prroi_differentiable_wrt_features():
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(6, 6, 2).astype(np.float32))
    roi = jnp.asarray([1.0, 1.0, 5.0, 5.0])
    g = jax.grad(lambda f: prroi_pool_single(f, roi, (2, 2)).sum())(feat)
    assert g.shape == feat.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
