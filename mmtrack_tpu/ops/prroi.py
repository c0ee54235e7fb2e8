"""Precise RoI Pooling (PrRoI) — exact integral of the bilinearly-interpolated
feature over each pooling bin.

The reference vendors a 443-line CUDA kernel 6x
(RGBD/models/DeT/ltr/external/PreciseRoIPooling/pytorch/prroi_pool/src/
prroi_pooling_gpu_impl.cu) with hand-written backward passes including
d/d-coordinates. TPU-native, the integral is SEPARABLE: with the bilinear
basis hat(t) = max(0, 1-|t|),

    avg over bin = (1/area) * sum_p f[py, px] * Wy(py) * Wx(px),
    Wx(p) = integral of hat(x - p) over [u1, u2]  (closed form, C1 in u1/u2),

so the whole op is two small weight matrices contracted with the feature map
(einsum -> MXU), and jax.grad provides ALL backward passes (features and
coordinates) automatically — no custom VJP, no hand-written kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hat_integral_cdf(t: jnp.ndarray) -> jnp.ndarray:
    """H(t) = int_{-inf}^{t} max(0, 1-|s|) ds; piecewise, C1, H(inf)=1."""
    t = jnp.clip(t, -1.0, 1.0)
    neg = 0.5 * (t + 1.0) ** 2
    pos = 1.0 - 0.5 * (1.0 - t) ** 2
    return jnp.where(t <= 0.0, neg, pos)


def _axis_weights(lo: jnp.ndarray, hi: jnp.ndarray, size: int) -> jnp.ndarray:
    """Integral of each pixel's hat basis over [lo, hi] per bin.

    lo/hi: (P,) bin bounds in feature coords. Returns (P, size).
    Pixels outside the feature extent contribute zero (the CUDA kernel sums
    valid indices only)."""
    p = jnp.arange(size, dtype=jnp.float32)[None, :]
    return _hat_integral_cdf(hi[:, None] - p) - _hat_integral_cdf(lo[:, None] - p)


def prroi_pool_single(feat: jnp.ndarray, roi_xyxy: jnp.ndarray,
                      pooled: tuple[int, int],
                      spatial_scale: float = 1.0) -> jnp.ndarray:
    """PrRoI-pool one RoI from one feature map.

    feat: (H, W, C); roi_xyxy: (4,) in image coords (scaled by spatial_scale
    like PrRoIPool2D(h, w, scale)); pooled: (Ph, Pw) static.
    Returns (Ph, Pw, C). Empty bins (zero area) return 0 like the reference.
    """
    H, W = feat.shape[0], feat.shape[1]
    ph, pw = pooled
    x1, y1, x2, y2 = [roi_xyxy[i] * spatial_scale for i in range(4)]

    # the CUDA reference clamps roi_width/height to max(., 0) BEFORE
    # binning (prroi_pooling_gpu_impl.cu:176-177): a doubly-inverted RoI
    # would otherwise have positive area and pool garbage instead of 0
    bin_w = jnp.maximum(x2 - x1, 0.0) / pw
    bin_h = jnp.maximum(y2 - y1, 0.0) / ph
    jx = jnp.arange(pw, dtype=jnp.float32)
    iy = jnp.arange(ph, dtype=jnp.float32)
    u1 = x1 + jx * bin_w
    u2 = u1 + bin_w
    v1 = y1 + iy * bin_h
    v2 = v1 + bin_h

    wx = _axis_weights(u1, u2, W)  # (Pw, W)
    wy = _axis_weights(v1, v2, H)  # (Ph, H)

    acc = jnp.einsum("ph,qw,hwc->pqc", wy, wx, feat.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    area = bin_w * bin_h
    out = acc / jnp.maximum(area, 1e-12)
    return jnp.where(area > 0, out, 0.0)


def prroi_pool(feat: jnp.ndarray, rois: jnp.ndarray, pooled_h: int,
               pooled_w: int, spatial_scale: float = 1.0) -> jnp.ndarray:
    """Batched PrRoI pooling with the reference's RoI convention.

    feat: (B, H, W, C); rois: (N, 5) rows [batch_index, x1, y1, x2, y2] in
    image coordinates (prroi_pool2d API, functional.py:21-38).
    Returns (N, Ph, Pw, C).
    """
    batch_idx = rois[:, 0].astype(jnp.int32)
    boxes = rois[:, 1:5]

    def one(b, box):
        return prroi_pool_single(feat[b], box, (pooled_h, pooled_w), spatial_scale)

    return jax.vmap(one)(batch_idx, boxes)
