"""CenterNet-style Gaussian target heatmaps, fully vectorized for XLA.

Rebuild of ViPT/lib/utils/heapmap_utils.py:5-96. The reference draws each
Gaussian with a per-sample python loop and numpy ogrid slicing; here the map
is a single closed-form expression over a static (S, S) grid so a whole batch
compiles to one fused elementwise kernel (VPU-friendly, no host loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_radius(wh: jnp.ndarray, min_overlap: float = 0.7) -> jnp.ndarray:
    """CornerNet Gaussian radius for boxes of size wh[..., (w, h)].

    Matches CenterNetHeatMap.get_gaussian_radius
    (ViPT/lib/utils/heapmap_utils.py:40-68) including its known "bug version"
    quadratic roots, which the reference deliberately keeps for parity.
    """
    w, h = wh[..., 0], wh[..., 1]

    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1**2 - 4 * c1, 0.0))) / 2

    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2**2 - 4 * 4 * c2, 0.0))) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / (2 * a3)

    return jnp.minimum(r1, jnp.minimum(r2, r3))


def generate_heatmap(boxes_norm: jnp.ndarray, heatmap_size: int,
                     min_overlap: float = 0.7) -> jnp.ndarray:
    """GT score maps for normalized xywh boxes.

    Args:
      boxes_norm: (..., 4) xywh in [0, 1] (search-crop coordinates).
      heatmap_size: S = search_size // stride (static).

    Returns:
      (..., S, S) float32 maps: a Gaussian of sigma (2r+1)/6 centered at the
      rounded box center, truncated outside the radius box — identical math
      to CenterNetHeatMap.draw_gaussian (heapmap_utils.py:70-96) where the
      numpy ogrid window implicitly truncates at |dx|,|dy| <= r.
    """
    S = heatmap_size
    bbox = boxes_norm * S
    wh = bbox[..., 2:]
    centers = jnp.round(bbox[..., :2] + wh / 2.0)
    radius = gaussian_radius(wh, min_overlap)
    # reference: clamp_min(0) then truncate to int
    radius = jnp.maximum(radius, 0.0).astype(jnp.int32).astype(jnp.float32)

    ii = jnp.arange(S, dtype=jnp.float32).reshape(S, 1)   # rows = y
    jj = jnp.arange(S, dtype=jnp.float32).reshape(1, S)   # cols = x

    cx = centers[..., 0][..., None, None]
    cy = centers[..., 1][..., None, None]
    r = radius[..., None, None]
    sigma = (2.0 * r + 1.0) / 6.0

    dx = jj - cx
    dy = ii - cy
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    return jnp.where(inside, g, 0.0)
