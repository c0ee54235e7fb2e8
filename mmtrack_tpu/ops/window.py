"""Window and label-map generation (pure functions, jit-friendly).

TPU-native rebuild of the reference's hann/gaussian label utilities
(ViPT/lib/test/utils/hann.py:6-16; RGBD/models/DeT/pytracking/libs/dcf.py).
All sizes are static Python ints so shapes stay compile-time constant.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def hann1d(sz: int, centered: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """1D cosine (Hann) window of length `sz`.

    Matches ViPT/lib/test/utils/hann.py:6-11: the centered variant is
    0.5*(1 - cos(2*pi*k/(sz+1))) for k = 1..sz; the uncentered variant puts
    the peak at index 0 (used for FFT-domain labels).
    """
    if centered:
        k = jnp.arange(1, sz + 1, dtype=dtype)
        return 0.5 * (1.0 - jnp.cos((2.0 * math.pi / (sz + 1)) * k))
    k = jnp.arange(0, sz // 2 + 1, dtype=dtype)
    w = 0.5 * (1.0 + jnp.cos((2.0 * math.pi / (sz + 2)) * k))
    return jnp.concatenate([w, w[1 : sz - sz // 2][::-1]])


def hann2d(sz_h: int, sz_w: int | None = None, centered: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """2D separable Hann window, shape (sz_h, sz_w).

    The reference multiplies this onto the center-score map as a motion
    prior at test time (ViPT/lib/test/tracker/vipt.py:30,79-80).
    """
    if sz_w is None:
        sz_w = sz_h
    wy = hann1d(sz_h, centered, dtype).reshape(-1, 1)
    wx = hann1d(sz_w, centered, dtype).reshape(1, -1)
    return wy * wx


def gauss_label_2d(sz_h: int, sz_w: int, sigma_h: float, sigma_w: float,
                   center_y=0.0, center_x=0.0, dtype=jnp.float32) -> jnp.ndarray:
    """Spatial Gaussian label map with origin at the window center.

    TPU equivalent of label_function_spatial
    (ViPT/lib/test/utils/hann.py:60-71) used by the DiMP family for
    classifier training labels; `center_*` may be traced scalars.
    """
    ky = jnp.arange(-(sz_h - 1) / 2.0, (sz_h + 1) / 2.0, dtype=dtype)
    kx = jnp.arange(-(sz_w - 1) / 2.0, (sz_w + 1) / 2.0, dtype=dtype)
    gy = jnp.exp(-1.0 / (2.0 * sigma_h**2) * (ky - center_y) ** 2)
    gx = jnp.exp(-1.0 / (2.0 * sigma_w**2) * (kx - center_x) ** 2)
    return gy.reshape(-1, 1) * gx.reshape(1, -1)
