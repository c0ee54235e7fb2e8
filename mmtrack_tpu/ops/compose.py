"""Device-side multi-modal frame composition.

The host pipeline (data/composition.py, a port of depth_utils.py:71-132)
decodes AND composes on CPU. On this box one CPU core feeds the chip, so
the colormap/normalize/merge work (≈6ms/frame at 640x480) is moved onto the
TPU: the host uploads raw decoded RGB (uint8) + depth (uint16) and the
device performs the DepthTrack clip (min(3*median, 10000)), min-max
normalization and JET colormap as a fused LUT gather. The JET table itself
is taken from cv2 at trace time so the quantized colors match the host
path (the model consumes these values; parity matters).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def jet_lut() -> np.ndarray:
    """cv2's 256-entry JET colormap as (256, 3) uint8, in cv2's own channel
    order — the host path (compose_x 'rgbcolormap', like the reference's
    get_rgbd_frame) appends applyColorMap output channels verbatim."""
    import cv2

    idx = np.arange(256, dtype=np.uint8).reshape(256, 1)
    return cv2.applyColorMap(idx, cv2.COLORMAP_JET).reshape(256, 3).copy()


def _kth_smallest_u16(flat: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """k-th smallest (1-indexed) of a uint16 array by 16-step binary search
    over the value range — a sort on TPU costs ~100x more than 16 masked
    reductions for 300k-element depth maps."""
    def body(_, lohij):
        lo, hi = lohij
        mid = (lo + hi) // 2
        cnt = jnp.sum((flat <= mid).astype(jnp.int32))
        take_left = cnt >= k
        return (jnp.where(take_left, lo, mid + 1),
                jnp.where(take_left, mid, hi))

    lo, hi = jax.lax.fori_loop(
        0, 17, body, (jnp.asarray(0, jnp.int32), jnp.asarray(65535, jnp.int32)))
    return hi


def _median_u16(depth: jnp.ndarray) -> jnp.ndarray:
    """Exact np.median for a uint16 map (average of the two central order
    statistics when the count is even)."""
    flat = depth.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    if n % 2:
        return _kth_smallest_u16(flat, (n + 1) // 2).astype(jnp.float32)
    a = _kth_smallest_u16(flat, n // 2)
    b = _kth_smallest_u16(flat, n // 2 + 1)
    return (a + b).astype(jnp.float32) / 2.0


def _two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b) plus the exact rounding error."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Veltkamp split of an f32 into 12-bit high / low halves (exact)."""
    c = jnp.float32(4097.0) * a  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _ds_mul(a_hi, a_lo, b):
    """Double-single * f32 -> double-single (b's products made exact via
    splitting)."""
    b_hi, b_lo = _split(b)
    ah_hi, ah_lo = _split(a_hi)
    p = a_hi * b
    # exact error of a_hi*b via 4 exact partial products
    e = ((ah_hi * b_hi - p) + ah_hi * b_lo + ah_lo * b_hi) + ah_lo * b_lo
    return p, e + a_lo * b


def _cv2_minmax_index(d, lo, hi):
    """cv2.normalize(NORM_MINMAX to [0,255]) on TPU, bit-exact vs cv2 5.0.

    cv2 computes scale = 255*(1/(mx-mn)) and shift = -mn*scale in DOUBLE,
    casts both to f32, and the per-element kernel is a single-rounded f32
    FMA v*scale+shift followed by cvRound (half-even). TPUs have no f64
    and no guaranteed f32 FMA, so the double constants are emulated in
    double-single (hi, lo) arithmetic and the per-pixel FMA as four exact
    partial products recombined with TwoSum. A degenerate (constant) map
    gets scale = 0 like cv2's DBL_EPSILON guard."""
    D = hi - lo  # exact: integer-valued f32s <= 65535
    Ds = jnp.maximum(D, 1.0)
    # double-single 1/D via one Newton step (error term computed exactly)
    r = 1.0 / Ds
    r_hi, r_lo = _split(r)
    d_hi, d_lo = _split(Ds)
    prod_err = ((r_hi * d_hi - 1.0) + r_hi * d_lo + r_lo * d_hi) + r_lo * d_lo
    inv_hi, inv_lo = r, -r * prod_err
    s_hi, s_lo = _ds_mul(inv_hi, inv_lo, jnp.float32(255.0))
    a = jnp.where(D > 0, s_hi + s_lo, 0.0)  # f32(double scale)
    sh_hi, sh_lo = _ds_mul(s_hi, s_lo, lo)
    b = jnp.where(D > 0, -(sh_hi + sh_lo), 0.0)  # f32(double shift)
    # per-pixel exact FMA: v (16-bit) split into 8-bit halves, scale into
    # 12-bit halves -> all four products exact in f32
    a_hi, a_lo = _split(a)
    v1 = jnp.floor(d * (1.0 / 256.0)) * 256.0
    v0 = d - v1
    p1, p2 = v1 * a_hi, v1 * a_lo
    p3, p4 = v0 * a_hi, v0 * a_lo
    h, e1 = _two_sum(p1, b)
    h, e2 = _two_sum(h, p3)
    h, e3 = _two_sum(h, p2)
    h, e4 = _two_sum(h, p4)
    r = h + (((e1 + e2) + e3) + e4)
    return jnp.clip(jnp.round(r), 0, 255).astype(jnp.int32)


def compose_rgbcolormap_device(rgb_u8: jnp.ndarray, depth_u16: jnp.ndarray,
                               lut_rgb: jnp.ndarray,
                               depth_clip: bool = True) -> jnp.ndarray:
    """(..., H, W, 3) uint8 + (..., H, W) uint16 -> (..., H, W, 6) uint8.

    Matches compose_x(..., 'rgbcolormap', x_clip=depth_clip): clip at
    min(3*median, 10000), NORM_MINMAX to [0,255] with round-half-even
    (cvRound), JET LUT.
    """
    def one(rgb, depth):
        d = depth.astype(jnp.float32)
        if depth_clip:
            med = _median_u16(depth)
            mx = jnp.minimum(med * 3.0, 10000.0)
            # numpy semantics (composition.py: xmap[xmap > mx] = mx on a
            # uint16 array): clipped pixels take the TRUNCATED clip value —
            # the median of an even-count map can be x.5.
            d = jnp.where(d > mx, jnp.trunc(mx), d)
        lo = d.min()
        hi = d.max()
        idx = _cv2_minmax_index(d, lo, hi)
        cm = lut_rgb[idx]  # (H, W, 3) uint8
        return jnp.concatenate([rgb, cm], axis=-1)

    batch_dims = rgb_u8.ndim - 3
    f = one
    for _ in range(batch_dims):
        f = jax.vmap(f)
    return f(rgb_u8, depth_u16)


def compose_rgb_index_device(rgb_u8: jnp.ndarray, idx_u8: jnp.ndarray,
                             lut_rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) uint8 RGB + (..., H, W) uint8 JET index -> (..., H, W, 6).

    The streaming split of 'rgbcolormap': the host computes the 1-byte LUT
    index plane (data/composition.py::depth_index_u8 — the only part that
    needs the full uint16 depth), the device gathers the 3-byte colormap.
    Bit-identical to compose_x(..., 'rgbcolormap') at 4/6 the upload bytes.
    """
    cm = lut_rgb[idx_u8.astype(jnp.int32)]
    return jnp.concatenate([rgb_u8, cm], axis=-1)


def _upsample2x_triangular(c: jnp.ndarray) -> jnp.ndarray:
    """2x2 chroma upsample with libjpeg's 'fancy' triangular filter
    (separable 3:1 blend toward the nearer neighbour), float arithmetic."""
    c = c.astype(jnp.float32)
    left = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
    right = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
    h0 = (3.0 * c + left) * 0.25
    h1 = (3.0 * c + right) * 0.25
    h = jnp.stack([h0, h1], axis=-1).reshape(c.shape[0], -1)
    up = jnp.concatenate([h[:1], h[:-1]], axis=0)
    dn = jnp.concatenate([h[1:], h[-1:]], axis=0)
    v0 = (3.0 * h + up) * 0.25
    v1 = (3.0 * h + dn) * 0.25
    return jnp.stack([v0, v1], axis=1).reshape(-1, h.shape[1])


def yuv420_to_rgb_device(y: jnp.ndarray, cb: jnp.ndarray,
                         cr: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) Y + (..., H/2, W/2) Cb/Cr raw JPEG planes -> RGB uint8.

    The 2.5-byte/px serving path: the host ships the decoder's raw 4:2:0
    planes (native/imageio.cc::mmt_decode_jpeg_yuv420) and the chroma
    upsample + BT.601 conversion run on device. Decode-grade accurate
    (within a couple of LSB of libjpeg's own RGB output — JPEG is lossy;
    NOT the bit-exact path, which ships RGB at 3 B/px)."""
    def one(y, cb, cr):
        cbu = _upsample2x_triangular(cb) - 128.0
        cru = _upsample2x_triangular(cr) - 128.0
        yf = y.astype(jnp.float32)
        r = yf + 1.402 * cru
        g = yf - 0.344136286 * cbu - 0.714136286 * cru
        b = yf + 1.772 * cbu
        rgb = jnp.stack([r, g, b], axis=-1)
        return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)

    f = one
    for _ in range(y.ndim - 2):
        f = jax.vmap(f)
    return f(y, cb, cr)


def compose_yuv_index_device(y: jnp.ndarray, cb: jnp.ndarray,
                             cr: jnp.ndarray, idx_u8: jnp.ndarray,
                             lut_rgb: jnp.ndarray) -> jnp.ndarray:
    """Raw 4:2:0 planes + JET index -> (..., H, W, 6) rgbcolormap frame.
    The minimum-byte streaming compose (2.5 B/px on the wire)."""
    rgb = yuv420_to_rgb_device(y, cb, cr)
    cm = lut_rgb[idx_u8.astype(jnp.int32)]
    return jnp.concatenate([rgb, cm], axis=-1)
