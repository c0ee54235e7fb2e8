"""DiMP first-frame init augmentations as one static-shape batch.

Rebuild of RGBD/models/DeT/pytracking/features/augmentation.py +
generate_init_samples (pytracking/tracker/dimp/dimp.py:331-400) for TPU:
instead of a Python list of per-transform tensor ops, the expanded 2x crop
is transformed into a fixed (N, S, S, C) batch inside jit — slices for
identity/translation/flip, separable depthwise convs for blur, one fused
bilinear gather for each rotation. All shapes are compile-time static; the
random translation offsets (random_shift_factor) are traced scalars feeding
dynamic_slice starts and the target-box shifts, exactly like the reference's
`get_rand_shift`.

Default transform set = DeT_DiMP50_Max
(pytracking/parameter/dimp/DeT_DiMP50_Max.py:30-39): identity, 4 relative
shifts (+-0.6), horizontal flip, 3 anisotropic blurs, 4 rotations. The
feature-space dropout pair (dimp.py:546-549) is applied by the caller on
classification features.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

RELATIVE_SHIFTS = ((0.6, 0.6), (-0.6, 0.6), (0.6, -0.6), (-0.6, -0.6))
BLUR_SIGMAS = ((3.0, 1.0), (1.0, 3.0), (2.0, 2.0))
ROTATE_ANGLES = (10.0, -10.0, 45.0, -45.0)


def num_image_augmentations(fliplr: bool = True,
                            relative_shifts=RELATIVE_SHIFTS,
                            blur_sigmas=BLUR_SIGMAS,
                            rotate_angles=ROTATE_ANGLES) -> int:
    return 1 + len(relative_shifts) + int(fliplr) + len(blur_sigmas) + len(rotate_angles)


def _window(expanded: jnp.ndarray, out_sz: int, shift_yx) -> jnp.ndarray:
    """Centered out_sz window of the 2x-expanded patch, content moved by
    +shift (crop_to_output semantics, augmentation.py:20-36)."""
    base = out_sz // 2
    sy = jnp.asarray(shift_yx[0], jnp.int32)
    sx = jnp.asarray(shift_yx[1], jnp.int32)
    return jax.lax.dynamic_slice(
        expanded, (base - sy, base - sx, 0),
        (out_sz, out_sz, expanded.shape[-1]))


def _gauss_kernel(sigma: float) -> jnp.ndarray:
    fs = math.ceil(2 * sigma)
    x = jnp.arange(-fs, fs + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _blur(expanded: jnp.ndarray, sigma_yx) -> jnp.ndarray:
    """Separable gaussian blur, zero 'SAME' padding (augmentation.py:128-148;
    the zero-pad edge darkening sits 144px outside the crop window)."""
    C = expanded.shape[-1]
    x = expanded[None]
    for axis, sigma in enumerate(sigma_yx):
        k = _gauss_kernel(float(sigma))
        shape = (k.shape[0], 1) if axis == 0 else (1, k.shape[0])
        kern = k.reshape(shape + (1, 1)) * jnp.ones((1, 1, 1, C), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
    return x[0]


def _rotated_window(expanded: jnp.ndarray, out_sz: int, angle_deg: float,
                    shift_yx) -> jnp.ndarray:
    """Rotate the expanded patch about its center (replicate border) and take
    the shifted output window — fused into one bilinear gather over the
    window only (augmentation.py:111-126 rotates the full patch first)."""
    E = expanded.shape[0]
    base = out_sz // 2
    c = (E - 1) / 2.0
    theta = math.radians(angle_deg)
    cos, sin = math.cos(theta), math.sin(theta)

    i = jnp.arange(out_sz, dtype=jnp.float32)
    py = (base - shift_yx[0]) + i[:, None] - c  # window pixel, centered coords
    px = (base - shift_yx[1]) + i[None, :] - c
    # The reference builds the FORWARD map R = [[cos, sin], [-sin, cos]]
    # (augmentation.py:122-125) and cv2.warpAffine — without
    # WARP_INVERSE_MAP — inverts it internally, so the dst->src map we
    # must apply here is R^T: src = [[cos, -sin], [sin, cos]] @ dst.
    sy = sin * px + cos * py + c
    sx = cos * px - sin * py + c
    coords = jnp.stack([jnp.broadcast_to(sy, (out_sz, out_sz)),
                        jnp.broadcast_to(sx, (out_sz, out_sz))])
    interp = partial(jax.scipy.ndimage.map_coordinates, order=1, mode="nearest")
    return jax.vmap(lambda ch: interp(ch, coords), in_axes=2, out_axes=2)(expanded)


def dimp_init_augmentations(expanded: jnp.ndarray, out_sz: int, rng,
                            random_shift_factor: float = 1.0 / 3.0,
                            relative_shifts=RELATIVE_SHIFTS,
                            blur_sigmas=BLUR_SIGMAS,
                            rotate_angles=ROTATE_ANGLES,
                            fliplr: bool = True):
    """expanded (2*out_sz, 2*out_sz, C) -> (patches (N, out_sz, out_sz, C),
    shifts (N, 2) float32 (y, x) content shifts for target-box placement)."""
    n_rand = int(fliplr) + len(blur_sigmas) + len(rotate_angles)
    if random_shift_factor > 0 and n_rand:
        u = jax.random.uniform(rng, (n_rand, 2))
        rand_shifts = ((u - 0.5) * out_sz * random_shift_factor).astype(jnp.int32)
    else:
        rand_shifts = jnp.zeros((max(n_rand, 1), 2), jnp.int32)
    r = iter(range(n_rand))

    patches, shifts = [], []

    def add(patch, shift):
        patches.append(patch)
        shifts.append(jnp.asarray(shift, jnp.float32).reshape(2))

    zero = jnp.zeros((2,), jnp.int32)
    add(_window(expanded, out_sz, zero), zero)

    for rel in relative_shifts:
        t = jnp.asarray([int(rel[0] * out_sz / 2), int(rel[1] * out_sz / 2)],
                        jnp.int32)
        add(_window(expanded, out_sz, t), t)

    if fliplr:
        s = rand_shifts[next(r)]
        add(_window(jnp.flip(expanded, axis=1), out_sz, s), s)

    for sigma in blur_sigmas:
        s = rand_shifts[next(r)]
        add(_window(_blur(expanded, sigma), out_sz, s), s)

    for angle in rotate_angles:
        s = rand_shifts[next(r)]
        add(_rotated_window(expanded, out_sz, angle, s), s)

    return jnp.stack(patches), jnp.stack(shifts)


def feature_dropout(feat: jnp.ndarray, rng, num: int, prob: float) -> jnp.ndarray:
    """Channel dropout copies of one feature map (dimp.py:546-549,
    F.dropout2d): (S, S, C) -> (num, S, S, C), channels zeroed w.p. prob and
    survivors scaled by 1/(1-prob)."""
    keep = jax.random.bernoulli(rng, 1.0 - prob, (num, 1, 1, feat.shape[-1]))
    return feat[None] * keep.astype(feat.dtype) / (1.0 - prob)
