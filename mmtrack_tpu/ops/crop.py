"""Target-centered square crop + resize — the per-frame preprocessing kernel.

The reference does this on host per frame with cv2 (sample_target,
ViPT/lib/train/data/processing_utils.py:14-81): integer crop around the box,
constant-pad, then bilinear resize. Here the same map is expressed as ONE
bilinear gather directly from the full frame with traced crop geometry, so it
jits, vmaps over sequences, and fuses with normalization — the frame never
makes an extra host round-trip and there is no dynamic intermediate shape.

A host numpy/cv2 twin (`sample_target_np`) reproduces the reference
bit-for-bit for parity evaluation and testing.
"""

from __future__ import annotations

import math
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def crop_resize(image: jnp.ndarray, box_xywh: jnp.ndarray, search_area_factor: float,
                out_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Square crop of area factor^2 x box area, resized to (out_size, out_size).

    Args:
      image: (H, W, C) float or uint frame (static H, W).
      box_xywh: (4,) traced box.
      search_area_factor: static float (2.0 template / 4.0-5.0 search).
      out_size: static int.

    Returns:
      (crop (out_size, out_size, C) float32, resize_factor () = out/crop_sz).

    Geometry matches sample_target (processing_utils.py:32-41): crop side
    ceil(sqrt(w*h)*factor), origin round(center - side/2); out-of-image area
    is zero (BORDER_CONSTANT); sampling uses cv2's half-pixel convention with
    edge clamping inside the crop.
    """
    H, W = image.shape[0], image.shape[1]
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]

    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    crop_sz = jnp.maximum(crop_sz, 1.0)
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5)
    resize_factor = out_size / crop_sz

    # source coordinate in crop space for each output pixel (cv2 convention)
    s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (crop_sz / out_size) - 0.5
    s = jnp.clip(s, 0.0, crop_sz - 1.0)

    xs = x1 + s  # (out,) image-space coords
    ys = y1 + s

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[None, :, None]  # (1, out, 1)
    fy = (ys - y0)[:, None, None]  # (out, 1, 1)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    img = image.astype(jnp.float32)

    def tap(yi, xi):
        # NB: the reference pads with x2_pad = max(x2 - W + 1, 0)
        # (processing_utils.py:44-47), so image row H-1 / column W-1 is never
        # sampled — it is always replaced by constant padding. Reproduce that.
        valid = ((yi >= 0) & (yi < H - 1))[:, None, None] & ((xi >= 0) & (xi < W - 1))[None, :, None]
        v = img[jnp.clip(yi, 0, H - 1)][:, jnp.clip(xi, 0, W - 1)]  # (out, out, C)
        return jnp.where(valid, v, 0.0)

    p00 = tap(y0, x0)
    p01 = tap(y0, x0 + 1)
    p10 = tap(y0 + 1, x0)
    p11 = tap(y0 + 1, x0 + 1)

    out = ((1 - fy) * (1 - fx) * p00 + (1 - fy) * fx * p01
           + fy * (1 - fx) * p10 + fy * fx * p11)
    return out, resize_factor


def _axis_weights(coords: jnp.ndarray, size: int, drop_last: bool) -> jnp.ndarray:
    """Bilinear resampling weights as a dense matrix row per output pixel:
    W[o, p] = hat(coords[o] - p), zero outside the image (and at the last
    row/col, matching the reference border convention)."""
    p = jnp.arange(size, dtype=jnp.float32)[None, :]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - p))
    if drop_last:
        w = w.at[:, size - 1].set(0.0)
    return w


def crop_resize_mxu(image: jnp.ndarray, box_xywh: jnp.ndarray,
                    search_area_factor: float, out_size: int
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """crop_resize expressed as two dense matmuls (MXU path).

    The separable bilinear resample is W_y @ image @ W_x^T with closed-form
    hat-function weights; on TPU the two (out, H) x (H, W*C) contractions run
    on the systolic array instead of issuing gathers. Identical output to
    crop_resize (same geometry, same border convention).
    """
    H, W = image.shape[0], image.shape[1]
    C = image.shape[2]
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * search_area_factor), 1.0)
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5)
    resize_factor = out_size / crop_sz

    s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (crop_sz / out_size) - 0.5
    s = jnp.clip(s, 0.0, crop_sz - 1.0)
    wy = _axis_weights(y1 + s, H, drop_last=True)   # (out, H)
    wx = _axis_weights(x1 + s, W, drop_last=True)   # (out, W)

    # fp32 MXU precision: default TPU matmul precision is bf16 inputs, which
    # costs ~0.5% per pixel on 0..255 data — too much for crop parity
    img = image.astype(jnp.float32).reshape(H, W * C)
    tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (out, W*C)
    tmp = tmp.reshape(out_size, W, C)
    out = jnp.einsum("owc,pw->opc", tmp, wx,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out, resize_factor


def crop_resize_normalized(image: jnp.ndarray, box_xywh: jnp.ndarray,
                           search_area_factor: float, out_size: int,
                           mean: jnp.ndarray, std: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """crop_resize fused with (x/255 - mean) / std channel normalization.

    Replaces sample_target + PreprocessorMM
    (ViPT/lib/test/tracker/data_utils.py:15-24) as a single device op; XLA
    fuses the normalization into the gather epilogue.

    MMTRACK_CROP selects the lowering (read at trace time; all three share
    the exact crop geometry and border convention):
      gather — 4-tap bilinear gather, bit-parity with the host cv2 twin
        (tests/test_crop.py); the default off-TPU (parity/eval on CPU);
      mxu — separable hat-weight contractions on the MXU
        (crop_resize_mxu); agrees with gather to f32 summation order
        (≤5e-6 at 64px). The TPU default: gather's dynamic 4-tap loads
        lower badly on this backend (~3.2 ms of the 11.8 ms full
        device-resident tracking step at B=16); the separable form cut
        the step to 8.61 ms / 1858 fps (tools/ab_kernels.py crop,
        on-hardware best-of-3, docs/PERF.md round 4);
      pallas — the fused ops/pallas_preproc.py kernel (per-channel MXU
        contractions, normalize in-epilogue), ~1e-6 of the gather path.
        Single-image only: under vmap its scalar-prefetch box operand
        becomes a (B, 3) smem block Mosaic rejects — batched serving
        uses mxu, where XLA fuses the normalize epilogue itself.
    """
    default = ("mxu" if jax.default_backend() in ("tpu", "axon")
               else "gather")
    impl = os.environ.get("MMTRACK_CROP", default)
    if impl == "pallas":
        from mmtrack_tpu.ops.pallas_preproc import crop_resize_normalize_pallas
        return crop_resize_normalize_pallas(
            image, box_xywh, search_area_factor, out_size, mean, std)
    fn = crop_resize_mxu if impl == "mxu" else crop_resize
    crop, rf = fn(image, box_xywh, search_area_factor, out_size)
    return (crop / 255.0 - mean) / std, rf


def crop_at(image: jnp.ndarray, center_yx: jnp.ndarray, crop_sz,
            out_size: int, border: str = "replicate",
            origin_yx=None) -> jnp.ndarray:
    """Square crop of (traced) side `crop_sz` centered at `center_yx`,
    resized to out_size — the DiMP-family sample extraction
    (sample_patch, RGBD/models/DeT/pytracking/features/preprocessing.py with
    mode='replicate'). Same one-gather formulation as crop_resize.

    When `origin_yx` is given it is used as the exact integer top-left of
    the crop (the reference's tl = pos.long() - (szl-1)//2 split) and
    `crop_sz` must already be the rounded integer side; `center_yx` is
    ignored. Without it, the origin falls back to round(center - side/2).

    Returns (out_size, out_size, C) float32.
    """
    H, W = image.shape[0], image.shape[1]
    if origin_yx is None:
        crop_sz = jnp.maximum(jnp.round(crop_sz), 2.0)
        y1 = jnp.round(center_yx[0] - 0.5 * crop_sz)
        x1 = jnp.round(center_yx[1] - 0.5 * crop_sz)
    else:
        crop_sz = jnp.asarray(crop_sz, jnp.float32)
        y1, x1 = origin_yx[0], origin_yx[1]

    s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (crop_sz / out_size) - 0.5
    s = jnp.clip(s, 0.0, crop_sz - 1.0)
    ys, xs = y1 + s, x1 + s

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    img = image.astype(jnp.float32)

    def tap(yi, xi):
        if border == "replicate":
            return img[jnp.clip(yi, 0, H - 1)][:, jnp.clip(xi, 0, W - 1)]
        valid = ((yi >= 0) & (yi < H))[:, None, None] & ((xi >= 0) & (xi < W))[None, :, None]
        v = img[jnp.clip(yi, 0, H - 1)][:, jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid, v, 0.0)

    return ((1 - fy) * (1 - fx) * tap(y0, x0) + (1 - fy) * fx * tap(y0, x0 + 1)
            + fy * (1 - fx) * tap(y0 + 1, x0) + fy * fx * tap(y0 + 1, x0 + 1))


def crop_att_mask(box_xywh: jnp.ndarray, search_area_factor: float,
                  out_size: int, H: int, W: int) -> jnp.ndarray:
    """Attention mask for crop_resize's geometry, traced: True where the
    output pixel's bilinear footprint touches constant padding — the
    in-jit analog of sample_target's att_mask (a {0,1} float image resized
    by cv2 bilinear then cast to bool, so ANY positively-weighted padded
    tap marks the pixel; SPT processing_utils.py:55-69). The valid region
    is a rectangle, so the mask is the separable OR of per-axis masks.

    Returns (out_size, out_size) bool.
    """
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * search_area_factor), 1.0)
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5)
    x1_pad = jnp.maximum(-x1, 0.0)
    x2_pad = jnp.maximum(x1 + crop_sz - W + 1, 0.0)
    y1_pad = jnp.maximum(-y1, 0.0)
    y2_pad = jnp.maximum(y1 + crop_sz - H + 1, 0.0)

    s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) \
        * (crop_sz / out_size) - 0.5
    lo = jnp.floor(s)
    frac = s - lo
    t0 = jnp.clip(lo, 0.0, crop_sz - 1.0)
    t1 = jnp.clip(lo + 1.0, 0.0, crop_sz - 1.0)

    def axis_mask(p1, p2):
        def padded(t):
            return (t < p1) | (t >= crop_sz - p2)
        return (((1.0 - frac) > 0) & padded(t0)) | ((frac > 0) & padded(t1))

    my = axis_mask(y1_pad, y2_pad)
    mx = axis_mask(x1_pad, x2_pad)
    return my[:, None] | mx[None, :]


def sample_target_np(im: np.ndarray, target_bb, search_area_factor: float,
                     output_sz: int | None = None):
    """Host/cv2 twin of the reference sample_target (bit-parity path).

    Returns (crop, resize_factor, att_mask) exactly like
    ViPT/lib/train/data/processing_utils.py:14-81 (att_mask marks padded area).
    """
    x, y, w, h = [float(v) for v in target_bb]
    crop_sz = math.ceil(math.sqrt(w * h) * search_area_factor)
    if crop_sz < 1:
        raise ValueError("Too small bounding box.")

    x1 = round(x + 0.5 * w - crop_sz * 0.5)
    x2 = x1 + crop_sz
    y1 = round(y + 0.5 * h - crop_sz * 0.5)
    y2 = y1 + crop_sz

    x1_pad = max(0, -x1)
    x2_pad = max(x2 - im.shape[1] + 1, 0)
    y1_pad = max(0, -y1)
    y2_pad = max(y2 - im.shape[0] + 1, 0)

    im_crop = im[y1 + y1_pad:y2 - y2_pad, x1 + x1_pad:x2 - x2_pad, :]
    im_crop_padded = cv2.copyMakeBorder(im_crop, y1_pad, y2_pad, x1_pad, x2_pad,
                                        cv2.BORDER_CONSTANT)
    H, W = im_crop_padded.shape[:2]
    att_mask = np.ones((H, W))
    end_x = None if x2_pad == 0 else -x2_pad
    end_y = None if y2_pad == 0 else -y2_pad
    att_mask[y1_pad:end_y, x1_pad:end_x] = 0

    if output_sz is not None:
        resize_factor = output_sz / crop_sz
        im_crop_padded = cv2.resize(im_crop_padded, (output_sz, output_sz))
        att_mask = cv2.resize(att_mask, (output_sz, output_sz)).astype(np.bool_)
        return im_crop_padded, resize_factor, att_mask
    return im_crop_padded, 1.0, att_mask.astype(np.bool_)
