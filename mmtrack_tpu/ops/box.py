"""Bounding-box algebra (pure jnp; every function maps over leading dims).

Box conventions:
  xywh   = (x_left, y_top, w, h)        -- dataset/result-file format
  cxcywh = (cx, cy, w, h)               -- model head format
  xyxy   = (x1, y1, x2, y2)             -- IoU computations

Rebuilds ViPT/lib/utils/box_ops.py semantics (giou, clipping) and the crop
coordinate remap of ViPT/lib/train/data/processing_utils.py:86-109.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def box_xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def box_xywh_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + 0.5 * w, y + 0.5 * h, w, h], axis=-1)


def box_cxcywh_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, w, h], axis=-1)


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def box_area_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Elementwise IoU of xyxy boxes with matching leading dims.

    Returns (iou, union) like ViPT/lib/utils/box_ops.py box_iou.
    """
    area_a = box_area_xyxy(a)
    area_b = box_area_xyxy(b)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of xyxy boxes (DETR-style, as used by the ViPT loss)."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    enclosing = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-9)
    return iou - (enclosing - union) / enclosing


def clip_box(box: jnp.ndarray, img_h, img_w, margin: float = 0.0) -> jnp.ndarray:
    """Clip an xywh box to image bounds, keeping at least `margin` px inside.

    Same behavior as ViPT/lib/utils/box_ops.py clip_box used per frame by the
    tracker runtime (ViPT/lib/test/tracker/vipt.py:88); works on traced values.
    """
    x1, y1, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    x2, y2 = x1 + w, y1 + h
    x1 = jnp.clip(x1, 0.0, img_w - margin)
    x2 = jnp.clip(x2, margin, img_w)
    y1 = jnp.clip(y1, 0.0, img_h - margin)
    y2 = jnp.clip(y2, margin, img_h)
    w = jnp.maximum(x2 - x1, margin)
    h = jnp.maximum(y2 - y1, margin)
    return jnp.stack([x1, y1, w, h], axis=-1)


def transform_image_to_crop(box_in: jnp.ndarray, box_extract: jnp.ndarray,
                            resize_factor, crop_sz: float,
                            normalize: bool = False) -> jnp.ndarray:
    """Map an xywh box from image coords into crop coords.

    Mirrors ViPT/lib/train/data/processing_utils.py:86-109: the crop was
    extracted centered on `box_extract` and resized by `resize_factor`.
    """
    extract_center = box_extract[..., :2] + 0.5 * box_extract[..., 2:]
    in_center = box_in[..., :2] + 0.5 * box_in[..., 2:]
    out_center = (crop_sz - 1) / 2.0 + (in_center - extract_center) * resize_factor
    out_wh = box_in[..., 2:] * resize_factor
    out = jnp.concatenate([out_center - 0.5 * out_wh, out_wh], axis=-1)
    return out / crop_sz if normalize else out
