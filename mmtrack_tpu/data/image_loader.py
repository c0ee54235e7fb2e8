"""Image loading with failsafe fallbacks.

Rebuild of ViPT/lib/train/data/image_loader.py: the reference prefers
jpeg4py (libjpeg-turbo) and falls back to cv2 on failure
(jpeg4py_loader_w_failsafe). jpeg4py is not in this image, so cv2 is the
primary decoder; the failsafe chain (cv2 -> PIL) keeps corrupt-file
tolerance.
"""

from __future__ import annotations

import cv2
import numpy as np


def opencv_loader(path: str) -> np.ndarray | None:
    """BGR file -> RGB ndarray (opencv_loader analog)."""
    try:
        im = cv2.imread(path, cv2.IMREAD_COLOR)
        if im is None:
            return None
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    except Exception:
        return None


def pil_loader(path: str) -> np.ndarray | None:
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    except Exception:
        return None


def native_jpeg_loader(path: str) -> np.ndarray | None:
    """libjpeg straight-to-RGB decode (native/imageio.cc) — skips cv2's
    BGR intermediate + cvtColor pass; the serving host has one core."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        from mmtrack_tpu.data.native_io import decode_jpeg_rgb

        return decode_jpeg_rgb(path)
    except Exception:
        return None


def default_image_loader(path: str) -> np.ndarray:
    """native libjpeg, then cv2, then PIL failsafe
    (jpeg4py_loader_w_failsafe analog)."""
    for loader in (native_jpeg_loader, opencv_loader, pil_loader):
        im = loader(path)
        if im is not None:
            return im
    raise IOError(f"could not read image {path}")


def grayscale_loader(path: str) -> np.ndarray:
    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im is None:
        raise IOError(f"could not read image {path}")
    return im
