"""ctypes bindings for the native image pipeline (native/imageio.cc).

One host core feeds the TPU chip in this deployment, so the per-frame host
work — JPEG decode, 16-bit PNG depth decode, depth->JET-index reduction —
is fused into single C passes that write straight into the caller's
staging slices (no BGR intermediate, no cvtColor pass, no temporary
arrays). ctypes releases the GIL for the call, so a decode thread overlaps
the main thread's dispatch work even on one core.

Every entry point falls back to the cv2/numpy path
(data/composition.py) with bit-identical output when the shared library
or toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_SO_PATH = os.path.join(_NATIVE_DIR, "libimageio.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "imageio.cc")

_lib = None
_lib_tried = False

_U8P = ctypes.POINTER(ctypes.c_ubyte)
_U16P = ctypes.POINTER(ctypes.c_ushort)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH,
             "-ljpeg", "-lpng"],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def load_imageio_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.mmt_decode_jpeg_rgb.restype = ctypes.c_int
    lib.mmt_decode_jpeg_rgb.argtypes = [
        _U8P, ctypes.c_long, _U8P, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.mmt_decode_png_u16.restype = ctypes.c_int
    lib.mmt_decode_png_u16.argtypes = [
        _U8P, ctypes.c_long, _U16P, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.mmt_depth_index_u8.restype = None
    lib.mmt_depth_index_u8.argtypes = [_U16P, ctypes.c_long, ctypes.c_int,
                                       _U8P]
    lib.mmt_decode_pair_rgb_index.restype = ctypes.c_int
    lib.mmt_decode_pair_rgb_index.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, _U8P, _U8P,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(_U8P)


def decode_pair_rgb_index(jpeg_path: str, png_path: str,
                          rgb_out: np.ndarray, idx_out: np.ndarray,
                          clip: bool = True) -> None:
    """Decode a color JPEG + 16-bit depth PNG frame pair into caller
    buffers: rgb_out (H, W, 3) uint8 RGB, idx_out (H, W) uint8 JET LUT
    index (depth_index_u8 semantics). Buffers must be C-contiguous slices
    of exactly the frame shape."""
    assert rgb_out.flags.c_contiguous and idx_out.flags.c_contiguous
    H, W = idx_out.shape
    lib = load_imageio_lib()
    if lib is not None:
        rc = lib.mmt_decode_pair_rgb_index(
            jpeg_path.encode(), png_path.encode(),
            _as_u8p(rgb_out), _as_u8p(idx_out), H, W, int(clip))
        if rc == 0:
            return
        # fall through on any decode/shape error (cv2 handles exotic files)
    import cv2

    from mmtrack_tpu.data.composition import depth_index_u8

    im = cv2.imread(jpeg_path)
    if im is None:
        raise IOError(f"could not read color frame {jpeg_path}")
    rgb_out[...] = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    d = cv2.imread(png_path, -1)
    if d is None:
        raise IOError(f"could not read depth frame {png_path}")
    idx_out[...] = depth_index_u8(np.asarray(d, np.uint16), x_clip=clip)


_jpeg_scratch: np.ndarray | None = None
_jpeg_scratch_lock = __import__("threading").Lock()
_png_scratch: np.ndarray | None = None
_png_scratch_lock = __import__("threading").Lock()


def decode_jpeg_rgb(path: str, out: np.ndarray | None = None,
                    max_hw: tuple[int, int] = (4096, 4096)) -> np.ndarray | None:
    """Decode a JPEG file to an (H, W, 3) uint8 RGB array. Returns None on
    failure (callers chain to the cv2/PIL failsafe, image_loader.py).
    Without `out`, decodes into a persistent module scratch and returns an
    exact-size copy (so callers never hold the big scratch alive)."""
    lib = load_imageio_lib()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            buf = np.frombuffer(f.read(), np.uint8)
    except OSError:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if out is not None:
        rc = lib.mmt_decode_jpeg_rgb(_as_u8p(buf), len(buf), _as_u8p(out),
                                     out.shape[0], out.shape[1],
                                     ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return None
        flat = out.reshape(-1)[:h.value * w.value * 3]
        return flat.reshape(h.value, w.value, 3)
    global _jpeg_scratch
    with _jpeg_scratch_lock:
        if _jpeg_scratch is None:
            _jpeg_scratch = np.empty((max_hw[0], max_hw[1], 3), np.uint8)
        scratch = _jpeg_scratch
        rc = lib.mmt_decode_jpeg_rgb(_as_u8p(buf), len(buf), _as_u8p(scratch),
                                     scratch.shape[0], scratch.shape[1],
                                     ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return None
        flat = scratch.reshape(-1)[:h.value * w.value * 3]
        return flat.reshape(h.value, w.value, 3).copy()


def decode_png_u16(path: str,
                   max_hw: tuple[int, int] = (4096, 4096)) -> np.ndarray | None:
    """Decode a grayscale PNG to (H, W) uint16. Returns None on failure."""
    lib = load_imageio_lib()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            buf = np.frombuffer(f.read(), np.uint8)
    except OSError:
        return None
    # persistent scratch (same pattern as _jpeg_scratch): a fresh 32 MB
    # staging buffer per call is exactly the frame-sized-allocation mmap
    # churn utils/hostmem.py flags as pathological on this 1-core host
    global _png_scratch
    h = ctypes.c_int()
    w = ctypes.c_int()
    with _png_scratch_lock:
        if _png_scratch is None or _png_scratch.shape[0] < max_hw[0] \
                or _png_scratch.shape[1] < max_hw[1]:
            _png_scratch = np.empty(max_hw, np.uint16)
        out = _png_scratch
        rc = lib.mmt_decode_png_u16(
            _as_u8p(buf), len(buf), out.ctypes.data_as(_U16P),
            out.shape[0], out.shape[1], ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return None
        flat = out.reshape(-1)[:h.value * w.value]
        return flat.reshape(h.value, w.value).copy()


def depth_index_u8_native(depth: np.ndarray, clip: bool = True,
                          out: np.ndarray | None = None) -> np.ndarray:
    """Native depth_index_u8; falls back to the numpy/cv2 implementation."""
    lib = load_imageio_lib()
    if out is None:
        out = np.empty(depth.shape, np.uint8)
    if lib is None:
        from mmtrack_tpu.data.composition import depth_index_u8

        out[...] = depth_index_u8(depth, x_clip=clip)
        return out
    d = np.ascontiguousarray(depth, np.uint16)
    lib.mmt_depth_index_u8(d.ctypes.data_as(_U16P), d.size, int(clip),
                           _as_u8p(out))
    return out


def bind_yuv(lib) -> None:
    if hasattr(lib, "_yuv_bound"):
        return
    lib.mmt_decode_pair_yuv_index.restype = ctypes.c_int
    lib.mmt_decode_pair_yuv_index.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, _U8P, _U8P, _U8P, _U8P,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib._yuv_bound = True


def decode_pair_yuv_index(jpeg_path: str, png_path: str,
                          y_out: np.ndarray, cb_out: np.ndarray,
                          cr_out: np.ndarray, idx_out: np.ndarray,
                          clip: bool = True) -> bool:
    """Minimum-byte streaming decode (2.5 B/px on the wire): raw 4:2:0
    YCbCr planes + JET index plane, for ops/compose.py::
    compose_yuv_index_device. Requires a plain 4:2:0 JPEG with H, W
    multiples of 16. Returns False when this source does not qualify —
    callers fall back to decode_pair_rgb_index (bit-exact path)."""
    lib = load_imageio_lib()
    if lib is None:
        return False
    bind_yuv(lib)
    H, W = y_out.shape
    assert cb_out.shape == (H // 2, W // 2) and idx_out.shape == (H, W)
    rc = lib.mmt_decode_pair_yuv_index(
        jpeg_path.encode(), png_path.encode(), _as_u8p(y_out),
        _as_u8p(cb_out), _as_u8p(cr_out), _as_u8p(idx_out), H, W, int(clip))
    return rc == 0
