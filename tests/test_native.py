"""Native region library tests (builds with g++ at first use)."""

import numpy as np
import pytest

from mmtrack_tpu.eval.metrics import iou_xywh
from mmtrack_tpu.native import batch_iou_xywh, load_region_lib, polygon_iou, polygon_to_xywh


def test_native_builds_and_loads():
    assert load_region_lib() is not None


def test_polygon_iou_known_values():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    # identical squares
    assert polygon_iou(sq, sq) == pytest.approx(1.0, abs=2e-3)
    # half-overlapping squares: inter 2, union 6
    sq2 = sq + [1.0, 0.0]
    assert polygon_iou(sq, sq2) == pytest.approx(1.0 / 3.0, abs=5e-3)
    # rotated square (45 deg, same center, side sqrt(2)*2): known IoU
    rot = np.array([[1, -1.0 + 1], [3 - 1, 1], [1, 3 - 1], [-1 + 1, 1]], float)
    v = polygon_iou(sq, rot)
    assert 0.4 < v < 0.6  # inscribed diamond: inter=2, union=4+2-2=4 -> 0.5
    assert v == pytest.approx(0.5, abs=5e-3)
    # disjoint
    assert polygon_iou(sq, sq + [10.0, 0.0]) == pytest.approx(0.0, abs=1e-6)


def test_batch_iou_matches_numpy():
    rng = np.random.RandomState(0)
    a = np.concatenate([rng.uniform(0, 50, (1000, 2)),
                        rng.uniform(5, 30, (1000, 2))], axis=1)
    b = np.concatenate([rng.uniform(0, 50, (1000, 2)),
                        rng.uniform(5, 30, (1000, 2))], axis=1)
    got = batch_iou_xywh(a, b)
    want = iou_xywh(a, b)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_polygon_to_xywh():
    poly = np.array([[3, 4], [9, 4], [9, 10], [3, 10]], float)
    np.testing.assert_allclose(polygon_to_xywh(poly), [3, 4, 6, 6])


class TestImageIO:
    """native/imageio.cc: fused decode + depth->JET-index host pipeline."""

    def test_builds_and_loads(self):
        from mmtrack_tpu.data.native_io import load_imageio_lib
        assert load_imageio_lib() is not None

    def test_depth_index_parity_fuzz(self):
        """Native index plane must equal the cv2/numpy host path bit-for-bit,
        including NORM_MINMAX .5 rounding ties (cv2 5.0 evaluates an f32 FMA
        per pixel) and fractional-median truncation on clip."""
        from mmtrack_tpu.data.composition import depth_index_u8
        from mmtrack_tpu.data.native_io import depth_index_u8_native

        rng = np.random.default_rng(11)
        for trial in range(60):
            n = int(rng.integers(16, 64))
            lo = int(rng.integers(0, 30000))
            hi = lo + int(rng.integers(1, 30000))
            d = rng.integers(lo, min(hi, 65535) + 1,
                             size=(n, n)).astype(np.uint16)
            for clip in (True, False):
                np.testing.assert_array_equal(
                    depth_index_u8(d, x_clip=clip),
                    depth_index_u8_native(d, clip=clip))
        # constant map -> all zeros (cv2's DBL_EPSILON guard)
        d = np.full((20, 20), 777, np.uint16)
        assert depth_index_u8_native(d, clip=True).max() == 0

    def test_decode_pair_matches_cv2(self, tmp_path):
        """JPEG+PNG pair decode into staging slices == imread path."""
        import cv2

        from mmtrack_tpu.data.composition import depth_index_u8
        from mmtrack_tpu.data.native_io import decode_pair_rgb_index

        rng = np.random.default_rng(5)
        frame = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        depth = rng.integers(500, 4000, (48, 64)).astype(np.uint16)
        jp = str(tmp_path / "f.jpg")
        pp = str(tmp_path / "d.png")
        cv2.imwrite(jp, frame[..., ::-1])
        cv2.imwrite(pp, depth)
        # staging chunk slices (non-owning views, C-contiguous)
        chunk_rgb = np.zeros((2, 48, 64, 3), np.uint8)
        chunk_idx = np.zeros((2, 48, 64), np.uint8)
        decode_pair_rgb_index(jp, pp, chunk_rgb[1], chunk_idx[1])
        ref_rgb = cv2.cvtColor(cv2.imread(jp), cv2.COLOR_BGR2RGB)
        ref_idx = depth_index_u8(cv2.imread(pp, -1), x_clip=True)
        np.testing.assert_array_equal(chunk_rgb[1], ref_rgb)
        np.testing.assert_array_equal(chunk_idx[1], ref_idx)
        assert chunk_rgb[0].max() == 0  # slice writes stay in-slice

    def test_decode_png_u16_roundtrip(self, tmp_path):
        import cv2

        from mmtrack_tpu.data.native_io import decode_png_u16

        rng = np.random.default_rng(9)
        depth = rng.integers(0, 65535, (33, 47)).astype(np.uint16)
        pp = str(tmp_path / "d.png")
        cv2.imwrite(pp, depth)
        out = decode_png_u16(pp)
        np.testing.assert_array_equal(out, depth)

    def test_yuv420_raw_decode_and_device_conversion(self, tmp_path):
        """The 2.5-byte/px serving path: raw 4:2:0 planes + device
        upsample/CSC must land within 1 LSB of cv2's own JPEG decode
        (JPEG is lossy; this path trades bit-exactness for 1.6x less
        wire traffic — the bit-exact rgb+index path remains default for
        eval). Non-qualifying sources must be refused."""
        import cv2
        import jax
        import jax.numpy as jnp

        from mmtrack_tpu.data.native_io import decode_pair_yuv_index
        from mmtrack_tpu.ops.compose import yuv420_to_rgb_device

        rng = np.random.default_rng(5)
        H, W = 48, 64  # multiples of 16
        # smooth-ish content so chroma subsampling is representative
        base = rng.integers(0, 255, (H // 8, W // 8, 3)).astype(np.uint8)
        frame = cv2.resize(base, (W, H), interpolation=cv2.INTER_LINEAR)
        depth = rng.integers(500, 4000, (H, W)).astype(np.uint16)
        jp, pp = str(tmp_path / "f.jpg"), str(tmp_path / "d.png")
        cv2.imwrite(jp, frame[..., ::-1])
        cv2.imwrite(pp, depth)

        y = np.zeros((H, W), np.uint8)
        cb = np.zeros((H // 2, W // 2), np.uint8)
        cr = np.zeros((H // 2, W // 2), np.uint8)
        idx = np.zeros((H, W), np.uint8)
        assert decode_pair_yuv_index(jp, pp, y, cb, cr, idx)

        rgb = np.asarray(jax.jit(yuv420_to_rgb_device)(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))
        ref = cv2.cvtColor(cv2.imread(jp), cv2.COLOR_BGR2RGB)
        assert np.abs(rgb.astype(int) - ref.astype(int)).max() <= 1

        from mmtrack_tpu.data.composition import depth_index_u8
        np.testing.assert_array_equal(
            idx, depth_index_u8(cv2.imread(pp, -1), x_clip=True))

        # non-multiple-of-16 dims -> refused, caller falls back
        f2 = frame[:40, :56]
        jp2 = str(tmp_path / "f2.jpg")
        cv2.imwrite(jp2, f2[..., ::-1])
        y2 = np.zeros((40, 56), np.uint8)
        cb2 = np.zeros((20, 28), np.uint8)
        assert not decode_pair_yuv_index(jp2, pp, y2, cb2, cb2.copy(),
                                         np.zeros((40, 56), np.uint8))
