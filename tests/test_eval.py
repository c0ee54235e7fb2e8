"""Metrics + OPE driver + tracker-runtime integration tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.composition import compose_x
from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.eval.datasets import EvalSequence
from mmtrack_tpu.eval.metrics import (
    PrReFScore,
    evaluate_ope,
    iou_xywh,
    precision_at,
    success_auc,
)
from mmtrack_tpu.eval.ope import run_dataset, run_sequence, save_result, result_path
from mmtrack_tpu.models.vipt import ViPTrack
from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker


# ---------------------------------------------------------------- metrics

def test_iou_xywh_values():
    a = np.array([0.0, 0.0, 2.0, 2.0])
    assert iou_xywh(a, a) == pytest.approx(1.0)
    b = np.array([1.0, 1.0, 2.0, 2.0])
    assert iou_xywh(a, b) == pytest.approx(1.0 / 7.0)
    c = np.array([10.0, 10.0, 2.0, 2.0])
    assert iou_xywh(a, c) == pytest.approx(0.0)
    # NaN ground truth -> 0
    assert iou_xywh(a, np.array([np.nan] * 4)) == 0.0


def test_success_and_precision_perfect():
    gt = np.random.RandomState(0).rand(50, 4) * 50 + 10
    res = evaluate_ope(gt, gt)
    # IoU == 1 can only fail the t=1.0 bin (fp rounding may pass it too)
    assert 20 / 21 - 1e-9 <= res["success_auc"] <= 1.0
    assert res["precision_20px"] == 1.0
    assert res["n_frames"] == 50


def test_evaluate_ope_skips_invalid_gt():
    gt = np.ones((10, 4))
    gt[3] = np.nan
    gt[7, 2] = 0.0
    res = evaluate_ope(np.ones((10, 4)), gt)
    assert res["n_frames"] == 8


def test_prre_fscore_perfect_tracking():
    m = PrReFScore()
    gt = np.tile([10.0, 10.0, 5.0, 5.0], (6, 1))
    m.add_sequence(gt[1:], np.ones(5), gt, np.ones(6, bool))
    pr, re = m.value()
    np.testing.assert_allclose(pr, 1.0)
    np.testing.assert_allclose(re, 1.0)
    p, r, f = m.fscore()
    assert (p, r, f) == (1.0, 1.0, 1.0)


def test_prre_fscore_confidence_thresholding():
    m = PrReFScore()
    gt = np.tile([10.0, 10.0, 5.0, 5.0], (5, 1))
    # 2 perfect high-conf frames, 2 missed low-conf frames
    pred = gt[1:].copy()
    pred[2:] += 100  # IoU 0
    conf = np.array([0.9, 0.9, 0.1, 0.1])
    m.add_sequence(pred, conf, gt, np.ones(5, bool))
    pr, re = m.value()
    # at threshold above 0.1: subset = init + 2 perfect -> Pr = 1, Re = 3/5
    hi = pr[(m.thresholds > 0.15) & (m.thresholds <= 0.85)]
    np.testing.assert_allclose(hi, 1.0)
    _, _, f = m.fscore()
    # best F at high threshold: Pr=1, Re=0.6 -> F = 0.75
    assert f == pytest.approx(0.75)


# ---------------------------------------------------------------- composition

def test_compose_x_modes():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (20, 30, 3), np.uint8)
    depth = rng.randint(0, 5000, (20, 30), np.uint16)
    assert compose_x(rgb, None, "color").shape == (20, 30, 3)
    assert compose_x(None, depth, "colormap").shape == (20, 30, 3)
    assert compose_x(None, depth, "3x").shape == (20, 30, 3)
    assert compose_x(rgb, depth, "rgbcolormap").shape == (20, 30, 6)
    assert compose_x(rgb, depth, "rgb3x").shape == (20, 30, 6)
    e = rng.randint(0, 255, (20, 30, 3), np.uint8)
    assert compose_x(rgb, e, "rgbrgb").shape == (20, 30, 6)
    with pytest.raises(ValueError):
        compose_x(rgb, depth, "bogus")


def test_compose_rgbd_blend():
    """ProMixTrack composition: 3-channel, 95% color + 5% JET(clipped depth)
    (rgbd_blend.py:21-52)."""
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (20, 30, 3), np.uint8)
    depth = rng.randint(0, 9000, (20, 30), np.uint16)
    out = compose_x(rgb, depth, "rgbd_blend")
    assert out.shape == (20, 30, 3) and out.dtype == np.uint8
    # dominated by the color frame at alpha=0.05
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= np.ceil(0.05 * 255) + 1
    # depth must still influence the output
    out2 = compose_x(rgb, np.zeros_like(depth), "rgbd_blend")
    assert (out != out2).any()


def test_compose_depth_clip():
    depth = np.full((10, 10), 100, np.uint16)
    depth[0, 0] = 60000
    out = compose_x(None, depth, "normalized_x", x_clip=True)
    # clip at 3*median=300 -> outlier saturates, rest spread over [0,255]
    assert out[0, 0] == 255
    assert out[1, 1] == 0


# ---------------------------------------------------------------- tracker integration

TINY_MODEL = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
                  template_size=32, search_size=64, ce_loc=(1,),
                  head_channel=16)
TINY_RT = ViPTRuntime(template_factor=2.0, template_size=32,
                      search_factor=4.0, search_size=64, stride=16,
                      ce_loc=(1,), ce_keep_ratio=(0.7,))


def _tiny_tracker():
    model = ViPTrack(**TINY_MODEL)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, None, TINY_RT.ce_keep_lens))(
        jax.random.PRNGKey(0))
    return ViPTTracker(model, params, TINY_RT)


def test_tracker_runs_synthetic_sequence():
    frames, gt = make_synthetic_sequence(n_frames=6, height=96, width=128)
    tracker = _tiny_tracker()
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    for t in range(1, 6):
        out = tracker.track(frames[t])
        box = out["target_bbox"]
        assert len(box) == 4
        assert np.isfinite(box).all() and np.isfinite(out["best_score"])
        # clipped to image with 10px margin semantics
        assert box[0] >= 0 and box[1] >= 0
        assert box[0] + box[2] <= 128 + 1e-3
        assert box[1] + box[3] <= 96 + 1e-3


def test_ope_runner_and_resume(tmp_path):
    frames, gt = make_synthetic_sequence(n_frames=5, height=96, width=128)
    seq = EvalSequence("synth", [None] * 5, [None] * 5, gt)
    tracker = _tiny_tracker()
    res = run_sequence(tracker, seq, frame_loader=lambda i: frames[i])
    assert res["boxes"].shape == (5, 4)
    np.testing.assert_allclose(res["boxes"][0], gt[0])  # row 0 = GT init
    assert res["fps"] > 0

    path = result_path(str(tmp_path), "SYNTH", "tiny", seq.name)
    save_result(path, res)
    loaded = np.loadtxt(path, delimiter=",")
    np.testing.assert_allclose(loaded, res["boxes"], atol=1e-9)
    assert os.path.exists(path[:-4] + "_time.value")
    assert os.path.exists(path[:-4] + "_confidence.value")

    # second run skips (resume semantics)
    outs = run_dataset(lambda: tracker, [seq], str(tmp_path), "SYNTH", "tiny",
                       verbose=False)
    assert outs == []


def test_device_compose_matches_host_bitexact():
    """ops/compose.py: device-side rgbcolormap (clip+normalize+JET LUT)
    must reproduce the host composition bit-for-bit (the model consumes
    these values; bench.py streams the device path)."""
    import jax.numpy as jnp

    from mmtrack_tpu.ops.compose import compose_rgbcolormap_device, jet_lut

    lut = jnp.asarray(jet_lut())
    for seed in range(3):
        r = np.random.RandomState(seed)
        rgb = r.randint(0, 255, (32, 48, 3)).astype(np.uint8)
        dep = r.randint(100, 60000, (32, 48)).astype(np.uint16)
        host = compose_x(rgb, dep, "rgbcolormap", x_clip=True)
        dev = np.asarray(compose_rgbcolormap_device(
            jnp.asarray(rgb), jnp.asarray(dep), lut))
        np.testing.assert_array_equal(host, dev)
    # batched (T, B) leading dims
    rgb = np.random.RandomState(9).randint(0, 255, (2, 3, 16, 16, 3)).astype(np.uint8)
    dep = np.random.RandomState(9).randint(0, 9000, (2, 3, 16, 16)).astype(np.uint16)
    out = compose_rgbcolormap_device(jnp.asarray(rgb), jnp.asarray(dep), lut)
    assert out.shape == (2, 3, 16, 16, 6)


def test_rgb_index_split_compose_matches_host_bitexact():
    """data/composition.py::depth_index_u8 + ops/compose.py::
    compose_rgb_index_device — the 4-byte/px streaming split — must also
    reproduce compose_x('rgbcolormap') bit-for-bit."""
    import jax.numpy as jnp

    from mmtrack_tpu.data.composition import depth_index_u8
    from mmtrack_tpu.ops.compose import compose_rgb_index_device, jet_lut

    lut = jnp.asarray(jet_lut())
    for seed in range(3):
        r = np.random.RandomState(seed + 20)
        rgb = r.randint(0, 255, (32, 48, 3)).astype(np.uint8)
        dep = r.randint(100, 60000, (32, 48)).astype(np.uint16)
        host = compose_x(rgb, dep, "rgbcolormap", x_clip=True)
        idx = depth_index_u8(dep, x_clip=True)
        dev = np.asarray(compose_rgb_index_device(
            jnp.asarray(rgb), jnp.asarray(idx), lut))
        np.testing.assert_array_equal(host, dev)
    # batched (T, B) leading dims pass through unchanged
    rgb = np.random.RandomState(5).randint(0, 255, (2, 3, 16, 16, 3)).astype(np.uint8)
    idx = np.random.RandomState(5).randint(0, 255, (2, 3, 16, 16)).astype(np.uint8)
    out = compose_rgb_index_device(jnp.asarray(rgb), jnp.asarray(idx), lut)
    assert out.shape == (2, 3, 16, 16, 6)


def test_device_compose_cv2_rounding_ties():
    """cv2.normalize evaluates a per-pixel f32 FMA (single rounding) — maps
    with exact-.5 normalize results and fractional (x.5) clip medians must
    still match bit-for-bit (ops/compose.py emulates the FMA with exact
    TwoSum arithmetic; caught live: (d-lo)*scale rounds differently)."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.ops.compose import compose_rgbcolormap_device, jet_lut

    lut = jnp.asarray(jet_lut())
    f = jax.jit(lambda r, d: compose_rgbcolormap_device(r, d, lut))
    rng = np.random.default_rng(21)
    for trial in range(25):
        n = 48
        lo = int(rng.integers(0, 30000))
        hi = lo + int(rng.integers(100, 12000))  # tight ranges hit ties
        d = rng.integers(lo, hi + 1, size=(n, n)).astype(np.uint16)
        rgb = rng.integers(0, 255, (n, n, 3)).astype(np.uint8)
        host = compose_x(rgb, d, "rgbcolormap", x_clip=True)
        np.testing.assert_array_equal(
            host, np.asarray(f(jnp.asarray(rgb), jnp.asarray(d))),
            err_msg=f"trial {trial} lo={lo} hi={hi}")
    # constant map: cv2's DBL_EPSILON guard maps everything to index 0
    d = np.full((16, 16), 4321, np.uint16)
    rgb = np.zeros((16, 16, 3), np.uint8)
    np.testing.assert_array_equal(
        compose_x(rgb, d, "rgbcolormap", x_clip=True),
        np.asarray(f(jnp.asarray(rgb), jnp.asarray(d))))
