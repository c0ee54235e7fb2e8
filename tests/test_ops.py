"""Unit tests for mmtrack_tpu.ops against independent numpy references."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu import ops


# ---------------------------------------------------------------- windows

def test_hann1d_centered_matches_formula():
    sz = 16
    got = np.asarray(ops.hann1d(sz))
    want = 0.5 * (1 - np.cos(2 * np.pi / (sz + 1) * np.arange(1, sz + 1)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # symmetric, peak in the middle, no exact zeros
    np.testing.assert_allclose(got, got[::-1], rtol=1e-6)
    assert got.min() > 0


def test_hann2d_separable():
    w = np.asarray(ops.hann2d(8, 12))
    assert w.shape == (8, 12)
    w1y = np.asarray(ops.hann1d(8))
    w1x = np.asarray(ops.hann1d(12))
    np.testing.assert_allclose(w, np.outer(w1y, w1x), rtol=1e-6)


# ---------------------------------------------------------------- boxes

def test_box_roundtrips():
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.rand(7, 4) * 100 + np.array([0, 0, 1, 1]))
    np.testing.assert_allclose(ops.box_xyxy_to_xywh(ops.box_xywh_to_xyxy(b)), b, atol=1e-5)
    np.testing.assert_allclose(ops.box_cxcywh_to_xywh(ops.box_xywh_to_cxcywh(b)), b, atol=1e-5)
    np.testing.assert_allclose(
        ops.box_xyxy_to_cxcywh(ops.box_cxcywh_to_xyxy(ops.box_xywh_to_cxcywh(b))),
        ops.box_xywh_to_cxcywh(b), atol=1e-4)


def test_iou_giou_known_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    iou, _ = ops.box_iou(a, b)
    np.testing.assert_allclose(iou, [1.0 / 7.0], rtol=1e-6)
    # disjoint boxes: giou = iou - hull penalty = -(hull-union)/hull
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    giou = ops.generalized_box_iou(a, b)
    np.testing.assert_allclose(giou, [0.0 - (3.0 - 2.0) / 3.0], rtol=1e-5)
    # identical boxes: giou == iou == 1
    np.testing.assert_allclose(ops.generalized_box_iou(a, a), [1.0], rtol=1e-6)


def test_clip_box():
    box = jnp.array([-5.0, -5.0, 20.0, 20.0])
    clipped = ops.clip_box(box, img_h=10, img_w=12, margin=2)
    x1, y1, w, h = np.asarray(clipped)
    assert x1 >= 0 and y1 >= 0
    assert x1 + w <= 12 and y1 + h <= 10
    assert w >= 2 and h >= 2


def test_transform_image_to_crop_center():
    # a box centered on the extraction box lands at the crop center
    box = jnp.array([10.0, 20.0, 4.0, 6.0])
    out = ops.transform_image_to_crop(box, box, resize_factor=2.0, crop_sz=128.0)
    cx = out[0] + out[2] / 2
    cy = out[1] + out[3] / 2
    np.testing.assert_allclose([cx, cy], [(128 - 1) / 2] * 2, atol=1e-5)
    np.testing.assert_allclose(out[2:], [8.0, 12.0], atol=1e-5)


# ---------------------------------------------------------------- heatmap

def _heatmap_reference_np(boxes_norm, S, min_overlap=0.7):
    """Direct per-sample loop port of CenterNet draw (independent check)."""
    boxes = np.asarray(boxes_norm, dtype=np.float64) * S
    out = np.zeros((boxes.shape[0], S, S), np.float32)
    for i, (x, y, w, h) in enumerate(boxes):
        cx, cy = x + w / 2, y + h / 2
        # round-half-to-even like torch/jnp round
        cxi, cyi = int(np.round(cx)), int(np.round(cy))
        b1 = h + w
        c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
        r1 = (b1 + math.sqrt(max(b1**2 - 4 * c1, 0))) / 2
        b2 = 2 * (h + w)
        c2 = (1 - min_overlap) * w * h
        r2 = (b2 + math.sqrt(max(b2**2 - 16 * c2, 0))) / 2
        a3 = 4 * min_overlap
        b3 = -2 * min_overlap * (h + w)
        c3 = (min_overlap - 1) * w * h
        r3 = (b3 + math.sqrt(max(b3**2 - 4 * a3 * c3, 0))) / (2 * a3)
        r = int(max(min(r1, r2, r3), 0))
        sigma = (2 * r + 1) / 6.0
        for yy in range(max(cyi - r, 0), min(cyi + r + 1, S)):
            for xx in range(max(cxi - r, 0), min(cxi + r + 1, S)):
                g = math.exp(-((xx - cxi) ** 2 + (yy - cyi) ** 2) / (2 * sigma**2))
                out[i, yy, xx] = max(out[i, yy, xx], g)
    return out


def test_generate_heatmap_matches_loop_reference():
    rng = np.random.RandomState(1)
    boxes = rng.uniform(0.1, 0.5, size=(6, 4)).astype(np.float32)
    boxes[:, :2] = rng.uniform(0.1, 0.4, size=(6, 2))
    got = np.asarray(ops.generate_heatmap(jnp.asarray(boxes), 16))
    want = _heatmap_reference_np(boxes, 16)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.max() == pytest.approx(1.0)


# ---------------------------------------------------------------- candidate elimination

def test_candidate_elimination_keeps_top_tokens():
    B, H, Lt, Ls, C = 2, 3, 4, 10, 8
    rng = np.random.RandomState(2)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(B, H, Lt + Ls, Lt + Ls)), axis=-1)
    tokens = jnp.asarray(rng.randn(B, Lt + Ls, C).astype(np.float32))
    gidx = jnp.tile(jnp.arange(Ls)[None], (B, 1))
    keep = 6

    new_tokens, keep_idx, removed_idx = ops.candidate_elimination(
        attn, tokens, Lt, keep, gidx, None)

    assert new_tokens.shape == (B, Lt + keep, C)
    assert keep_idx.shape == (B, keep)
    assert removed_idx.shape == (B, Ls - keep)

    score = np.asarray(attn)[:, :, :Lt, Lt:].mean(axis=2).mean(axis=1)
    for b in range(B):
        expect = set(np.argsort(-score[b])[:keep].tolist())
        assert set(np.asarray(keep_idx)[b].tolist()) == expect
        assert set(np.asarray(keep_idx[b]).tolist()) | set(np.asarray(removed_idx[b]).tolist()) == set(range(Ls))
        # token rows must be gathered consistently
        np.testing.assert_allclose(
            np.asarray(new_tokens)[b, Lt:],
            np.asarray(tokens)[b, Lt:][np.asarray(keep_idx)[b]], atol=1e-6)


def test_candidate_elimination_template_mask_weighting():
    B, H, Lt, Ls, C = 1, 2, 4, 8, 4
    rng = np.random.RandomState(3)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(B, H, Lt + Ls, Lt + Ls)), axis=-1)
    tokens = jnp.asarray(rng.randn(B, Lt + Ls, C).astype(np.float32))
    gidx = jnp.arange(Ls)[None]
    mask = jnp.zeros((B, Lt)).at[:, 1].set(1.0)  # only template row 1 votes

    _, keep_idx, _ = ops.candidate_elimination(attn, tokens, Lt, 3, gidx, mask)
    score = np.asarray(attn)[0, :, 1, Lt:].mean(axis=0)
    assert set(np.asarray(keep_idx)[0].tolist()) == set(np.argsort(-score)[:3].tolist())


def test_recover_and_gather_roundtrip():
    B, L, C, lens_x = 2, 5, 3, 9
    rng = np.random.RandomState(4)
    toks = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    gidx = jnp.asarray(np.stack([rng.permutation(lens_x)[:L] for _ in range(B)]))
    full = ops.recover_search_tokens(toks, gidx, lens_x)
    assert full.shape == (B, lens_x, C)
    back = ops.ce.gather_search_tokens(full, gidx) if hasattr(ops, "ce") else None
    from mmtrack_tpu.ops.ce import gather_search_tokens
    back = gather_search_tokens(full, gidx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(toks), atol=1e-6)
    # pruned positions are zero
    for b in range(B):
        zero_pos = sorted(set(range(lens_x)) - set(np.asarray(gidx)[b].tolist()))
        np.testing.assert_allclose(np.asarray(full)[b, zero_pos], 0.0)


def test_ce_keep_lengths_static_schedule():
    # ViPT deep config: 256 search tokens, CE at 3/6/9 with ratio 0.7
    lens = ops.ce_keep_lengths(256, [3, 6, 9], 0.7, 12)
    assert lens[:4] == [256, 256, 256, 256]
    assert lens[4] == math.ceil(0.7 * 256) == 180
    assert lens[7] == math.ceil(0.7 * 180) == 126
    assert lens[10] == math.ceil(0.7 * 126) == 89
    assert lens[11] == 89


# ---------------------------------------------------------------- losses

def test_focal_loss_matches_manual():
    rng = np.random.RandomState(5)
    pred = jnp.asarray(rng.uniform(0.01, 0.99, (2, 8, 8)).astype(np.float32))
    target = np.zeros((2, 8, 8), np.float32)
    target[0, 3, 3] = 1.0
    target[1, 5, 2] = 1.0
    target[0, 3, 4] = 0.5  # soft negative
    t = jnp.asarray(target)
    got = float(ops.focal_loss(pred, t))

    p = np.asarray(pred)
    pos = (target == 1).astype(np.float32)
    neg = (target < 1).astype(np.float32)
    pos_l = (np.log(p) * (1 - p) ** 2 * pos).sum()
    neg_l = (np.log(1 - p) * p**2 * (1 - target) ** 4 * neg).sum()
    want = -(pos_l + neg_l) / pos.sum()
    assert got == pytest.approx(want, rel=1e-4)


def test_focal_loss_no_positives():
    pred = jnp.full((1, 4, 4), 0.3)
    target = jnp.zeros((1, 4, 4))
    val = float(ops.focal_loss(pred, target))
    want = -float(jnp.sum(jnp.log(1 - pred) * pred**2))
    assert val == pytest.approx(want, rel=1e-5)


def test_lb_hinge_negative_region():
    # below-threshold labels with negative predictions incur no loss
    pred = jnp.array([-1.0, -5.0])
    label = jnp.array([0.0, 0.01])
    assert float(ops.lb_hinge_loss(pred, label, threshold=0.05)) == pytest.approx(0.0)
    # positive label region behaves like plain MSE
    pred = jnp.array([0.8])
    label = jnp.array([1.0])
    assert float(ops.lb_hinge_loss(pred, label)) == pytest.approx(0.04, rel=1e-5)


# ---------------------------------------------------------------- crop

def test_crop_resize_matches_cv2_reference():
    rng = np.random.RandomState(6)
    im = rng.randint(0, 255, (120, 160, 6), np.uint8)
    for box in [[40.0, 30.0, 30.0, 20.0],    # interior
                [-10.0, -5.0, 40.0, 30.0],   # off top-left
                [130.0, 95.0, 40.0, 30.0]]:  # off bottom-right
        want, rf_want, _ = ops.sample_target_np(im, box, 2.0, output_sz=128)
        got, rf_got = jax.jit(
            lambda i, b: ops.crop_resize(i, b, 2.0, 128))(jnp.asarray(im), jnp.asarray(box))
        assert float(rf_got) == pytest.approx(rf_want, rel=1e-6)
        # cv2 uses fixed-point bilinear on uint8; allow ~1.5 LSB
        np.testing.assert_allclose(np.asarray(got), want.astype(np.float32), atol=1.6)


def test_crop_resize_normalized_fusion():
    rng = np.random.RandomState(7)
    im = rng.randint(0, 255, (64, 64, 6), np.uint8)
    box = jnp.array([20.0, 20.0, 16.0, 16.0])
    mean = jnp.asarray([0.485, 0.456, 0.406] * 2)
    std = jnp.asarray([0.229, 0.224, 0.225] * 2)
    raw, _ = ops.crop_resize(jnp.asarray(im), box, 2.0, 32)
    fused, _ = ops.crop_resize_normalized(jnp.asarray(im), box, 2.0, 32, mean, std)
    np.testing.assert_allclose(np.asarray(fused), (np.asarray(raw) / 255.0 - np.asarray(mean)) / np.asarray(std), atol=1e-5)


def test_crop_resize_vmaps():
    rng = np.random.RandomState(8)
    ims = jnp.asarray(rng.randint(0, 255, (3, 50, 70, 6), np.uint8))
    boxes = jnp.asarray(rng.uniform(5, 25, (3, 4)).astype(np.float32))
    crops, rfs = jax.vmap(lambda i, b: ops.crop_resize(i, b, 2.0, 32))(ims, boxes)
    assert crops.shape == (3, 32, 32, 6)
    assert rfs.shape == (3,)
