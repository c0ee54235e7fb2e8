"""DiMP family tests: filter ops, GN optimizer learning, IoUNet, full net."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.dimp import (
    AtomIoUNet,
    DiMPNet,
    FilterInitializer,
    SteepestDescentGN,
    apply_filter,
    build_det_dimp50,
    build_dimp50,
    distance_map,
    instance_l2_norm,
    leaky_relu_par,
)


def test_apply_filter_output_size_parity():
    feat = jnp.ones((2, 18, 18, 8))
    # odd filter: same size; even filter: +1 (torch conv pad=f//2 semantics)
    assert apply_filter(feat, jnp.ones((3, 3, 8))).shape == (2, 18, 18)
    assert apply_filter(feat, jnp.ones((4, 4, 8))).shape == (2, 19, 19)


def test_apply_filter_matches_manual_correlation():
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 6, 6, 2).astype(np.float32)
    w = rng.randn(3, 3, 2).astype(np.float32)
    got = np.asarray(apply_filter(jnp.asarray(feat), jnp.asarray(w)))[0]
    padded = np.pad(feat[0], ((1, 1), (1, 1), (0, 0)))
    want = np.zeros((6, 6))
    for i in range(6):
        for j in range(6):
            want[i, j] = (padded[i:i + 3, j:j + 3] * w).sum()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_distance_map_partition_of_unity():
    c = jnp.asarray([[4.0, 5.0]])
    dm = distance_map(c, (10, 10), num_bins=100, bin_displacement=0.1)
    assert dm.shape == (1, 10, 10, 100)
    # within the covered radius the bins form a partition of unity
    total = np.asarray(dm.sum(-1))
    d = np.sqrt((np.arange(10)[:, None] - 4.0) ** 2 + (np.arange(10)[None] - 5.0) ** 2)
    np.testing.assert_allclose(total[0][d < 9.9], 1.0, atol=1e-5)
    # center lands fully in bin 0
    assert float(dm[0, 4, 5, 0]) == pytest.approx(1.0)


def test_instance_l2_norm():
    x = jnp.ones((2, 4, 4, 8))
    y = instance_l2_norm(x, scale=1.0)
    # ||y||^2 == numel * scale^2
    np.testing.assert_allclose(np.asarray((y * y).sum(axis=(1, 2, 3))),
                               4 * 4 * 8, rtol=1e-4)


def test_leaky_relu_par_limits():
    x = jnp.asarray([-2.0, 3.0])
    np.testing.assert_allclose(leaky_relu_par(x, jnp.asarray(1.0)), x)          # identity
    np.testing.assert_allclose(leaky_relu_par(x, jnp.asarray(0.0)), [0.0, 3.0])  # relu


def _toy_problem(N=4, H=12, C=16, fsz=4, stride=16, seed=0):
    """Features with a distinctive target direction inside the box."""
    rng = np.random.RandomState(seed)
    feat = rng.randn(N, H, H, C).astype(np.float32) * 0.3
    v = rng.randn(C).astype(np.float32)
    v /= np.linalg.norm(v)
    boxes = []
    for i in range(N):
        cy, cx = H // 2 + rng.randint(-2, 3), H // 2 + rng.randint(-2, 3)
        feat[i, cy - 1:cy + 2, cx - 1:cx + 2] += 2.0 * v
        boxes.append([(cx - 1.5) * stride, (cy - 1.5) * stride, 3 * stride, 3 * stride])
    return jnp.asarray(feat), jnp.asarray(np.array(boxes, np.float32))


def _gn_loss(opt, params, w, feat, bb):
    """Recompute the GN objective with the module's own learned maps."""
    import math as m
    p = params["params"]
    N, H, W, _ = feat.shape
    fh, fw = w.shape[0], w.shape[1]
    out_sz = (H + (fh + 1) % 2, W + (fw + 1) % 2)
    offset = jnp.array([fh % 2, fw % 2], jnp.float32) / 2.0
    center = ((bb[:, :2] + bb[:, 2:] / 2) / opt.feat_stride)[:, ::-1] - offset
    dmap = distance_map(center, out_sz, opt.num_dist_bins, opt.bin_displacement)
    label = dmap @ p["label_map_kernel"]
    mask = jax.nn.sigmoid(dmap @ p["target_mask_kernel"])
    sw = m.sqrt(1.0 / N) * (dmap @ p["spatial_weight_kernel"])
    reg = float(jnp.clip(p["filter_reg"] ** 2, 1e-6, None)[0])
    r = sw * (leaky_relu_par(apply_filter(feat, w), mask) - label)
    return float((r ** 2).sum() + reg * (w ** 2).sum())


def test_gn_optimizer_decreases_objective():
    feat, bb = _toy_problem()
    init = FilterInitializer(filter_size=4, feature_stride=16)
    params_i = init.init(jax.random.PRNGKey(0), feat, bb)
    w0 = init.apply(params_i, feat, bb)
    assert w0.shape == (4, 4, 16)

    opt = SteepestDescentGN(num_iter=5, feat_stride=16)
    params_o = opt.init(jax.random.PRNGKey(0), w0, feat, bb)
    f = jax.jit(lambda w, n: opt.apply(params_o, w, feat, bb, None, n))
    losses = [_gn_loss(opt, params_o, f(w0, n), feat, bb) for n in (0, 1, 5, 10)]
    assert np.isfinite(losses).all()
    # steepest descent on the GN objective: strictly decreasing on this toy task
    assert losses[1] < losses[0] and losses[2] < losses[1] and losses[3] < losses[2]
    # the reference init_filter_reg=0.1 (DeT_DiMP50_Max.py:104) sets a
    # nonzero loss floor of reg^2*||w||^2 — convergence lands ~6% of the
    # initial objective on this toy problem
    assert losses[3] < 0.1 * losses[0]


def test_gn_optimizer_dynamic_iters_zero_is_identity():
    feat, bb = _toy_problem(seed=1)
    opt = SteepestDescentGN(num_iter=5, feat_stride=16)
    w0 = jnp.asarray(np.random.RandomState(2).randn(4, 4, 16).astype(np.float32))
    params = opt.init(jax.random.PRNGKey(0), w0, feat, bb)
    f = jax.jit(lambda w, n: opt.apply(params, w, feat, bb, None, n))
    np.testing.assert_allclose(np.asarray(f(w0, 0)), np.asarray(w0))
    # same compiled fn runs any cadence (init 10 / update 2 / hn 1)
    for n in (1, 2, 10):
        assert np.isfinite(np.asarray(f(w0, n))).all()


def test_gn_optimizer_sample_weights_mask_memory():
    """Zero-weight slots (empty memory) must not affect the result."""
    feat, bb = _toy_problem(N=4, seed=3)
    opt = SteepestDescentGN(num_iter=3, feat_stride=16)
    w0 = jnp.asarray(np.random.RandomState(4).randn(4, 4, 16).astype(np.float32))
    params = opt.init(jax.random.PRNGKey(0), w0, feat, bb)

    sw_2 = jnp.asarray([0.5, 0.5, 0.0, 0.0])
    w_masked = opt.apply(params, w0, feat, bb, sw_2, 3)
    w_sub = opt.apply(params, w0, feat[:2], bb[:2], jnp.asarray([0.5, 0.5]), 3)
    np.testing.assert_allclose(np.asarray(w_masked), np.asarray(w_sub),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_atom_iou_net_shapes_and_grad():
    rng = np.random.RandomState(5)
    f2 = jnp.asarray(rng.randn(1, 16, 16, 512).astype(np.float32) * 0.1)
    f3 = jnp.asarray(rng.randn(1, 8, 8, 1024).astype(np.float32) * 0.1)
    bb = jnp.asarray([[40.0, 40.0, 48.0, 40.0]])
    net = AtomIoUNet()
    params = net.init(jax.random.PRNGKey(0), [f2, f3], [f2, f3], bb,
                      jnp.asarray([[[40.0, 40.0, 48.0, 40.0]] * 3]))
    mod = net.apply(params, [f2, f3], bb, method=AtomIoUNet.get_modulation)
    assert mod[0].shape == (1, 256) and mod[1].shape == (1, 256)
    iou_feat = net.apply(params, [f2, f3], method=AtomIoUNet.get_iou_feat)
    assert iou_feat[0].shape == (1, 16, 16, 256)
    assert iou_feat[1].shape == (1, 8, 8, 256)

    proposals = jnp.asarray([[[40.0, 40.0, 48.0, 40.0],
                              [30.0, 35.0, 60.0, 50.0]]])
    iou = net.apply(params, mod, iou_feat, proposals, method=AtomIoUNet.predict_iou)
    assert iou.shape == (1, 2)

    # box-refinement needs d(IoU)/d(proposals) (dimp.py:652-718)
    g = jax.grad(lambda p: net.apply(params, mod, iou_feat, p,
                                     method=AtomIoUNet.predict_iou).sum())(proposals)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("merge", [None, "max", "weightedSum"])
@pytest.mark.slow
def test_dimp_net_smoke(merge):
    net = DiMPNet(merge_type=merge) if merge else build_dimp50()
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    proposals = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, proposals))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: net.apply(p, im, im, bb, proposals))(params)
    # layer3 stride 16: 96/16=6 -> even 4x4 filter gives 7x7 scores
    assert out["target_scores"].shape == (1, 7, 7)
    assert out["iou_pred"].shape == (1, 2)
    assert np.isfinite(np.asarray(out["target_scores"])).all()
