"""ECO: Fourier-series DCF machinery (ops/fourier.py) + the online
factorized-filter tracker (trackers/eco_tracker.py) — rebuild of
keep_track_vot2021/pytracking/tracker/eco + libs/{fourier,dcf}.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtrack_tpu.ops.fourier import (
    bicubic_interp_spectrum,
    cfft2,
    conj_symmetrize,
    embed_spectrum,
    gauss_label_spectrum,
    max2d_wrapped,
    reg_filter,
    sample_scores,
    shift_spectrum,
)


def test_cfft2_sample_roundtrip_odd():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9).astype(np.float32)
    S = cfft2(jnp.asarray(x))
    assert S.shape == (2, 9, 9) and S.dtype == jnp.complex64
    # sum-of-series convention: sampling on the native grid returns N^2 * x
    got = np.asarray(sample_scores(S, 9))
    np.testing.assert_allclose(got, 81 * x, rtol=1e-4, atol=1e-3)


def test_cfft2_even_input_is_odd_conjugate_symmetric():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 8).astype(np.float32)
    S = np.asarray(cfft2(jnp.asarray(x)))
    assert S.shape == (9, 9)
    # real signal -> conjugate-symmetric centered series (incl. the
    # duplicated Nyquist rows/cols, rfftshift2 semantics)
    np.testing.assert_allclose(S, np.conj(S[::-1, ::-1]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(conj_symmetrize(jnp.asarray(S))),
                               S, atol=1e-3)


def test_shift_spectrum_integer_shift_rolls():
    rng = np.random.RandomState(2)
    x = rng.randn(11, 11).astype(np.float32)
    S = cfft2(jnp.asarray(x))
    # content at +delta moves to 0: out[t] = x[t + delta]
    delta = np.array([3.0, -2.0], np.float32)
    S2 = shift_spectrum(S, jnp.asarray(2 * np.pi * delta / 11))
    got = np.asarray(sample_scores(S2, 11)) / 121
    want = np.roll(x, (-3, 2), axis=(0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_gauss_label_peaks_at_zero_displacement():
    y = np.asarray(sample_scores(gauss_label_spectrum(15, 1.5, 1.5), 31))
    assert y.argmax() == 0          # spatial index 0 = zero displacement
    assert y[0, 0] > 0
    # symmetric falloff
    np.testing.assert_allclose(y[1, 0], y[30, 0], rtol=1e-3)


def test_embed_spectrum_preserves_scores():
    rng = np.random.RandomState(3)
    x = rng.randn(9, 9).astype(np.float32)
    S = cfft2(jnp.asarray(x))
    a = np.asarray(sample_scores(S, 27))
    b = np.asarray(sample_scores(embed_spectrum(S, 13), 27))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_max2d_wrapped_displacement():
    s = np.full((1, 10, 10), -1.0, np.float32)
    s[0, 9, 2] = 5.0                # wraps to dy=-1, dx=+2
    mv, disp = max2d_wrapped(jnp.asarray(s))
    assert float(mv[0]) == 5.0
    np.testing.assert_array_equal(np.asarray(disp[0]), [-1.0, 2.0])


def test_reg_filter_is_small_symmetric_and_padded():
    k = reg_filter((208, 208), (48.0, 64.0), 1e-4, 1e-2, 2.0, 0.05,
                   pad_to=15)
    assert k.shape == (15, 15)
    np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-10)  # symmetric
    assert np.abs(k).max() > 0
    # unpadded: odd, compact
    k0 = reg_filter((208, 208), (48.0, 64.0), 1e-4, 1e-2, 2.0, 0.05)
    assert k0.shape[0] % 2 == 1 and k0.shape[0] <= 15


def test_preconditioned_cg_matches_plain_solution():
    from mmtrack_tpu.ops.optimization import conjugate_gradient

    rng = np.random.RandomState(4)
    M = rng.randn(10, 10).astype(np.float32)
    A_mat = jnp.asarray(M @ M.T + np.diag(np.linspace(1, 50, 10)
                                          ).astype(np.float32))
    b = jnp.asarray(rng.randn(10).astype(np.float32))
    d = jnp.diag(A_mat)
    x_pc = conjugate_gradient(lambda v: A_mat @ v, b, jnp.zeros(10), 40,
                              precond=lambda r: r / d)
    np.testing.assert_allclose(np.asarray(A_mat @ x_pc), np.asarray(b),
                               atol=1e-3)


def test_joint_gn_learns_localizing_filter():
    """The FactorizedConvProblem analog on hand-made features: after the
    joint solve, the fused response must peak at zero displacement for a
    centered target and follow a translated target."""
    from mmtrack_tpu.ops.optimization import gauss_newton_cg
    from mmtrack_tpu.ops.fourier import cfft2
    from mmtrack_tpu.trackers.eco_tracker import (
        ECORuntime, _apply_filter_spectrum, _joint_residuals_block,
        _to_spectrum)
    from mmtrack_tpu.ops.window import hann2d
    from functools import partial

    rt = ECORuntime(projection_reg=5e-8)
    rng = np.random.RandomState(5)
    n, hsz, d, c = 4, 17, 12, 4

    def make_feat(center):
        yy, xx = np.mgrid[0:hsz, 0:hsz]
        blob = np.exp(-((yy - center[0]) ** 2 + (xx - center[1]) ** 2) / 6.0)
        f = 0.05 * rng.randn(hsz, hsz, d)
        f[..., :4] += blob[..., None]
        return f.astype(np.float32)

    mid = hsz // 2
    feats = jnp.asarray(np.stack([make_feat((mid, mid)) for _ in range(n)]))
    window = hann2d(hsz)
    kk = bicubic_interp_spectrum(hsz)
    interp = np.stack([kk.real, kk.imag], -1).astype(np.float32)
    X = _to_spectrum(feats, window, interp)          # (n, d, F, F)
    yf = gauss_label_spectrum(hsz, 1.0, 1.0)
    reg_k = jnp.asarray(reg_filter((hsz, hsz), (5.0, 5.0), 1e-4, 1e-2,
                                   2.0, 0.05, pad_to=5))
    sw = jnp.full((n,), 1.0 / n)

    h0 = jnp.zeros((c, hsz, hsz, 2), jnp.float32)
    P0 = jnp.asarray(rng.randn(d, c).astype(np.float32)) / np.sqrt(d)
    res = partial(_joint_residuals_block, rt, X=X, yf=yf, sw=sw,
                  reg_k=reg_k)
    h, P = jax.jit(lambda v: gauss_newton_cg(res, v, 3, 10))((h0, P0))

    # response on a shifted target peaks at the shift (wraparound grid)
    test = jnp.asarray(make_feat((mid + 3, mid - 2)))[None]
    Xt = _to_spectrum(test @ P, window, interp)
    scores = sample_scores(_apply_filter_spectrum(Xt, h), hsz)
    _, disp = max2d_wrapped(scores)
    np.testing.assert_array_equal(np.asarray(disp[0]), [3.0, -2.0])


def test_eco_geometry_sizes():
    from mmtrack_tpu.trackers.eco_tracker import ECORuntime, eco_geometry

    rt = ECORuntime()
    st, consts = eco_geometry(rt, (50.0, 60.0))
    assert st.sample_sz in (208, 240)
    assert st.feat_sz == (st.sample_sz // 4, st.sample_sz // 16)
    assert all(f % 2 == 1 for f in st.filt_sz)
    assert consts["yf"][0].shape == (st.filt_sz[0],) * 2
    # big target: clamped by max_image_sample_size
    st2, _ = eco_geometry(rt, (300.0, 300.0))
    assert st2.sample_sz in (208, 240)


@pytest.mark.slow
def test_eco_tracker_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.backbones import resnet18_vggmconv1
    from mmtrack_tpu.trackers.eco_tracker import ECORuntime, ECOTracker

    # shrunken geometry for the 1-core CI host
    rt = ECORuntime(min_image_sample_size=64 ** 2,
                    max_image_sample_size=80 ** 2,
                    sample_memory_size=20, train_skipping=2,
                    init_cg_iter=12, init_gn_iter=3, cg_iter=2,
                    aug_rotate=(10, -10), aug_blur=((2, 2),),
                    aug_dropout_num=2)
    model = resnet18_vggmconv1()
    x = jnp.zeros((1, 80, 80, 3))
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=5, height=140, width=180,
                                         seed=3)
    tr = ECOTracker(model, params, rt)
    tr.initialize(frames[0][..., :3], {"init_bbox": gt[0].tolist()})
    assert int(tr.state["num_stored"]) == rt.num_init_samples
    for t in range(1, 5):
        out = tr.track(frames[t][..., :3])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
        assert np.isfinite(out["best_score"])
    for f in tr.state["filters"]:
        assert np.isfinite(np.asarray(f)).all()


def test_eco_registry_entry():
    from mmtrack_tpu.registry import TRACKER_REGISTRY

    assert "eco" in TRACKER_REGISTRY
    assert TRACKER_REGISTRY["eco"].composition == "color"


def test_eco_backbone_converter_shapes():
    """Converted resnet18_vggmconv1 tensors land on the flax tree with the
    right shapes (synthetic state_dict at reference layout)."""
    from mmtrack_tpu.models.backbones import resnet18_vggmconv1
    from mmtrack_tpu.models.convert import convert_eco_backbone_checkpoint

    model = resnet18_vggmconv1()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(0)
    sd = {"vggmconv1.weight": rng.randn(96, 3, 7, 7).astype(np.float32),
          "vggmconv1.bias": rng.randn(96).astype(np.float32),
          "conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for leaf, shape in (("weight", (64,)), ("bias", (64,)),
                        ("running_mean", (64,)), ("running_var", (64,))):
        sd[f"bn1.{leaf}"] = rng.randn(*shape).astype(np.float32)
    sd["layer1.0.conv1.weight"] = rng.randn(64, 64, 3, 3).astype(np.float32)

    out = convert_eco_backbone_checkpoint(sd)
    p = out["params"]
    assert p["vggmconv1"]["kernel"].shape == \
        params["params"]["vggmconv1"]["kernel"].shape
    assert p["vggmconv1"]["bias"].shape == (96,)
    assert p["conv1"]["kernel"].shape == \
        params["params"]["conv1"]["kernel"].shape
    assert p["bn1"]["scale"].shape == (64,)
    assert p["layer1_0"]["conv1"]["kernel"].shape == \
        params["params"]["layer1_0"]["conv1"]["kernel"].shape
    np.testing.assert_allclose(
        p["vggmconv1"]["kernel"],
        sd["vggmconv1.weight"].transpose(2, 3, 1, 0))


def test_mosse_tracks_a_translating_pattern():
    """MOSSE (mosse.py:10-139) is closed-form — on a rigid translating
    texture it must actually FOLLOW the target, not just run."""
    from mmtrack_tpu.trackers.mosse_tracker import MOSSERuntime, MOSSETracker

    r = np.random.RandomState(0)
    H, W = 120, 160
    canvas = r.randint(0, 60, (H + 40, W + 40, 3)).astype(np.float32)
    patch = r.randint(120, 255, (24, 30, 3)).astype(np.float32)

    def frame(ox, oy):
        f = canvas[20:20 + H, 20:20 + W].copy()
        f[oy:oy + 24, ox:ox + 30] = patch
        return f

    rt = MOSSERuntime(min_image_sample_size=48 ** 2,
                      max_image_sample_size=64 ** 2)
    tr = MOSSETracker(rt)
    tr.initialize(frame(40, 30), {"init_bbox": [40, 30, 30, 24]})
    drift = []
    for t in range(1, 6):
        ox, oy = 40 + 3 * t, 30 + 2 * t
        out = tr.track(frame(ox, oy))
        b = out["target_bbox"]
        cx, cy = b[0] + b[2] / 2, b[1] + b[3] / 2
        drift.append(abs(cx - (ox + 15)) + abs(cy - (oy + 12)))
    assert max(drift) < 4.0, drift


def test_ccot_tracker_end_to_end():
    """CCOT = unfactorized ECO + per-frame CG (ccot.py); full loop on the
    shrunken geometry."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.backbones import resnet18_vggmconv1
    from mmtrack_tpu.trackers.ccot_tracker import CCOTTracker, ccot_runtime

    rt = ccot_runtime(min_image_sample_size=64 ** 2,
                      max_image_sample_size=80 ** 2,
                      sample_memory_size=6, init_cg_iter=8, cg_iter=2)
    assert not rt.use_projection and rt.train_every_frame
    model = resnet18_vggmconv1()
    x = jnp.zeros((1, 80, 80, 3))
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))

    frames, gt = make_synthetic_sequence(n_frames=4, height=140, width=180,
                                         seed=3)
    tr = CCOTTracker(model, params, rt)
    tr.initialize(frames[0][..., :3], {"init_bbox": gt[0].tolist()})
    assert int(tr.state["num_stored"]) == 1  # single unaugmented sample
    for t in range(1, 4):
        out = tr.track(frames[t][..., :3])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
    # full-dimension filters: channel dim == feature dim (no projection)
    assert tr.state["filters"][0].shape[0] == 96
    assert tr.state["filters"][1].shape[0] == 256
    for f in tr.state["filters"]:
        assert np.isfinite(np.asarray(f)).all()


def test_scsrdcf_tracks_a_translating_pattern():
    """SCSRDCF (scsrdcf.py:11-274): the SOR-solved spatially-regularized
    filter must follow a rigid translating texture."""
    from mmtrack_tpu.trackers.scsrdcf_tracker import (SCSRDCFRuntime,
                                                      SCSRDCFTracker)

    r = np.random.RandomState(0)
    H, W = 120, 160
    canvas = r.randint(0, 60, (H + 40, W + 40, 3)).astype(np.float32)
    patch = r.randint(120, 255, (24, 30, 3)).astype(np.float32)

    def frame(ox, oy):
        f = canvas[20:20 + H, 20:20 + W].copy()
        f[oy:oy + 24, ox:ox + 30] = patch
        return f

    rt = SCSRDCFRuntime(min_image_sample_size=48 ** 2,
                        max_image_sample_size=64 ** 2)
    tr = SCSRDCFTracker(rt)
    tr.initialize(frame(40, 30), {"init_bbox": [40, 30, 30, 24]})
    drift = []
    for t in range(1, 6):
        ox, oy = 40 + 3 * t, 30 + 2 * t
        out = tr.track(frame(ox, oy))
        b = out["target_bbox"]
        drift.append(abs(b[0] + b[2] / 2 - (ox + 15))
                     + abs(b[1] + b[3] / 2 - (oy + 12)))
    assert max(drift) < 4.0, drift
    assert np.isfinite(np.asarray(tr.state["f"])).all()
