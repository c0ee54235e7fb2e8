"""Learned KeepTrack peak matcher (models/peak_matching.py vs the
reference's SuperGlue-style peak_matching.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtrack_tpu.models.peak_matching import (DescriptorExtractor,
                                              PeakMatcher,
                                              log_optimal_transport,
                                              matcher_nll_loss,
                                              normalize_keypoints)

K, D = 6, 32
SMALL = dict(descriptor_dim=D, input_dim=D, kenc_layers=(16, D),
             gnn_blocks=2, sinkhorn_iters=20)


def _problem(seed=0, noise=0.01):
    rng = np.random.RandomState(seed)
    d0 = rng.randn(1, K, D).astype(np.float32)
    perm = rng.permutation(K)
    d1 = d0[:, perm] + noise * rng.randn(1, K, D).astype(np.float32)
    k0 = rng.uniform(0, 288, (1, K, 2)).astype(np.float32)
    k1 = k0[:, perm]
    s = np.ones((1, K), np.float32)
    v = np.ones((1, K), bool)
    gt0 = np.argsort(perm)[None]  # set0 peak i sits at position gt0[i] in set1
    return tuple(map(jnp.asarray, (d0, k0, s, v, d1, k1, s, v))), jnp.asarray(gt0)


def test_normalize_keypoints():
    k = jnp.asarray([[144.0, 144.0], [0.0, 0.0]])
    n = np.asarray(normalize_keypoints(k, (288.0, 288.0)))
    np.testing.assert_allclose(n[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(n[1], [-144 / (288 * 0.7)] * 2, atol=1e-5)


def test_sinkhorn_doubly_stochastic_with_mask():
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(1, 4, 4).astype(np.float32))
    v0 = jnp.asarray([[True, True, True, False]])
    v1 = jnp.asarray([[True, True, True, True]])
    Z = log_optimal_transport(scores, jnp.asarray(0.5), v0, v1, iters=60)
    P = np.exp(np.asarray(Z[0]))
    # valid row marginals ~ 1/(m+n)*(m+n) = 1 after Z - norm
    np.testing.assert_allclose(P[:3].sum(axis=1), 1.0, atol=1e-3)
    # masked row carries (numerically) no transport mass in the inner block
    assert P[3, :4].max() < 1e-6


def test_matcher_recovers_permutation():
    inputs, gt0 = _problem()
    m = PeakMatcher(**SMALL)
    params = m.init(jax.random.PRNGKey(0), *inputs)
    out = jax.jit(lambda p, *a: m.apply(p, *a))(params, *inputs)
    # near-duplicate descriptors must match even at random init (similarity
    # survives the GNN); this also pins the matches0 index convention
    np.testing.assert_array_equal(np.asarray(out["matches0"]), np.asarray(gt0))
    assert np.isfinite(np.asarray(out["log_assignment"])).all()
    loss = float(matcher_nll_loss(out["log_assignment"], gt0,
                                  inputs[3], inputs[7]))
    assert np.isfinite(loss)


def test_matcher_invalid_slots_unmatched():
    inputs, gt0 = _problem()
    d0, k0, s0, v0, d1, k1, s1, v1 = inputs
    v1 = v1.at[0, int(gt0[0, 0])].set(False)  # kill set1 slot matching peak 0
    m = PeakMatcher(**SMALL)
    params = m.init(jax.random.PRNGKey(0), *inputs)
    out = m.apply(params, d0, k0, s0, v0, d1, k1, s1, v1)
    assert int(out["matches0"][0, 0]) == -1


def test_matcher_trains():
    """Training actor smoke: a couple of adam steps on noisy-correspondence
    batches reduce the assignment NLL."""
    import optax

    m = PeakMatcher(**SMALL)
    # heavy descriptor noise: random init can no longer solve it by
    # similarity alone, so learning must move the loss
    inputs, gt0 = _problem(seed=1, noise=3.0)
    params = m.init(jax.random.PRNGKey(0), *inputs, train=True)

    opt = optax.adam(1e-3)

    def loss_fn(p, batch, gt):
        out, new_state = m.apply(p, *batch, train=True,
                                 mutable=["batch_stats"])
        return matcher_nll_loss(out["log_assignment"], gt,
                                batch[3], batch[7]), new_state

    @jax.jit
    def step(p, ostate, batch, gt):
        (l, bstats), g = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, gt)
        updates, ostate = opt.update(g, ostate, p)
        p = optax.apply_updates(p, updates)
        p = {**p, "batch_stats": bstats["batch_stats"]}
        return p, ostate, l

    ostate = opt.init(params)
    losses = []
    for _ in range(12):  # overfit the one hard batch
        params, ostate, l = step(params, ostate, inputs, gt0)
        losses.append(float(l))
    assert np.mean(losses[-3:]) < losses[0] * 0.8, losses


def test_descriptor_extractor_shapes():
    de = DescriptorExtractor(descriptor_dim=16)
    feat = jnp.asarray(np.random.RandomState(0).randn(18, 18, 24), jnp.float32)
    coords = jnp.asarray([[0.0, 0.0], [17.0, 17.0], [9.0, 4.0]])
    params = de.init(jax.random.PRNGKey(0), feat, coords)
    d = de.apply(params, feat, coords)
    assert d.shape == (3, 16)
    assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
def test_keeptrack_learned_matcher_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.keep_track import PeakMatchConfig
    from mmtrack_tpu.trackers.keeptrack_tracker import (KeepTrackRuntime,
                                                        KeepTrackTracker)

    rt = KeepTrackRuntime(image_sample_size=96, sample_memory_size=6,
                          train_skipping=3, scale_memory=4,
                          peaks=PeakMatchConfig(num_peaks=4),
                          use_augmentation=False,
                          use_learned_matcher=True, descriptor_dim=32)
    # KeepTrack rides the super_dimp_hinge base since the round-3 reference
    # configuration (keeptrack_init_state optimizes via the hinge residual
    # from tracker-side Gaussian labels) — the net MUST carry the hinge
    # optimizer, like tests/test_keeptrack_tracker.py
    net = DiMPNet(merge_type=None, optimizer_type="hinge")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(
        jax.random.PRNGKey(5))
    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160,
                                         seed=3)
    tr = KeepTrackTracker(net, params, rt)
    tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    for t in range(1, 4):
        out = tr.track(frames[t])
        assert np.isfinite(out["target_bbox"]).all()
