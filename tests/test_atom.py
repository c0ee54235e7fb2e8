"""ATOM tracker: CG/GN solver family + online factorized classifier
(pytracking/tracker/atom + libs/optimization.py rebuild)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtrack_tpu.ops.optimization import (conjugate_gradient, gauss_newton_cg,
                                          mlu)


def test_conjugate_gradient_solves_spd_system():
    rng = np.random.RandomState(0)
    M = rng.randn(12, 12).astype(np.float32)
    A_mat = jnp.asarray(M @ M.T + 5 * np.eye(12, dtype=np.float32))
    b = jnp.asarray(rng.randn(12).astype(np.float32))
    x = conjugate_gradient(lambda v: A_mat @ v, b, jnp.zeros(12), 40)
    np.testing.assert_allclose(np.asarray(A_mat @ x), np.asarray(b),
                               atol=1e-3)


def test_conjugate_gradient_pytree():
    # block-diagonal system expressed as a pytree operator
    def A(v):
        return {"a": 3.0 * v["a"], "b": 0.5 * v["b"]}

    b = {"a": jnp.ones(4), "b": jnp.full(3, 2.0)}
    x0 = {"a": jnp.zeros(4), "b": jnp.zeros(3)}
    x = conjugate_gradient(A, b, x0, 10)
    np.testing.assert_allclose(np.asarray(x["a"]), 1 / 3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x["b"]), 4.0, atol=1e-5)


def test_gauss_newton_cg_least_squares():
    rng = np.random.RandomState(1)
    J = jnp.asarray(rng.randn(20, 6).astype(np.float32))
    y = jnp.asarray(rng.randn(20).astype(np.float32))

    def residuals(x):
        return J @ x - y

    x = gauss_newton_cg(residuals, jnp.zeros(6), 2, 20)
    # linear problem: one exact GN step = least squares solution
    x_ls, *_ = np.linalg.lstsq(np.asarray(J), np.asarray(y), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_ls, atol=1e-3)


def test_mlu_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.linspace(-3, 3, 41).astype(np.float32)
    got = np.asarray(mlu(jnp.asarray(x), 0.05))
    want = F.elu(F.leaky_relu(torch.from_numpy(x), 1 / 0.05), 0.05).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_atom_tracker_end_to_end():
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.atom import ATOMNet
    from mmtrack_tpu.trackers.atom_tracker import ATOMRuntime, ATOMTracker

    rt = ATOMRuntime(image_sample_size=96, sample_memory_size=40,
                     train_skipping=2, init_gn_iter=2, init_cg_per_gn=3,
                     update_cg_iter=2,
                     aug_rotate=(10.0, -10.0), aug_blur=((2.0, 2.0),),
                     aug_dropout_num=2)
    net = ATOMNet(merge_type="max")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, bb, props))(jax.random.PRNGKey(2))
    frames, gt = make_synthetic_sequence(n_frames=4, height=120, width=160,
                                         seed=7)
    tr = ATOMTracker(net, params, rt)
    tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    assert int(tr.state["num_stored"]) == rt.num_init_samples
    for t in range(1, 4):
        out = tr.track(frames[t])
        b = out["target_bbox"]
        assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0
    # online CG must have moved the filter at some update frame
    assert np.isfinite(np.asarray(tr.state["filter"])).all()
