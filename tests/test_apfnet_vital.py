"""APFNet, VITAL and DiMP-actor tests."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.apfnet import ATTRIBUTES, APFNet, stage_mask
from mmtrack_tpu.models.vital import GNet, apply_mask, g_loss, hardest_fixed_mask
from mmtrack_tpu.train.dimp_actor import (
    dimp_forward_and_loss,
    gaussian_label_map,
    make_proposals,
)


def test_apfnet_forward_and_attribute_selection():
    model = APFNet()
    x = jnp.zeros((2, 107, 107, 6))
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, x))(params)
    assert out.shape == (2, 2)
    # stage-1 style single-attribute path
    out1 = jax.jit(lambda p: model.apply(p, x, 0, 2))(params)
    assert out1.shape == (2, 2)
    feats = model.apply(params, x, method=APFNet.extract_features)
    assert feats.shape == (2, 1, 2 * 4608)


def test_apfnet_stage_masks():
    model = APFNet()
    x = jnp.zeros((1, 107, 107, 6))
    params = flax.core.unfreeze(
        jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))["params"])

    m1 = flax.traverse_util.flatten_dict(stage_mask(params, 1, attribute=0))
    for path, t in m1.items():
        top = str(path[0])
        if top.startswith("attr"):
            assert t == top.endswith(ATTRIBUTES[0])
        elif top.startswith("agg") or top.startswith("layers"):
            assert not t
        else:
            assert t  # fc always trainable in staged protocol

    m2 = flax.traverse_util.flatten_dict(stage_mask(params, 2))
    assert any(t for p, t in m2.items() if str(p[0]).startswith("agg"))
    assert not any(t for p, t in m2.items() if str(p[0]).startswith("attr"))

    m3 = flax.traverse_util.flatten_dict(stage_mask(params, 3))
    assert all(m3.values())


def test_vital_gnet_and_adversarial_mask():
    gnet = GNet()
    feats = jnp.asarray(np.random.RandomState(0).randn(4, 3 * 3 * 512)
                        .astype(np.float32))
    g_params = gnet.init(jax.random.PRNGKey(0), feats)
    mask = gnet.apply(g_params, feats)
    assert mask.shape == (4, 3, 3)
    assert ((np.asarray(mask) > 0) & (np.asarray(mask) < 1)).all()

    masked = apply_mask(feats, mask)
    assert masked.shape == feats.shape

    # a fake classifier that relies on cell 0: the hardest mask drops it
    w = np.zeros((3, 3, 512), np.float32)
    w[0, 0] = 1.0
    w = jnp.asarray(w.reshape(-1))

    def score_fn(f):
        s = f @ w
        return jnp.stack([-s, s], axis=1)

    hard = hardest_fixed_mask(score_fn, jnp.abs(feats))
    assert float(hard[0, 0]) == 0.0 and float(hard.sum()) == 8.0

    loss = g_loss(g_params, gnet, score_fn, feats)
    assert np.isfinite(float(loss))


def test_gaussian_label_and_proposals():
    bb = jnp.asarray([[100.0, 120.0, 60.0, 40.0]])
    label = gaussian_label_map(bb, score_sz=19, image_sz=288)
    assert label.shape == (1, 19, 19)
    lm = np.asarray(label[0])
    peak = np.unravel_index(lm.argmax(), lm.shape)
    # center (130, 140)/16 = (8.125, 8.75) in feature cells
    assert abs(peak[0] - 8.75) <= 1 and abs(peak[1] - 8.125) <= 1

    props, ious = make_proposals(jax.random.PRNGKey(0), bb, n_proposals=16)
    assert props.shape == (1, 16, 4) and ious.shape == (1, 16)
    assert (np.asarray(ious) >= 0).all() and (np.asarray(ious) <= 1.0 + 1e-6).all()
    assert np.asarray(ious).std() > 0


@pytest.mark.slow
def test_dimp_actor_loss_finite_and_differentiable():
    from mmtrack_tpu.models.dimp import DiMPNet
    net = DiMPNet(merge_type=None)
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 8])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(jax.random.PRNGKey(0))
    batch = {"train_im": im, "test_im": im, "train_bb": bb, "test_bb": bb}
    loss, stats = dimp_forward_and_loss(net, params, batch,
                                        jax.random.PRNGKey(1), image_sz=96)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: dimp_forward_and_loss(
        net, p, batch, jax.random.PRNGKey(1), image_sz=96)[0])(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
