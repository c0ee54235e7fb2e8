"""Offline training recipes for the non-ViPT zoo (train/zoo_actors.py):
each actor must overfit a fixed synthetic batch (SURVEY section 4 smoke
strategy; reference recipes: SPT/lib/train, MixFormer_RGBD/lib/train,
pyMDNet train_mdnet.py, APFNet train_stage*.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtrack_tpu.train import zoo_actors
from mmtrack_tpu.train.optim import build_optimizer
from mmtrack_tpu.train.train_step import TrainState


def _batch(rng, B=2, t=64, s=96, channels=6):
    r = np.random.RandomState(rng)
    return {
        "template": jnp.asarray(r.uniform(-1, 1, (B, t, t, channels)).astype(np.float32)),
        "search": jnp.asarray(r.uniform(-1, 1, (B, s, s, channels)).astype(np.float32)),
        "search_anno": jnp.asarray(
            r.uniform(0.3, 0.4, (B, 4)).astype(np.float32)),
    }


def _overfit(model_params, make_step, batch, steps=12):
    params = model_params
    tx = build_optimizer(params, lr=3e-4, weight_decay=0.0,
                         lr_drop_step=10_000, grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_step(tx))
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(steps):
        rng, r = jax.random.split(rng)
        state, stats = step(state, batch, r)
        losses.append(float(stats["Loss/total"]))
    return losses, stats


@pytest.mark.slow
def test_stark_bbox_overfits():
    from mmtrack_tpu.models.stark import STARK
    model = STARK(six_channel=True, template_size=64, search_size=96,
                  dim=48, heads=4, enc_layers=1, dec_layers=1)
    b = _batch(0)
    params = jax.jit(lambda r: model.init(r, b["template"], b["search"]))(
        jax.random.PRNGKey(0))
    losses, _ = _overfit(params,
                         lambda tx: zoo_actors.make_stark_train_step(model, tx, "bbox"),
                         b)
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_stark_score_stage_trains():
    from mmtrack_tpu.models.stark import STARK
    model = STARK(six_channel=True, score_head=True, template_size=64,
                  search_size=96, dim=48, heads=4, enc_layers=1, dec_layers=1)
    b = _batch(1, B=4)
    params = jax.jit(lambda r: model.init(r, b["template"], b["search"]))(
        jax.random.PRNGKey(0))
    losses, stats = _overfit(
        params, lambda tx: zoo_actors.make_stark_train_step(model, tx, "score"),
        b, steps=15)
    assert losses[-1] < losses[0], losses
    # the CLI's stage-2 trainable mask must actually select the score head
    # (caught live: it matched "cls_head" but the Dense layers are named
    # cls_0/cls_1/cls_2, freezing everything)
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"])
    mask = {k: k[0].startswith("cls_") for k in flat}
    assert any(mask.values()) and not all(mask.values())


@pytest.mark.slow
def test_mixformer_bbox_overfits():
    from mmtrack_tpu.models.mixformer import MixFormer
    model = MixFormer(template_size=64, search_size=96,
                      stage_dims=(16, 32, 48), stage_depths=(1, 1, 1),
                      stage_heads=(1, 2, 3), head_channel=32)
    b = _batch(2)
    params = jax.jit(lambda r: model.init(r, b["template"], b["template"],
                                          b["search"]))(jax.random.PRNGKey(0))
    losses, _ = _overfit(
        params, lambda tx: zoo_actors.make_mixformer_train_step(model, tx, "bbox"),
        b)
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_mixformer_score_stage_trains():
    from mmtrack_tpu.models.mixformer import MixFormer
    model = MixFormer(template_size=64, search_size=96,
                      stage_dims=(16, 32, 48), stage_depths=(1, 1, 1),
                      stage_heads=(1, 2, 3), head_channel=32)
    b = _batch(3, B=4)
    params = jax.jit(lambda r: model.init(r, b["template"], b["template"],
                                          b["search"]))(jax.random.PRNGKey(0))
    losses, _ = _overfit(
        params, lambda tx: zoo_actors.make_mixformer_train_step(model, tx, "score"),
        b, steps=15)
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_siamfc_labels_and_overfit():
    y = zoo_actors.siamfc_response_labels(
        jnp.asarray([[0.4, 0.4, 0.2, 0.2]]), 255, 17, 8)
    assert y.shape == (1, 17, 17)
    assert (np.asarray(y) == 1).any() and (np.asarray(y) == -1).any()

    from mmtrack_tpu.models.siamfc import SiamFC
    model = SiamFC()
    r = np.random.RandomState(5)
    b = {
        "template": jnp.asarray(r.uniform(-1, 1, (2, 127, 127, 6)).astype(np.float32)),
        "search": jnp.asarray(r.uniform(-1, 1, (2, 255, 255, 6)).astype(np.float32)),
        "search_anno": jnp.asarray([[0.4, 0.4, 0.2, 0.2], [0.35, 0.45, 0.2, 0.15]],
                                   jnp.float32),
    }
    params = jax.jit(lambda k: model.init(k, b["template"], b["search"]))(
        jax.random.PRNGKey(0))
    losses, _ = _overfit(
        params, lambda tx: zoo_actors.make_siamfc_train_step(model, tx), b,
        steps=10)
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_mdnet_patches_and_overfit():
    img = jnp.asarray(np.random.RandomState(0).uniform(
        0, 1, (96, 96, 6)).astype(np.float32))
    patches, labels = zoo_actors.mdnet_training_patches(
        img, jnp.asarray([0.4, 0.4, 0.2, 0.2]), jax.random.PRNGKey(0),
        n_pos=4, n_neg=8, patch_sz=48)
    assert patches.shape == (12, 48, 48, 6)
    assert labels.sum() == 4

    from mmtrack_tpu.models.mdnet import MDNet
    model = MDNet(mode="dual")
    b = _batch(6, B=1, s=96)
    xp = jnp.zeros((1, 107, 107, 6))
    params = jax.jit(lambda r: model.init(r, xp))(jax.random.PRNGKey(0))
    # reference-scale inputs (raw-128, ~70x the unit-scale the other
    # actors see) need a few extra steps at the shared test lr
    losses, stats = _overfit(
        params,
        lambda tx: zoo_actors.make_mdnet_train_step(model, tx, n_pos=8, n_neg=16),
        b, steps=30)
    assert losses[-1] < losses[0], losses


def test_apfnet_stage_masks_route_gradients():
    from mmtrack_tpu.models.apfnet import APFNet, stage_mask
    model = APFNet()
    xp = jnp.zeros((1, 107, 107, 6))
    params = jax.jit(lambda r: model.init(r, xp))(jax.random.PRNGKey(0))
    import flax
    for stage, attr in ((1, 0), (2, None), (3, None)):
        mask = stage_mask(params["params"], stage, attribute=attr)
        flat = flax.traverse_util.flatten_dict(mask)
        n_on = sum(bool(v) for v in flat.values())
        assert 0 < n_on <= len(flat)
    m1 = flax.traverse_util.flatten_dict(stage_mask(params["params"], 1,
                                                    attribute=0))
    m3 = flax.traverse_util.flatten_dict(stage_mask(params["params"], 3))
    assert sum(map(bool, m1.values())) < sum(map(bool, m3.values()))
