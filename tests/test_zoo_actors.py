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


@pytest.mark.slow
def test_kys_predictor_trains():
    """KYS predictor training (MotionTrackerActor): loss decreases on a
    fixed frame pair with the DiMP base frozen (stop_gradient + the
    predictor's params the only moving part)."""
    from mmtrack_tpu.models.kys import build_kysnet

    model = build_kysnet()
    S = 96
    r = np.random.RandomState(0)
    im = jnp.zeros((1, S, S, 3))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda k: model.init(k, im, im, bb, props,
                                          method="init_forward"))(
        jax.random.PRNGKey(0))

    h = S // 16
    yy, xx = np.mgrid[0:h, 0:h].astype(np.float32)
    lab = np.exp(-0.5 * ((yy - 3.0) ** 2 + (xx - 2.0) ** 2))[None]
    batch = {
        "train_images": jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)),
        "train_anno": jnp.asarray([[30.0, 30.0, 30.0, 30.0]]),
        "test_prev": jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)),
        "test_cur": jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)),
        "label_prev": jnp.asarray(lab),
        "label_cur": jnp.asarray(lab),
    }
    losses, stats = _overfit(
        params,
        lambda tx: zoo_actors.make_kys_train_step(model, tx,
                                                  filter_optim_iter=2),
        batch, steps=10)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_lwl_segmentation_overfits():
    """LWL offline training (SegmSeqActor + Lovász hinge): segmentation
    loss decreases, differentiating THROUGH the GN few-shot learner."""
    from mmtrack_tpu.models.lwl import build_lwl

    model = build_lwl(num_filters=2, label_encoder_dims=(4, 8, 8),
                      decoder_mdim=16, optim_iter=2)
    S = 96
    r = np.random.RandomState(1)
    mask = np.zeros((1, S, S), np.float32)
    mask[:, 30:60, 40:80] = 1.0
    batch = {
        "train_images": jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)),
        "test_images": jnp.asarray(r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)),
        "train_masks": jnp.asarray(mask),
        "test_masks": jnp.asarray(mask),
    }
    params = jax.jit(lambda k: model.init(k, batch["train_images"],
                                          batch["test_images"],
                                          batch["train_masks"]))(
        jax.random.PRNGKey(0))

    tx = build_optimizer(params, lr=1e-3, weight_decay=0.0,
                         lr_drop_step=10_000, grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(zoo_actors.make_lwl_train_step(model, tx))
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        state, stats = step(state, batch, k)
        losses.append(float(stats["Loss/segm"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_lovasz_hinge_loss_matches_reference():
    """JAX Lovász hinge == the reference's torch implementation
    (lovasz_loss.py:20-122, per_image=True)."""
    torch = pytest.importorskip("torch")
    from mmtrack_tpu.ops.losses import lovasz_hinge_loss

    r = np.random.RandomState(3)
    logits = r.randn(3, 8, 9).astype(np.float32)
    labels = (r.rand(3, 8, 9) > 0.6).astype(np.float32)

    def torch_lovasz(log, lab):
        # reference lovasz_hinge_flat per image
        losses = []
        for lg, lb in zip(log, lab):
            lg = torch.tensor(lg.reshape(-1))
            lb = torch.tensor(lb.reshape(-1))
            signs = 2.0 * lb - 1.0
            errors = 1.0 - lg * signs
            errors_sorted, perm = torch.sort(errors, 0, descending=True)
            gt_sorted = lb[perm]
            gts = gt_sorted.sum()
            inter = gts - gt_sorted.cumsum(0)
            union = gts + (1 - gt_sorted).cumsum(0)
            jac = 1.0 - inter / union
            jac[1:] = jac[1:] - jac[:-1]
            losses.append(float(torch.dot(torch.relu(errors_sorted), jac)))
        return np.mean(losses)

    ours = float(lovasz_hinge_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(torch_lovasz(logits, labels), abs=1e-5)


@pytest.mark.slow
def test_alpha_refine_trains():
    """AR training (ARcm_Actor: corner + 10000x mask BCE; mask_flag
    gating): total loss decreases on a fixed batch."""
    from mmtrack_tpu.models.alpha_refine import AlphaRefineNet

    model = AlphaRefineNet(input_size=128)
    r = np.random.RandomState(0)
    t = jnp.asarray(r.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    s = jnp.asarray(r.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    t_box = jnp.asarray([[32.0, 32.0, 64.0, 64.0]] * 2)
    mask = np.zeros((2, 128, 128), np.float32)
    mask[:, 40:90, 30:100] = 1.0
    batch = {
        "template": t, "template_anno": t_box, "search": s,
        "search_anno": jnp.asarray([[0.25, 0.3, 0.5, 0.4]] * 2),
        "masks": jnp.asarray(mask),
        "mask_valid": jnp.asarray([1.0, 0.0]),  # exercise the flag gating
    }
    params = jax.jit(lambda k: model.init(k, t, t_box, s))(
        jax.random.PRNGKey(0))
    losses, stats = _overfit(
        params, lambda tx: zoo_actors.make_ar_train_step(model, tx), batch,
        steps=10)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_kys_lwl_cli_batch_adapters():
    """tools/train.py --script {kys,lwl,lwl_box} route the standard
    sampler batch through these adapters; run one real step of each at
    small geometry (the 288/256 CLI defaults only change shapes)."""
    from mmtrack_tpu.models.kys import build_kysnet
    from mmtrack_tpu.models.lwl import build_lwl

    S = 96
    r = np.random.RandomState(0)
    batch = {
        "template": jnp.asarray(r.uniform(-1, 1, (1, S, S, 6)).astype(np.float32)),
        "search": jnp.asarray(r.uniform(-1, 1, (1, S, S, 6)).astype(np.float32)),
        "search_anno": jnp.asarray([[0.3, 0.3, 0.3, 0.3]]),
    }

    # the kys CLI routes collate_pair batches (real prev/cur search pair
    # in shared serve geometry) through kys_pair_adapt_batch
    pair_batch = dict(batch, search_prev=batch["template"],
                      search_prev_anno=batch["search_anno"],
                      template_anno=jnp.asarray([[0.4, 0.4, 0.2, 0.2]]))
    kb = zoo_actors.kys_pair_adapt_batch(pair_batch, S, 5.0)
    assert kb["label_cur"].shape == (1, S // 16, S // 16)
    assert kb["label_prev"].shape == (1, S // 16, S // 16)
    assert kb["train_images"].shape == (1, S, S, 3)
    # --channels 6 keeps the full multi-modal stack (the learning demo's
    # grafted 6-ch DiMP base) without changing labels/geometry
    kb6 = zoo_actors.kys_pair_adapt_batch(pair_batch, S, 5.0, channels=6)
    assert kb6["train_images"].shape == (1, S, S, 6)
    np.testing.assert_array_equal(np.asarray(kb6["label_cur"]),
                                  np.asarray(kb["label_cur"]))
    assert zoo_actors.lwl_adapt_batch(
        batch, S, 6.0, box_mode=False, channels=6)[
        "test_images"].shape == (1, S, S, 6)
    kys = build_kysnet()
    im = jnp.zeros((1, S, S, 3))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    kparams = jax.jit(lambda k: kys.init(k, im, im, bb, props,
                                         method="init_forward"))(
        jax.random.PRNGKey(0))
    tx = build_optimizer(kparams, lr=1e-3, weight_decay=0.0,
                         lr_drop_step=10_000, grad_clip_norm=1.0)
    st = TrainState.create(kparams, tx)
    step = jax.jit(zoo_actors.make_kys_train_step(kys, tx,
                                                  filter_optim_iter=2))
    st, stats = step(st, kb, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["Loss/total"]))

    lb = zoo_actors.lwl_adapt_batch(batch, S, 6.0, box_mode=False)
    assert lb["train_masks"].shape == (1, S, S)
    assert float(lb["test_masks"].sum()) > 0
    lwl = build_lwl(num_filters=2, label_encoder_dims=(4, 8, 8),
                    decoder_mdim=16, optim_iter=2)
    lparams = jax.jit(lambda k: lwl.init(k, im, im, jnp.zeros((1, S, S))))(
        jax.random.PRNGKey(0))
    tx2 = build_optimizer(lparams, lr=1e-3, weight_decay=0.0,
                          lr_drop_step=10_000, grad_clip_norm=1.0)
    st2 = TrainState.create(lparams, tx2)
    step2 = jax.jit(zoo_actors.make_lwl_train_step(lwl, tx2))
    st2, stats2 = step2(st2, lb, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats2["Loss/segm"]))
    # the Trainer syncs on Loss/total every step (trainer.py:123) — its
    # absence crashed the --script lwl CLI (caught by the learning demo)
    assert "Loss/total" in stats2

    lb_box = zoo_actors.lwl_adapt_batch(batch, S, 6.0, box_mode=True)
    assert set(lb_box) == {"train_images", "train_anno", "train_masks"}
