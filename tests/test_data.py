"""Data layer tests: sampler, processing, loader, trainer loop."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.data.datasets import SyntheticVideoDataset
from mmtrack_tpu.data.loader import BatchLoader, collate
from mmtrack_tpu.data.processing import ViPTProcessing, jitter_box, transform_box_to_crop_np
from mmtrack_tpu.data.sampler import TrackingSampler
from mmtrack_tpu.models.vipt import ViPTrack, ce_keep_schedule, generate_ctr_mask
from mmtrack_tpu.train.optim import build_optimizer
from mmtrack_tpu.train.train_step import TrainState, make_train_step
from mmtrack_tpu.train.trainer import CheckpointManager, Trainer


def _processing(train=True):
    return ViPTProcessing(
        search_area_factor={"template": 2.0, "search": 4.0},
        output_sz={"template": 32, "search": 64},
        center_jitter_factor={"template": 0, "search": 3},
        scale_jitter_factor={"template": 0, "search": 0.25},
        train_mode=train)


def test_sampler_causal_order_and_visibility():
    ds = SyntheticVideoDataset(n_sequences=3, n_frames=40)
    s = TrackingSampler([ds], None, samples_per_epoch=10, max_gap=10, seed=1)
    for _ in range(10):
        d = s.sample()
        assert len(d["template_images"]) == 1 and len(d["search_images"]) == 1
        assert d["template_images"][0].shape[2] == 6
        assert d["search_anno"].shape == (1, 4)


def test_sampler_with_processing_produces_crops():
    ds = SyntheticVideoDataset(n_sequences=2, n_frames=30)
    s = TrackingSampler([ds], None, samples_per_epoch=4, max_gap=10,
                        processing=_processing(), seed=2)
    d = s.sample()
    assert d["valid"]
    assert d["template_images"].shape == (1, 32, 32, 6)
    assert d["search_images"].shape == (1, 64, 64, 6)
    box = d["search_anno"][0]
    # normalized to crop coords, target inside the crop
    assert (box[2:] > 0).all() and (box[2:] <= 1.0 + 1e-6).all()


def test_jitter_box_statistics():
    rng = np.random.default_rng(0)
    box = np.array([50.0, 40.0, 20.0, 10.0], np.float32)
    jit = np.stack([jitter_box(box, 3.0, 0.25, rng) for _ in range(500)])
    centers = jit[:, :2] + jit[:, 2:] / 2
    gt_center = box[:2] + box[2:] / 2
    # zero jitter for template mode
    same = jitter_box(box, 0.0, 0.0, rng)
    np.testing.assert_allclose(same, box, atol=1e-5)
    # jittered centers spread around the gt center
    assert np.abs(centers.mean(0) - gt_center).max() < 5.0
    assert centers.std(0).min() > 1.0


def test_transform_box_to_crop_centered():
    box = np.array([10.0, 20.0, 4.0, 6.0], np.float32)
    out = transform_box_to_crop_np(box, box, 2.0, 128, normalize=True)
    cx, cy = out[0] + out[2] / 2, out[1] + out[3] / 2
    assert cx == pytest.approx((128 - 1) / 2 / 128, abs=1e-5)
    assert cy == pytest.approx((128 - 1) / 2 / 128, abs=1e-5)


def test_processing_rejects_zero_boxes():
    # ceil semantics: the reference (processing.py:116-120) rejects only
    # crop_sz < 1, i.e. exactly-degenerate boxes (ceil(eps) == 1 passes)
    p = _processing()
    rng = np.random.default_rng(0)
    data = {
        "template_images": [np.zeros((60, 80, 6), np.uint8)],
        "template_anno": np.array([[30.0, 20.0, 0.0, 0.0]], np.float32),
        "search_images": [np.zeros((60, 80, 6), np.uint8)],
        "search_anno": np.array([[30.0, 20.0, 0.0, 0.0]], np.float32),
    }
    out = p(data, rng)
    assert out["valid"] is False


def test_loader_batches():
    ds = SyntheticVideoDataset(n_sequences=2, n_frames=30)
    s = TrackingSampler([ds], None, samples_per_epoch=8, max_gap=10,
                        processing=_processing(), seed=3)
    loader = BatchLoader(s, batch_size=4, batches_per_epoch=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["template"].shape == (4, 32, 32, 6)
    assert batches[0]["search"].shape == (4, 64, 64, 6)
    assert batches[0]["search_anno"].shape == (4, 4)


TINY = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1,),
            prompt_type="vipt_deep", head_channel=16)


def _training_setup():
    model = ViPTrack(**TINY)
    keep = ce_keep_schedule(16, (1,), (0.7,))
    mask_z = generate_ctr_mask(2, "CTR_POINT")
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, mask_z, keep))(jax.random.PRNGKey(0))
    tx = build_optimizer(params, lr=1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx, box_mask_z=mask_z, ce_keep_lens=keep,
                                   search_size=64, stride=16, use_drop_path=False))
    return model, state, step


def _loader():
    ds = SyntheticVideoDataset(n_sequences=2, n_frames=30)
    s = TrackingSampler([ds], None, samples_per_epoch=8, max_gap=10,
                        processing=_processing(), seed=4)
    return BatchLoader(s, batch_size=2, batches_per_epoch=2)


@pytest.mark.slow
def test_trainer_epoch_and_checkpoint_resume(tmp_path):
    _, state, step = _training_setup()
    ckpts = CheckpointManager(str(tmp_path / "ck"), save_interval=1, keep_last=2)
    logs = []
    tr = Trainer(step, state, _loader(), ckpts, print_interval=1,
                 log_fn=logs.append)
    tr.train(max_epochs=2)
    assert tr.epoch == 2
    assert ckpts.latest_epoch() == 2
    assert len(tr.stats_history) == 2
    assert np.isfinite(tr.stats_history[-1]["Loss/total"])

    # a fresh trainer resumes epoch + params from disk
    _, state2, step2 = _training_setup()
    tr2 = Trainer(step2, state2, _loader(), ckpts, log_fn=logs.append)
    tr2.train(max_epochs=2)  # already done -> no epochs run
    assert tr2.epoch == 2
    a = jax.tree.leaves(tr.state.params)[0]
    b = jax.tree.leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_validation_and_step_swap(tmp_path):
    _, state, step = _training_setup()
    swaps = []

    def step_for_epoch(epoch):
        swaps.append(epoch)
        return step

    tr = Trainer(step, state, _loader(), None, log_fn=lambda *_: None,
                 val_loader=_loader(), val_step=step, val_epoch_interval=2,
                 step_for_epoch=step_for_epoch)
    tr.train(max_epochs=2)
    assert swaps == [1, 2]
    assert len(tr.val_history) == 1
    assert "val/Loss/total" in tr.val_history[0]


@pytest.mark.slow
def test_trainer_fail_safe_restarts(tmp_path):
    _, state, step = _training_setup()
    ckpts = CheckpointManager(str(tmp_path / "ck"), save_interval=1, keep_last=2)
    calls = {"n": 0}

    def flaky_step(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 3:  # crash mid-epoch once
            raise RuntimeError("injected fault")
        return step(state, batch, rng)

    tr = Trainer(flaky_step, state, _loader(), ckpts, log_fn=lambda *_: None)
    tr.train(max_epochs=2, fail_safe=True)
    assert tr.epoch == 2
    assert ckpts.latest_epoch() == 2

    # without fail_safe the same fault propagates
    calls["n"] = 0
    _, state3, step3 = _training_setup()

    def flaky3(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected fault")
        return step3(state, batch, rng)

    tr3 = Trainer(flaky3, state3, _loader(), None, log_fn=lambda *_: None)
    with pytest.raises(RuntimeError):
        tr3.train(max_epochs=2, fail_safe=False)
