"""Golden-trajectory regression + MXU crop equivalence.

SURVEY.md section 4 test strategy: bit-matching box trajectories against
recorded outputs guard numerical behavior across refactors (the north star
requires <=0.1% metric deviation once reference weights are in play).
"""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.vipt import ViPTrack
from mmtrack_tpu.ops.crop import crop_resize, crop_resize_mxu
from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_vipt_tiny.npz")

TINY = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1,), head_channel=16)
RT = ViPTRuntime(template_size=32, search_size=64, stride=16,
                 ce_loc=(1,), ce_keep_ratio=(0.7,))


def test_golden_vipt_trajectory():
    golden = np.load(FIXTURE)
    model = ViPTrack(**TINY)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, None, RT.ce_keep_lens))(
        jax.random.PRNGKey(7))
    frames, gt = make_synthetic_sequence(n_frames=8, height=96, width=128,
                                         seed=11)
    tr = ViPTTracker(model, params, RT)
    tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    boxes, scores = [], []
    for t in range(1, 8):
        out = tr.track(frames[t])
        boxes.append(out["target_bbox"])
        scores.append(out["best_score"])
    # tolerate only tiny cross-compilation numeric drift (<0.05 px / 1e-4)
    np.testing.assert_allclose(np.asarray(boxes), golden["boxes"], atol=0.05)
    np.testing.assert_allclose(np.asarray(scores), golden["scores"], atol=1e-4)


def test_golden_siamfc_trajectory():
    golden = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "golden_siamfc.npz"))
    from mmtrack_tpu.models.siamfc import SiamFC
    from mmtrack_tpu.trackers.siamfc_tracker import SiamFCRuntime, SiamFCTracker
    model = SiamFC()
    z = jnp.zeros((1, 127, 127, 6))
    x = jnp.zeros((1, 255, 255, 6))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(3))
    frames, gt = make_synthetic_sequence(n_frames=6, height=160, width=200,
                                         seed=13)
    tr = SiamFCTracker(model, params, SiamFCRuntime())
    tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    boxes = [tr.track(frames[t])["target_bbox"] for t in range(1, 6)]
    np.testing.assert_allclose(np.asarray(boxes), golden["boxes"], atol=0.05)


@pytest.mark.slow
def test_golden_dimp_trajectory():
    golden = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "golden_dimp.npz"))
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.dimp_tracker import DiMPRuntime, DiMPTracker
    # memory >= the 15 augmented init samples (identity+shift/flip/blur/
    # rotate + feature dropout; ops/augment.py)
    rt = DiMPRuntime(image_sample_size=96, sample_memory_size=20,
                     train_skipping=3)
    net = DiMPNet(merge_type="max")
    im = jnp.zeros((1, 96, 96, 6))
    bb = jnp.asarray([[30.0, 30.0, 30.0, 30.0]])
    props = jnp.asarray([[[30.0, 30.0, 30.0, 30.0]] * 2])
    params = jax.jit(lambda r: net.init(r, im, im, bb, props))(jax.random.PRNGKey(5))
    frames, gt = make_synthetic_sequence(n_frames=5, height=120, width=160,
                                         seed=17)
    tr = DiMPTracker(net, params, rt)
    tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    boxes = [tr.track(frames[t])["target_bbox"] for t in range(1, 5)]
    np.testing.assert_allclose(np.asarray(boxes), golden["boxes"], atol=0.05)


def test_scan_matches_per_step_tracking():
    """vipt_track_scan (on-device chunk loop) must reproduce the per-step
    trajectory (verified to 1.5e-5 on CPU; argmax ties can flip on TPU with
    random weights — see trackers/vipt_tracker.py)."""
    from functools import partial

    from mmtrack_tpu.trackers.vipt_tracker import (vipt_init_state,
                                                   vipt_track_scan,
                                                   vipt_track_step)

    model = ViPTrack(**TINY)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, None, RT.ce_keep_lens))(
        jax.random.PRNGKey(7))
    frames, gt = make_synthetic_sequence(n_frames=5, height=96, width=128,
                                         seed=19)
    state0 = jax.jit(partial(vipt_init_state, RT))(
        jnp.asarray(frames[0]), jnp.asarray(gt[0], dtype=jnp.float32))

    step = jax.jit(partial(vipt_track_step, RT, model))
    s = state0
    per_step = []
    for t in range(1, 5):
        s, b, _ = step(params, s, jnp.asarray(frames[t]))
        per_step.append(np.asarray(b))

    scan = jax.jit(partial(vipt_track_scan, RT, model))
    _, boxes, _ = scan(params, state0, jnp.asarray(frames[1:5]))
    np.testing.assert_allclose(np.asarray(boxes), np.stack(per_step), atol=1e-3)


def test_pallas_preproc_matches_reference():
    from mmtrack_tpu.ops.pallas_preproc import crop_resize_normalize_pallas
    from mmtrack_tpu.ops.crop import crop_resize_normalized
    from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

    rng = np.random.RandomState(1)
    im = jnp.asarray(rng.randint(0, 255, (120, 160, 6), np.uint8))
    mean, std = jnp.asarray(MEAN_6CH), jnp.asarray(STD_6CH)
    for box in ([40.0, 30.0, 30.0, 20.0], [-10.0, -5.0, 40.0, 30.0]):
        b = jnp.asarray(box)
        want, rf_w = crop_resize_normalized(im, b, 4.0, 64, mean, std)
        got, rf_g = crop_resize_normalize_pallas(im, b, 4.0, 64, mean, std,
                                                 interpret=True)
        assert float(rf_w) == float(rf_g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_mmtrack_crop_env_switch(monkeypatch):
    """MMTRACK_CROP selects the crop lowering inside crop_resize_normalized
    (the serving knob A/B'd by tools/ab_kernels.py crop); every impl must
    agree on the default geometry."""
    from mmtrack_tpu.ops.crop import crop_resize_normalized
    from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

    rng = np.random.RandomState(3)
    im = jnp.asarray(rng.randint(0, 255, (120, 160, 6), np.uint8))
    b = jnp.asarray([40.0, 30.0, 30.0, 20.0])
    mean, std = jnp.asarray(MEAN_6CH), jnp.asarray(STD_6CH)
    monkeypatch.delenv("MMTRACK_CROP", raising=False)
    want, rf_w = crop_resize_normalized(im, b, 4.0, 64, mean, std)
    monkeypatch.setenv("MMTRACK_CROP", "mxu")
    got, rf_g = crop_resize_normalized(im, b, 4.0, 64, mean, std)
    assert float(rf_w) == float(rf_g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)


def test_mxu_crop_matches_gather_crop():
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.randint(0, 255, (120, 160, 6), np.uint8))
    for box in ([40.0, 30.0, 30.0, 20.0],
                [-10.0, -5.0, 40.0, 30.0],
                [130.0, 95.0, 40.0, 30.0]):
        b = jnp.asarray(box)
        a, rf_a = crop_resize(im, b, 4.0, 128)
        c, rf_c = crop_resize_mxu(im, b, 4.0, 128)
        assert float(rf_a) == float(rf_c)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)
