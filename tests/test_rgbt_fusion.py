"""DAFNet/MaCNet + ScoreTransformer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.rgbt_fusion import DAFNet, MaCNet
from mmtrack_tpu.models.vipt import ScoreTransformer
from mmtrack_tpu.registry import build_tracker, list_trackers
from mmtrack_tpu.trackers.mdnet_tracker import MDNetRuntime, MDNetTracker


def test_dafnet_macnet_forward():
    x = jnp.zeros((2, 107, 107, 6))
    for cls in (DAFNet, MaCNet):
        model = cls()
        params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))
        out = jax.jit(lambda p: model.apply(p, x))(params)
        assert out.shape == (2, 2)
        feats = model.apply(params, x, method=type(model).extract_features)
        assert feats.shape[0] == 2 and feats.shape[1] == 1


def test_dafnet_runs_mdnet_protocol():
    rt = MDNetRuntime(n_init_pos=32, n_init_neg=64, init_iters=2,
                      update_iters=1, batch_test=32, n_samples=32, batch_pos=4,
                      batch_neg=8, batch_neg_cand=32, n_pos_update=4,
                      n_neg_update=8, n_frames_long=4, n_frames_short=2,
                      n_bbreg=16, long_interval=2)
    model = DAFNet()
    x = jnp.zeros((1, 107, 107, 6))
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))
    frames, gt = make_synthetic_sequence(n_frames=3, height=120, width=160)
    tracker = MDNetTracker(model, params, rt)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    out = tracker.track(frames[1])
    assert np.isfinite(out["target_bbox"]).all()


def test_score_transformer():
    head = ScoreTransformer(d_model=32, n_layers=2, n_heads=2)
    tokens = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32)
                         .astype(np.float32))
    box = jnp.asarray([[0.4, 0.5, 0.2, 0.3], [0.1, 0.1, 0.05, 0.08]])
    params = head.init(jax.random.PRNGKey(0), tokens, box)
    s = head.apply(params, tokens, box)
    assert s.shape == (2,)
    assert ((np.asarray(s) > 0) & (np.asarray(s) < 1)).all()
    # score depends on the box token
    s2 = head.apply(params, tokens, box + 0.2)
    assert not np.allclose(np.asarray(s), np.asarray(s2))


def test_registry_includes_rgbt_zoo():
    names = list_trackers()
    for n in ("apfnet", "dafnet", "macnet", "pyvital"):
        assert n in names
