"""Model tests on a tiny ViT (fast on CPU) + decode checks.

NOTE: this box has one CPU core and eager per-op dispatch is very slow, so
every init/apply is wrapped in jax.jit (compiles once, hits the persistent
compilation cache on re-runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.heads import CenterPredictor, CornerPredictor, cal_bbox
from mmtrack_tpu.models.vipt import (
    ViPTrack,
    ViTCEPrompt,
    ce_keep_schedule,
    generate_ctr_mask,
)

TINY = dict(embed_dim=32, depth=4, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1, 2))
LENS_Z, LENS_X = 4, 16


def _data(B=2):
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, 32, 32, 6).astype(np.float32))
    x = jnp.asarray(rng.randn(B, 64, 64, 6).astype(np.float32))
    return z, x


def _init_apply(model, z, x, keep=None, **apply_kwargs):
    params = jax.jit(lambda r: model.init(r, z, x, None, keep))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p, a, b: model.apply(p, a, b, None, keep, **apply_kwargs))(params, z, x)
    return params, out


@pytest.mark.parametrize("prompt_type", ["vipt_deep", "vipt_shaw", "none"])
def test_backbone_shapes_all_prompt_types(prompt_type):
    z, x = _data()
    model = ViTCEPrompt(prompt_type=prompt_type, **TINY)
    keep = ce_keep_schedule(LENS_X, (1, 2), (0.7, 0.7))
    _, out = _init_apply(model, z, x, keep)
    assert out.shape == (2, LENS_Z + LENS_X, 32)


def test_backbone_no_ce_when_lens_none():
    z, x = _data()
    model = ViTCEPrompt(prompt_type="vipt_deep", **TINY)
    _, out = _init_apply(model, z, x, None)
    assert out.shape == (2, LENS_Z + LENS_X, 32)
    # without elimination no token position is forced to zero
    assert (np.abs(np.asarray(out)).sum(axis=-1) > 0).all()


def test_backbone_ce_prunes_and_recovers_zeros():
    z, x = _data()
    keep = ce_keep_schedule(LENS_X, (1, 2), (0.5, 0.5))  # 16 -> 8 -> 4
    assert keep == (8, 4)
    model = ViTCEPrompt(prompt_type="vipt_deep", **TINY)
    _, out = _init_apply(model, z, x, keep)
    search = np.asarray(out)[:, LENS_Z:]
    zero_rows = (np.abs(search).sum(axis=-1) < 1e-9).sum(axis=1)
    # 16 - 4 = 12 pruned positions recovered as zeros
    np.testing.assert_array_equal(zero_rows, [12, 12])


def test_backbone_ctr_mask():
    assert generate_ctr_mask(2, "ALL") is None
    m = generate_ctr_mask(8, "CTR_POINT")
    assert m.shape == (1, 64)
    assert float(m.sum()) == 1.0
    assert float(m[0, 3 * 8 + 3]) == 1.0
    m2 = generate_ctr_mask(8, "CTR_REC")
    assert float(m2.sum()) == 4.0


def test_viptrack_forward_and_decode():
    z, x = _data()
    model = ViPTrack(head_channel=16, **TINY)
    keep = ce_keep_schedule(LENS_X, (1, 2), (0.7, 0.7))
    _, out = _init_apply(model, z, x, keep)
    S = 4
    assert out["score_map"].shape == (2, S, S)
    assert out["size_map"].shape == (2, S, S, 2)
    assert out["offset_map"].shape == (2, S, S, 2)
    assert out["pred_boxes"].shape == (2, 4)
    assert out["max_score"].shape == (2,)
    b = np.asarray(out["pred_boxes"])
    assert (b[:, 2:] > 0).all() and (b[:, 2:] < 1).all()
    s = np.asarray(out["score_map"])
    assert (s >= 1e-4).all() and (s <= 1 - 1e-4).all()


def test_cal_bbox_known_argmax():
    S = 4
    score = jnp.zeros((1, S, S)).at[0, 2, 1].set(1.0) + 0.01
    size = jnp.full((1, S, S, 2), 0.25)
    offset = jnp.zeros((1, S, S, 2)).at[0, 2, 1].set(jnp.array([0.5, -0.25]))
    bbox, ms = jax.jit(cal_bbox)(score, size, offset)
    np.testing.assert_allclose(np.asarray(bbox[0]),
                               [(1 + 0.5) / S, (2 - 0.25) / S, 0.25, 0.25], atol=1e-6)
    assert float(ms[0]) == pytest.approx(1.01)


def test_center_predictor_shapes():
    head = CenterPredictor(channel=16, feat_sz=4)
    x = jnp.ones((2, 4, 4, 32))
    params = jax.jit(lambda r: head.init(r, x))(jax.random.PRNGKey(0))
    score, size, offset = jax.jit(head.apply)(params, x)
    assert score.shape == (2, 4, 4)
    assert size.shape == (2, 4, 4, 2) and offset.shape == (2, 4, 4, 2)


def test_corner_predictor_decode_range():
    head = CornerPredictor(channel=16, feat_sz=4, stride=16)
    x = jnp.ones((2, 4, 4, 32))
    params = jax.jit(lambda r: head.init(r, x))(jax.random.PRNGKey(0))
    out = np.asarray(jax.jit(head.apply)(params, x))
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out <= 1).all()


def test_deep_prompt_params_exist_per_layer():
    z, x = _data(1)
    model = ViTCEPrompt(prompt_type="vipt_deep", **TINY)
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))["params"]
    prompt_keys = [k for k in params if k.startswith("prompt_blocks_")]
    assert len(prompt_keys) == TINY["depth"]
    model_s = ViTCEPrompt(prompt_type="vipt_shaw", **TINY)
    params_s = jax.jit(lambda r: model_s.init(r, z, x))(jax.random.PRNGKey(0))["params"]
    assert [k for k in params_s if k.startswith("prompt_blocks_")] == ["prompt_blocks_0"]


def test_drop_path_training_stochastic():
    z, x = _data()
    model = ViTCEPrompt(prompt_type="none", drop_path_rate=0.5, **TINY)
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    f_train = jax.jit(lambda p, a, b, r: model.apply(
        p, a, b, None, None, deterministic=False, rngs={"drop_path": r}))
    o1 = f_train(params, z, x, jax.random.PRNGKey(1))
    o2 = f_train(params, z, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    f_det = jax.jit(lambda p, a, b: model.apply(p, a, b))
    np.testing.assert_allclose(np.asarray(f_det(params, z, x)),
                               np.asarray(f_det(params, z, x)))
