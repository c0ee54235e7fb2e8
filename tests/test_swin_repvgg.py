"""Swin-Tiny + RepVGG backbones and their STARK wiring
(SPT/lib/models/stark/{swin_transformer,repvgg,backbone}.py rebuilds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.repvgg import RepVGG, fuse_repvgg_params, repvgg_a0
from mmtrack_tpu.models.swin import (
    SwinTransformer,
    _relative_position_index,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
    swin_tiny,
)


def test_repvgg_a0_stage_shapes():
    model = repvgg_a0()
    x = jnp.zeros((1, 64, 64, 3))
    layers = ("stage0", "stage2", "stage3", "stage4")
    params = jax.jit(lambda r: model.init(r, x, out_layers=layers))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, x, out_layers=layers))(params)
    assert out["stage0"].shape == (1, 32, 32, 48)   # stride 2, 64*0.75
    assert out["stage2"].shape == (1, 8, 8, 96)     # stride 8, 128*0.75
    assert out["stage3"].shape == (1, 4, 4, 192)    # stride 16 (STARK tap)
    assert out["stage4"].shape == (1, 2, 2, 1280)   # stride 32, 512*2.5


def test_repvgg_deploy_fusion_equivalence():
    # the algebraic 3-branch -> single-conv fusion must preserve the forward
    # (switch_to_deploy, repvgg.py:138-195)
    train_model = RepVGG(num_blocks=(2, 2, 2, 1), width=(0.75, 0.75, 0.75, 2.5))
    deploy_model = RepVGG(num_blocks=(2, 2, 2, 1), width=(0.75, 0.75, 0.75, 2.5),
                          deploy=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    params = train_model.init(jax.random.PRNGKey(1), x)
    # random BN stats so the fusion is non-trivial
    rng = np.random.RandomState(2)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype), params)
    y_train = jax.jit(lambda p: train_model.apply(
        p, x, out_layers=("stage4",)))(params)["stage4"]
    fused = fuse_repvgg_params(params)
    y_deploy = jax.jit(lambda p: deploy_model.apply(
        p, x, out_layers=("stage4",)))(fused)["stage4"]
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_deploy),
                               rtol=2e-4, atol=2e-4)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 14, 21, 8), jnp.float32)
    w = _window_partition(x, 7)
    assert w.shape == (2 * 2 * 3, 49, 8)
    back = _window_reverse(w, 7, 2, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_and_mask():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49) and idx.max() == 13 * 13 - 1
    assert idx[0, 0] == idx[48, 48]  # zero displacement shares one bucket
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m[0] == 0).all()  # interior window unmasked


def test_swin_tiny_stage_shapes():
    model = swin_tiny()
    x = jnp.zeros((1, 64, 64, 3))
    layers = ("stage0", "stage2", "stage3")
    params = jax.jit(lambda r: model.init(r, x, out_layers=layers))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, x, out_layers=layers))(params)
    assert out["stage0"].shape == (1, 16, 16, 96)   # stride 4
    assert out["stage2"].shape == (1, 4, 4, 384)    # stride 16 (STARK tap)
    assert out["stage3"].shape == (1, 2, 2, 768)    # stride 32
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


@pytest.mark.parametrize("backbone_type", ["repvgg_a0", "swin_tiny"])
def test_stark_with_alternate_backbone(backbone_type):
    from mmtrack_tpu.models.stark import STARK

    model = STARK(template_size=64, search_size=64, dim=32, heads=2,
                  enc_layers=1, dec_layers=1, backbone_type=backbone_type)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, z, x))(params)
    box = np.asarray(out["pred_boxes"])
    assert box.shape == (1, 4) and np.isfinite(box).all()


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
