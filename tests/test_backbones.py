"""Auxiliary backbones + attention variants + MLP head + generic GN-SD.

Covers the SURVEY.md §2 tail items: MobileNetV3 / resnet18_vggm backbones
(DeT/ltr/models/backbone/), RPE + talking-heads attention
(ViPT/lib/models/layers/{attn,rpe}.py), the MLP box head (head.py:204-230),
and the generic steepest-descent meta-optimizer
(DeT/ltr/models/meta/steepestdescent.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.backbones import (
    MobileNetV3,
    ResNetVGGm1,
    _vggm_lrn,
    h_sigmoid,
    h_swish,
)
from mmtrack_tpu.models.heads import MLPHead
from mmtrack_tpu.models.layers import Attention, AttentionTalkingHead, rpe_index_concat
from mmtrack_tpu.ops.optimization import steepest_descent_gn


def test_mobilenetv3_feature_pyramid_shapes():
    model = MobileNetV3()
    x = jnp.zeros((2, 64, 64, 3))
    layers = ("layer2", "layer3", "layer4", "out_conv1")
    params = jax.jit(lambda r: model.init(r, x, out_layers=layers))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, x, out_layers=layers))(params)
    # strides/channels per mobilenetv3.py LARGE table
    assert out["layer2"].shape == (2, 16, 16, 24)    # stride 4
    assert out["layer3"].shape == (2, 8, 8, 40)      # stride 8
    assert out["layer4"].shape == (2, 4, 4, 80)      # stride 16
    assert out["out_conv1"].shape == (2, 2, 2, 960)  # stride 32
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_resnet18_vggm_outputs():
    model = ResNetVGGm1()
    x = jnp.zeros((1, 64, 64, 3))
    layers = ("vggconv1", "conv1", "layer2", "layer3")
    params = jax.jit(lambda r: model.init(r, x, out_layers=layers))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, x, out_layers=layers))(params)
    assert out["vggconv1"].shape == (1, 32, 32, 96)  # 7x7/2 VGG-M tap
    assert out["conv1"].shape == (1, 32, 32, 64)
    assert out["layer2"].shape == (1, 8, 8, 128)     # stride 8
    assert out["layer3"].shape == (1, 4, 4, 256)     # stride 16


def test_vggm_lrn_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 3, 8).astype(np.float32)
    got = np.asarray(_vggm_lrn(jnp.asarray(x)))
    # naive: centered mean of squares over 5 channels (zero-padded), torch
    # SpatialCrossMapLRN(5, 0.0005, 0.75, 2) semantics
    want = np.empty_like(x)
    for c in range(8):
        lo, hi = max(0, c - 2), min(8, c + 3)
        win = (x[..., lo:hi] ** 2).sum(-1) / 5.0
        want[..., c] = x[..., c] / (2.0 + 0.0005 * win) ** 0.75
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hard_activations():
    x = jnp.asarray([-4.0, -1.0, 0.0, 2.0, 5.0])
    np.testing.assert_allclose(h_sigmoid(x), [0, 1 / 3, 0.5, 5 / 6, 1.0],
                               rtol=1e-6)
    np.testing.assert_allclose(h_swish(x), np.asarray(x) * h_sigmoid(x),
                               rtol=1e-6)


def test_rpe_index_concat_properties():
    idx = rpe_index_concat(2, 4)
    n = 2 * 2 + 4 * 4
    assert idx.shape == (n, n)
    # same (dh, dw, origins) -> same bucket: search tokens 0 and 5 relative
    # to themselves share (0,0,search,search)
    zlen = 4
    assert idx[zlen, zlen] == idx[zlen + 5, zlen + 5]
    # template-template zero-diff differs from search-search zero-diff
    assert idx[0, 0] != idx[zlen, zlen]
    assert idx.min() == 0


def test_attention_rpe_bias_changes_output():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2 * 2 + 4 * 4, 16),
                    jnp.float32)
    plain = Attention(dim=16, num_heads=4)
    rpe = Attention(dim=16, num_heads=4, rpe=True, z_size=2, x_size=4)
    p1 = plain.init(jax.random.PRNGKey(0), x)
    p2 = rpe.init(jax.random.PRNGKey(0), x)
    assert "relative_position_bias_table" in p2["params"]
    o1, _ = plain.apply(p1, x)
    # seed a non-zero bias table so the bias actually shows up
    table = p2["params"]["relative_position_bias_table"]
    p2 = jax.tree.map(lambda a: a, p2)
    p2["params"]["relative_position_bias_table"] = jnp.ones_like(table) * jnp.arange(
        table.shape[1]) / table.shape[1]
    o2, _ = rpe.apply(p2, x)
    assert o1.shape == o2.shape == x.shape
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_talking_head_attention_forward():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 2 * 2 + 4 * 4, 16),
                    jnp.float32)
    attn = AttentionTalkingHead(dim=16, num_heads=4, z_size=2, x_size=4)
    params = attn.init(jax.random.PRNGKey(0), x)
    assert "proj_l" in params["params"] and "proj_w" in params["params"]
    out = attn.apply(params, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_mlp_head_matches_reference_topology():
    head = MLPHead(hidden_dim=8, out_dim=4, num_layers=3)
    x = jnp.ones((2, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    # 3 linear layers named layers_{0,1,2}: 8->8->8->4 (head.py:210-216)
    assert set(params["params"]) == {"layers_0", "layers_1", "layers_2"}
    assert params["params"]["layers_2"]["kernel"].shape == (8, 4)
    assert head.apply(params, x).shape == (2, 4)


def test_vipt_head_type_variants():
    from mmtrack_tpu.models.vipt import ViPTrack

    for head_type in ("CORNER", "MLP"):
        model = ViPTrack(embed_dim=32, depth=1, num_heads=2, patch_size=16,
                         template_size=32, search_size=64, ce_loc=(),
                         prompt_type="none", head_channel=8,
                         head_type=head_type)
        z = jnp.zeros((1, 32, 32, 3))
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), z, x, None, None)
        out = model.apply(params, z, x, None, None)
        box = np.asarray(out["pred_boxes"])
        assert box.shape == (1, 4) and np.isfinite(box).all()
        # centers stay inside the crop; w/h can be slightly negative for
        # CORNER at random init (soft-argmax br may land above tl)
        assert (box[:, :2] >= 0).all() and (box[:, :2] <= 1).all()

        # the tracker must decode pred_boxes for these heads (caught live:
        # it windowed the placeholder score_map, yielding a degenerate
        # center box every frame)
        from mmtrack_tpu.trackers.vipt_tracker import (ViPTRuntime,
                                                       vipt_init_state,
                                                       vipt_track_step)
        rt = ViPTRuntime(template_size=32, search_size=64, stride=16,
                         ce_loc=(), ce_keep_ratio=())
        frame = (np.random.RandomState(1).rand(96, 128, 3) * 255).astype(np.uint8)
        st = vipt_init_state(rt, jnp.asarray(frame),
                             jnp.asarray([40.0, 30.0, 24.0, 20.0]))
        st, box1, _ = jax.jit(lambda s, f: vipt_track_step(rt, model, params,
                                                           s, f))(
            st, jnp.asarray(frame))
        box1 = np.asarray(box1)
        assert np.isfinite(box1).all()
        # a degenerate decode gives w=h=0 at the crop center
        assert not np.allclose(box1[2:], 0.0, atol=1e-3)

        if head_type == "MLP":
            # round-4: MLP recipes report a real confidence — the
            # template->search correlation peak — not a constant. It must
            # be a probability over the 16 search tokens and must vary
            # with input content (F-score threshold sweeps need a
            # monotone, non-degenerate signal).
            n_tok = (64 // 16) ** 2
            rng2 = np.random.RandomState(2)
            xs = jnp.asarray(rng2.rand(2, 64, 64, 3), jnp.float32)
            zs = jnp.asarray(rng2.rand(2, 32, 32, 3), jnp.float32)
            out2 = model.apply(params, zs, xs, None, None)
            s = np.asarray(out2["max_score"], np.float64)
            assert (s > 1.0 / n_tok - 1e-6).all() and (s <= 1.0 + 1e-6).all()
            assert abs(s[0] - s[1]) > 1e-9, "confidence is constant"
            sm = np.asarray(out2["score_map"], np.float64)
            assert np.allclose(sm.reshape(2, -1).sum(1), 1.0, atol=2e-2)


def test_steepest_descent_gn_solves_least_squares():
    # residual(x) = A x - b: GN-SD must drive the quadratic loss down and
    # approach the lstsq solution
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(12, 4), jnp.float32)
    b = jnp.asarray(rng.randn(12), jnp.float32)

    def residual(x):
        return A @ x - b

    x0 = jnp.zeros(4)
    x = jax.jit(lambda x: steepest_descent_gn(residual, x, num_iter=60))(x0)
    x_star, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    loss0 = float(jnp.sum(residual(x0) ** 2))
    loss = float(jnp.sum(residual(x) ** 2))
    # the optimum of an overdetermined lstsq is far above zero (~(m-n)/m of
    # loss0); measure convergence as excess-loss reduction toward it
    loss_star = float(np.sum((np.asarray(A) @ x_star - np.asarray(b)) ** 2))
    assert loss - loss_star < 0.05 * (loss0 - loss_star)
    assert loss < loss_star * 1.05 + 1e-4


def test_steepest_descent_gn_pytree_and_batched():
    rng = np.random.RandomState(1)
    A1 = jnp.asarray(rng.randn(3, 8, 2), jnp.float32)  # batch of 3 problems
    b1 = jnp.asarray(rng.randn(3, 8), jnp.float32)

    def residual(tree):
        return jnp.einsum("bij,bj->bi", A1, tree["w"]) - b1

    x0 = {"w": jnp.zeros((3, 2))}
    x = steepest_descent_gn(residual, x0, num_iter=40, batch_dims=1)
    loss = np.asarray(jnp.sum(residual(x) ** 2, axis=-1))
    # per-problem optimum via lstsq; each batch element must reach it
    for i in range(3):
        w_star, *_ = np.linalg.lstsq(np.asarray(A1[i]), np.asarray(b1[i]),
                                     rcond=None)
        loss_star = np.sum((np.asarray(A1[i]) @ w_star - np.asarray(b1[i])) ** 2)
        assert loss[i] < loss_star * 1.05 + 1e-4


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))


def test_corner_head_confidence_tracks_peak_sharpness():
    """CORNER-head confidence is the geometric mean of the corner
    distributions' peak probabilities (our design; the reference's corner
    confidence path is dead code — see models/vipt.py). It must be a real
    in-(0,1] signal that increases with sharper corner evidence, so
    F-score threshold sweeps are meaningful."""
    from mmtrack_tpu.models.vipt import ViPTrack

    model = ViPTrack(embed_dim=32, depth=1, num_heads=2, patch_size=16,
                     template_size=32, search_size=64, ce_loc=(),
                     prompt_type="none", head_channel=8, head_type="CORNER")
    z = jnp.zeros((1, 32, 32, 3))
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), z, x, None, None)

    rng = np.random.RandomState(0)
    scores = []
    for _ in range(4):
        xi = jnp.asarray(rng.uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32))
        out = model.apply(params, z, xi, None, None)
        s = float(out["max_score"][0])
        assert 0.0 < s <= 1.0
        # score_map is the tl distribution, not a uniform placeholder
        sm = np.asarray(out["score_map"][0])
        assert sm.std() > 0
        np.testing.assert_allclose(sm.sum(), 1.0, rtol=1e-5)
        scores.append(s)
    # a real signal varies across inputs (constant 1.0 was the old bug)
    assert np.std(scores) > 0
