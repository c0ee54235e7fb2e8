"""Registry smoke: every entry constructs; light ones track a frame."""

import numpy as np
import pytest

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.registry import TRACKER_REGISTRY, build_tracker, list_trackers


def test_registry_surface():
    names = list_trackers()
    # the reference's tracker surface, by family
    for required in ("vipt_deep_rgbd", "vipt_deep_rgbt", "vipt_deep_rgbe",
                     "ostrack", "dimp50", "det_dimp50_max", "mfdimp",
                     "siamfc", "pymdnet", "manet", "stark_s", "stark_st",
                     "spt", "mixformer_rgbd", "kys", "lwl"):
        assert required in names
    assert "vipt_deep_rgbt" in list_trackers("rgbt")
    assert "vipt_deep_rgbt" not in list_trackers("rgbd")
    with pytest.raises(KeyError):
        build_tracker("nope")


@pytest.mark.slow
def test_registry_siamfc_tracks():
    tracker = build_tracker("siamfc")
    frames, gt = make_synthetic_sequence(n_frames=3, height=160, width=200)
    tracker.initialize(frames[0], {"init_bbox": gt[0].tolist()})
    out = tracker.track(frames[1])
    assert np.isfinite(out["target_bbox"]).all()


def test_new_recipe_models_trace_at_registry_shapes():
    """The kys/lwl/stm registry builders construct full-size models; trace
    their init (jax.eval_shape - no compute) at the exact shapes the
    builders use so a shape bug can't hide behind the small-config
    end-to-end tests."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.models.kys import build_kysnet
    from mmtrack_tpu.models.lwl import build_lwl_paper
    from mmtrack_tpu.models.stm import build_stm

    kys = build_kysnet()
    im = jnp.zeros((1, 288, 288, 3))
    bb = jnp.zeros((1, 4))
    props = jnp.zeros((1, 2, 4))
    shapes = jax.eval_shape(
        lambda k: kys.init(k, im, im, bb, props, method="init_forward"),
        jax.random.PRNGKey(0))
    assert "predictor" in shapes["params"] and "dimp" in shapes["params"]

    lwl = build_lwl_paper()
    f = jnp.zeros((1, 480, 480, 3))
    m = jnp.zeros((1, 480, 480))
    shapes = jax.eval_shape(lambda k: lwl.init(k, f, f, m),
                            jax.random.PRNGKey(0))
    assert "decoder" in shapes["params"]
    # paper scale: 16 filters of size 3 over 512-d features
    stm = build_stm()
    f = jnp.zeros((1, 384, 384, 3))
    m = jnp.zeros((1, 384, 384))
    shapes = jax.eval_shape(lambda k: stm.init(k, f, m),
                            jax.random.PRNGKey(0))
    assert "encoder_m" in shapes["params"] and "encoder_q" in shapes["params"]
