"""VOT toolkit entry (vipt_baseline.py analog): launched by `vot evaluate`
per sequence via trackers.ini protocol=traxpython.

Select the tracker with MMTRACK_TRACKER (default vipt_deep_rgbd) and the
composition with MMTRACK_DTYPE (rgbcolormap for RGBD stacks, rgbrgb for
RGBT; recipes carry their default in the registry). MMTRACK_MASK=1 switches
to the VOT2020+ mask protocol with Alpha-Refine segmentation
(MIXFORMER_ALPHA_SEG / promix_vot2022_rgbd.py pattern); point
MMTRACK_AR_CKPT at converted ARcm_seg weights (random init otherwise).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmtrack_tpu.eval.vot import run_vot_exp
from mmtrack_tpu.registry import TRACKER_REGISTRY, build_tracker

name = os.environ.get("MMTRACK_TRACKER", "vipt_deep_rgbd")
recipe = TRACKER_REGISTRY.get(name)
default_dtype = recipe.composition if recipe else "rgbcolormap"
dtype = os.environ.get("MMTRACK_DTYPE", default_dtype)
channels = os.environ.get("MMTRACK_CHANNELS", "rgbd")
mask = os.environ.get("MMTRACK_MASK", "0") == "1"


def _refiner():
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.models.alpha_refine import AlphaRefineNet, ARcmSeg

    model = AlphaRefineNet()
    ckpt = os.environ.get("MMTRACK_AR_CKPT")
    if ckpt:
        import numpy as np

        params = jax.tree.map(jnp.asarray, dict(np.load(ckpt, allow_pickle=True)))
    else:
        z = jnp.zeros((1, 256, 256, 3))
        params = jax.jit(lambda r: model.init(
            r, z, jnp.asarray([[64.0, 64.0, 128.0, 128.0]]), z))(
            jax.random.PRNGKey(0))
    return ARcmSeg(model, params)


run_vot_exp(lambda: build_tracker(name), channels=channels, dtype=dtype,
            mask=mask, refine_factory=_refiner if mask else None)
