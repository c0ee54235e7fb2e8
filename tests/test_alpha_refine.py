"""Alpha-Refine tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.models.alpha_refine import AlphaRefineNet, ARcmSeg, ARRuntime


def _setup(size=64):
    model = AlphaRefineNet(input_size=size)
    t = jnp.zeros((1, size, size, 3))
    box = jnp.asarray([[20.0, 20.0, 16.0, 16.0]])
    params = jax.jit(lambda r: model.init(r, t, box, t))(jax.random.PRNGKey(0))
    return model, params


def test_alpha_refine_forward_shapes():
    model, params = _setup()
    t = jnp.zeros((2, 64, 64, 3))
    box = jnp.asarray([[20.0, 20.0, 16.0, 16.0]] * 2)
    boxes, mask = jax.jit(lambda p: model.apply(p, t, box, t))(params)
    assert boxes.shape == (2, 4)
    # mask decoded back to input resolution (stride 8, 3 upsamples)
    assert mask.shape == (2, 64, 64)
    b = np.asarray(boxes)
    assert (b >= -1e-3).all() and (b <= 1 + 1e-3).all()


def test_arcm_seg_plugin_end_to_end():
    model, params = _setup()
    rt = ARRuntime(search_factor=2.0, input_size=64)
    ar = ARcmSeg(model, params, rt)
    frames, gt = make_synthetic_sequence(n_frames=3, height=96, width=128,
                                         channels=3)
    ar.initialize(frames[0], gt[0])
    refined, mask = ar.refine(frames[1], gt[1])
    assert len(refined) == 4 and np.isfinite(refined).all()
    # w/h can be negative at random init (corner soft-argmax may put br
    # above tl); magnitude must stay within the crop scale
    assert abs(refined[2]) < 200 and abs(refined[3]) < 200
    assert mask.shape == (96, 128)
    assert (mask >= 0).all() and (mask <= 1).all()
    assert mask.max() > 0  # crop pasted back into the frame
