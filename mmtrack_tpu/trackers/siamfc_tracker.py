"""SiamFC tracker runtime: 3-scale pyramid search, fully jitted.

Classic SiamFC OTB protocol (paper hyperparameters; the reference's siamfc
submodule is empty — readme.md:41-47): context-padded exemplar crop, 3-scale
search pyramid (1.0375^{-1,0,1}) scored in one batched correlation, scale
penalty 0.9745, cosine-window influence 0.176, response upsampled 16x for
sub-cell localization, scale smoothing lr 0.59.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.siamfc import SiamFC
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.ops.window import hann2d


@dataclass(frozen=True)
class SiamFCRuntime:
    exemplar_size: int = 127
    instance_size: int = 255
    context: float = 0.5
    num_scales: int = 3
    scale_step: float = 1.0375
    scale_penalty: float = 0.9745
    scale_lr: float = 0.59
    window_influence: float = 0.176
    response_up: int = 16
    total_stride: int = 8

    @property
    def response_sz(self) -> int:
        # (22 - 6 + 1) = 17 for the canonical 255/127 sizes
        return (self.instance_size - self.exemplar_size) // self.total_stride + 1

    @property
    def upsampled_sz(self) -> int:
        return self.response_sz * self.response_up

    @property
    def scale_factors(self) -> tuple[float, ...]:
        half = (self.num_scales - 1) / 2
        return tuple(self.scale_step ** (i - half) for i in range(self.num_scales))


def _mean_pad_crop(rt: SiamFCRuntime, frame, center_yx, crop_sz, out_size):
    """SiamFC pads crops with the per-frame channel mean, not zeros: crop with
    replicate border approximates it; the paper uses mean-pad — emulate by
    subtracting mean, zero-pad crop, re-add mean."""
    mean = frame.astype(jnp.float32).mean(axis=(0, 1))
    shifted = frame.astype(jnp.float32) - mean
    crop = crop_at(shifted, center_yx, crop_sz, out_size, border="zero")
    return crop + mean


def siamfc_init_state(rt: SiamFCRuntime, model: SiamFC, params,
                      frame: jnp.ndarray, init_box_xywh: jnp.ndarray) -> dict:
    x, y, w, h = init_box_xywh
    center = jnp.stack([y + h / 2, x + w / 2])
    target_sz = jnp.stack([h, w])

    context = rt.context * target_sz.sum()
    z_sz = jnp.sqrt(jnp.prod(target_sz + context))
    x_sz = z_sz * rt.instance_size / rt.exemplar_size

    patch = _mean_pad_crop(rt, frame, center, z_sz, rt.exemplar_size)
    z_feat = model.apply(params, (patch / 255.0)[None],
                         method=SiamFC.embed)[0]
    return {"center": center, "target_sz": target_sz,
            "z_sz": z_sz, "x_sz": x_sz, "z_feat": z_feat}


def siamfc_track_step(rt: SiamFCRuntime, model: SiamFC, params, state: dict,
                      frame: jnp.ndarray):
    H, W = frame.shape[0], frame.shape[1]
    scales = jnp.asarray(rt.scale_factors)

    patches = jax.vmap(lambda s: _mean_pad_crop(
        rt, frame, state["center"], state["x_sz"] * s, rt.instance_size))(scales)
    x_feat = model.apply(params, patches / 255.0, method=SiamFC.embed)
    responses = model.apply(params, state["z_feat"], x_feat,
                            method=SiamFC.correlate)  # (S, 17, 17)

    up = rt.upsampled_sz
    responses = jax.image.resize(responses, (rt.num_scales, up, up), "bilinear")

    # scale penalty on non-central scales
    mid = rt.num_scales // 2
    penalty = jnp.full((rt.num_scales,), rt.scale_penalty).at[mid].set(1.0)
    peak = responses.max(axis=(1, 2)) * penalty
    scale_ind = jnp.argmax(peak)
    response = responses[scale_ind]

    response = response - response.min()
    response = response / jnp.maximum(response.sum(), 1e-12)
    window = hann2d(up, up)
    window = window / window.sum()
    response = ((1 - rt.window_influence) * response
                + rt.window_influence * window)

    idx = jnp.argmax(response)
    disp = jnp.stack([idx // up, idx % up]).astype(jnp.float32) - (up - 1) / 2
    scale = scales[scale_ind]
    disp_img = disp * rt.total_stride / rt.response_up \
        * (state["x_sz"] * scale) / rt.instance_size
    center = state["center"] + disp_img
    center = jnp.clip(center, 0.0, jnp.asarray([H - 1.0, W - 1.0]))

    # scale update with damping
    new_scale = (1 - rt.scale_lr) * 1.0 + rt.scale_lr * scale
    target_sz = state["target_sz"] * new_scale
    new_state = {
        **state,
        "center": center,
        "target_sz": target_sz,
        "z_sz": state["z_sz"] * new_scale,
        "x_sz": state["x_sz"] * new_scale,
    }
    box = jnp.concatenate([
        (center - target_sz / 2)[::-1], target_sz[::-1]])
    return new_state, box, response.max()


class SiamFCTracker:
    """OO facade (BaseTracker API)."""

    def __init__(self, model: SiamFC, params, runtime: SiamFCRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or SiamFCRuntime()
        self._init_fn = jax.jit(partial(siamfc_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(siamfc_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
