"""MixFormer online tracker runtime.

Rebuild of MixFormerOnlineScore tracking (RGBD/models/MixFormer_RGBD/
lib/test/tracker/ + mixformerrgbd_online.py:771-894): fixed init template +
online template; every `update_interval` frames the current prediction's
template candidate is scored by the SPM decoder and becomes the online
template if its confidence beats the stored one. RGBD variant feeds
6-channel input.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.mixformer import MixFormer
from mmtrack_tpu.ops.box import clip_box
from mmtrack_tpu.ops.crop import crop_resize_normalized
from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH


@dataclass(frozen=True)
class MixFormerRuntime:
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 4.5
    search_size: int = 320
    margin: float = 10.0
    update_interval: int = 200
    online_threshold: float = 0.5
    # SAMF (Scale-Adaptive MixFormer, RGBD/models/SAMF): evaluate several
    # search-window scales in one batched forward and keep the most
    # confident; (1.0,) recovers plain MixFormer.
    scale_factors: tuple[float, ...] = (1.0,)


def _mean_std(channels: int):
    return (jnp.asarray(MEAN_6CH[:channels]), jnp.asarray(STD_6CH[:channels]))


def mixformer_init_state(rt: MixFormerRuntime, model: MixFormer, params,
                         frame, init_box):
    mean, std = _mean_std(frame.shape[-1])
    patch, _ = crop_resize_normalized(frame, init_box, rt.template_factor,
                                      rt.template_size, mean, std)
    return {"box": init_box.astype(jnp.float32),
            "template": patch, "online_template": patch,
            "online_score": jnp.asarray(0.0),
            "frame_num": jnp.asarray(1, jnp.int32)}


def mixformer_track_step(rt: MixFormerRuntime, model: MixFormer, params,
                         state, frame):
    H, W = frame.shape[0], frame.shape[1]
    mean, std = _mean_std(frame.shape[-1])
    state = {**state, "frame_num": state["frame_num"] + 1}

    n_scales = len(rt.scale_factors)
    crops, rfs = [], []
    for sf in rt.scale_factors:
        crop, rf = crop_resize_normalized(
            frame, state["box"], rt.search_factor * sf, rt.search_size,
            mean, std)
        crops.append(crop)
        rfs.append(rf)
    search = jnp.stack(crops)                        # (S, H, W, C)
    resize_factors = jnp.stack(rfs)
    out = model.apply(params,
                      jnp.tile(state["template"][None], (n_scales, 1, 1, 1)),
                      jnp.tile(state["online_template"][None], (n_scales, 1, 1, 1)),
                      search)
    best = jnp.argmax(out["pred_scores"])
    pred = out["pred_boxes"][best]
    score = out["pred_scores"][best]
    resize_factor = resize_factors[best]

    pred_img = pred * rt.search_size / resize_factor
    prev = state["box"]
    half_side = 0.5 * rt.search_size / resize_factor
    cx = pred_img[0] + (prev[0] + 0.5 * prev[2] - half_side)
    cy = pred_img[1] + (prev[1] + 0.5 * prev[3] - half_side)
    box = jnp.stack([cx - 0.5 * pred_img[2], cy - 0.5 * pred_img[3],
                     pred_img[2], pred_img[3]])
    box = clip_box(box, float(H), float(W), margin=rt.margin)
    state = {**state, "box": box}

    # online template selection by SPM confidence at the update interval
    cand, _ = crop_resize_normalized(frame, box, rt.template_factor,
                                     rt.template_size, mean, std)
    at_interval = (state["frame_num"] % rt.update_interval) == 0
    better = score > jnp.maximum(state["online_score"], rt.online_threshold)
    take = at_interval & better
    state = {
        **state,
        "online_template": jnp.where(take, cand, state["online_template"]),
        "online_score": jnp.where(take, score,
                                  jnp.where(at_interval, 0.0, state["online_score"])),
    }
    return state, box, score


class MixFormerTracker:
    """OO facade (BaseTracker API)."""

    def __init__(self, model: MixFormer, params,
                 runtime: MixFormerRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or MixFormerRuntime()
        self._init_fn = jax.jit(partial(mixformer_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(mixformer_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
