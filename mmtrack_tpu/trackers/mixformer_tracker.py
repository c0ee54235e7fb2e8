"""MixFormer online tracker runtime.

Rebuild of MixFormerRGBDOnline tracking (RGBD/models/MixFormer_RGBD/
lib/test/tracker/mixformerrgbd_online.py:63-217) as a functional state +
one jitted step:
  - fixed init template + K online templates (TEST.ONLINE_SIZES, a ring
    buffer with forget pointer; the reference grows from 1 to K, here the
    ring starts filled with the init template — same attention targets
    once warm);
  - every frame the SPM confidence nominates the best template candidate
    (pred_score > 0.5 and > decayed max), every `update_interval` frames
    the nominee enters the ring (tracker lines 157-183);
  - re-constraint on the predicted state (tracker_utils.py:131-143
    re_constraint_simple) suppressing implausible jumps;
  - SAMF (RGBD/models/SAMF): several search scales in one batched forward,
    most-confident scale wins; (1.0,) recovers plain MixFormer.
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
    search_factor: float = 5.0     # TEST.SEARCH_FACTOR (config.py:107)
    search_size: int = 320
    margin: float = 10.0
    # baseline_large.yaml VOT2022RGBD deployment: UPDATE_INTERVALS [10],
    # ONLINE_SIZES [5], MAX_SCORE_DECAY 0.98
    update_interval: int = 10
    online_size: int = 5
    online_threshold: float = 0.5
    max_score_decay: float = 0.98  # TEST.MAX_SCORE_DECAY
    # 'simple' | 'none' (TEST.RE_CONSTRAIN_TYPE, baseline_large.yaml:100)
    re_constrain: str = "simple"
    # SAMF (Scale-Adaptive MixFormer): extra search-window scales evaluated
    # in the same batched forward; (1.0,) == plain MixFormer.
    scale_factors: tuple[float, ...] = (1.0,)


def _mean_std(channels: int):
    return (jnp.asarray(MEAN_6CH[:channels]), jnp.asarray(STD_6CH[:channels]))


def mixformer_init_state(rt: MixFormerRuntime, model: MixFormer, params,
                         frame, init_box):
    mean, std = _mean_std(frame.shape[-1])
    patch, _ = crop_resize_normalized(frame, init_box, rt.template_factor,
                                      rt.template_size, mean, std)
    K = rt.online_size
    return {"box": init_box.astype(jnp.float32),
            "template": patch,
            "online_templates": jnp.tile(patch[None], (K, 1, 1, 1)),
            "online_max_template": patch,
            "max_pred_score": jnp.asarray(-1.0),
            "forget_id": jnp.asarray(0, jnp.int32),
            "frame_num": jnp.asarray(0, jnp.int32)}


def mixformer_track_step(rt: MixFormerRuntime, model: MixFormer, params,
                         state, frame):
    H, W = frame.shape[0], frame.shape[1]
    mean, std = _mean_std(frame.shape[-1])
    state = {**state, "frame_num": state["frame_num"] + 1}
    prev = state["box"]

    n_scales = len(rt.scale_factors)
    crops, rfs = [], []
    for sf in rt.scale_factors:
        crop, rf = crop_resize_normalized(
            frame, prev, rt.search_factor * sf, rt.search_size, mean, std)
        crops.append(crop)
        rfs.append(rf)
    search = jnp.stack(crops)                        # (S, H, W, C)
    resize_factors = jnp.stack(rfs)

    out = model.apply(
        params,
        jnp.tile(state["template"][None], (n_scales, 1, 1, 1)),
        jnp.tile(state["online_templates"][None], (n_scales, 1, 1, 1, 1)),
        search)
    best = jnp.argmax(out["pred_scores"])
    pred = out["pred_boxes"][best]
    score = out["pred_scores"][best]
    resize_factor = resize_factors[best]

    # map_box_back (tracker:202-208) + clip_box(margin=10)
    pred_img = pred * rt.search_size / resize_factor
    half_side = 0.5 * rt.search_size / resize_factor
    cx = pred_img[0] + (prev[0] + 0.5 * prev[2] - half_side)
    cy = pred_img[1] + (prev[1] + 0.5 * prev[3] - half_side)
    box = jnp.stack([cx - 0.5 * pred_img[2], cy - 0.5 * pred_img[3],
                     pred_img[2], pred_img[3]])
    box = clip_box(box, float(H), float(W), margin=rt.margin)

    if rt.re_constrain == "simple":
        # suppress displacement > 2x previous mean extent (tracker_utils.py:131)
        prev_avg_wh = (prev[2] + prev[3]) / 2
        dis = (jnp.abs(box[0] + box[2] / 2 - prev[0] - prev[2] / 2)
               + jnp.abs(box[1] + box[3] / 2 - prev[1] - prev[3] / 2))
        box = jnp.where(dis > 2 * prev_avg_wh, prev, box)
    state = {**state, "box": box}

    # online-template nomination (tracker:155-166)
    max_score = state["max_pred_score"] * rt.max_score_decay
    cand, _ = crop_resize_normalized(frame, box, rt.template_factor,
                                     rt.template_size, mean, std)
    nominate = (score > rt.online_threshold) & (score > max_score)
    state = {
        **state,
        "online_max_template": jnp.where(nominate, cand,
                                         state["online_max_template"]),
        "max_pred_score": jnp.where(nominate, score, max_score),
    }

    # ring update at the interval (tracker:167-183)
    at_interval = (state["frame_num"] % rt.update_interval) == 0
    K = rt.online_size
    slot = state["forget_id"]
    new_ring = state["online_templates"].at[slot].set(state["online_max_template"])
    state = {
        **state,
        "online_templates": jnp.where(at_interval, new_ring,
                                      state["online_templates"]),
        "forget_id": jnp.where(at_interval, (slot + 1) % K, slot),
        "max_pred_score": jnp.where(at_interval, -1.0,
                                    state["max_pred_score"]),
        "online_max_template": jnp.where(at_interval, state["template"],
                                         state["online_max_template"]),
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
