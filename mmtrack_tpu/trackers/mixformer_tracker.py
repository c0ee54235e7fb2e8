"""MixFormer online tracker runtime.

Rebuild of MixFormerRGBDOnline tracking (RGBD/models/MixFormer_RGBD/
lib/test/tracker/mixformerrgbd_online.py:63-217) as a functional state +
one jitted step:
  - fixed init template + up to K online templates. The ring GROWS from 1
    to K exactly like the reference (tracker:167-183: concat while
    len < ONLINE_SIZES, then replace at the forget pointer): slots carry a
    validity count `n_online` and invalid slots are excluded from attention
    via the model's ot_mask (models/mixformer.py MixedAttention) — one
    compile, exact variable-K semantics;
  - every frame the SPM confidence nominates the best template candidate
    (pred_score > 0.5 and > decayed max, tracker:157-166), every
    `update_interval` frames the nominee enters the ring;
  - re-constraint on the predicted state: 'simple' (tracker_utils.py:
    131-143, displacement gate) or 'complex' (tracker_utils.py:146-166,
    displacement + confidence + scale-change gates against running-average
    extents, the his_w/his_h AverageMeters at tracker:60-61,93-94,154-155);
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
    online_threshold: float = 0.5  # hardcoded 0.5 at tracker:159
    max_score_decay: float = 0.98  # TEST.MAX_SCORE_DECAY
    # 'simple' | 'complex' | 'none' (TEST.RE_CONSTRAIN_TYPE,
    # baseline_large.yaml:100 deploys 'simple')
    re_constrain: str = "simple"
    conf_thr: float = 0.5          # re_constraint_complex defaults
    scale_thr: float = 1.35        # (tracker_utils.py:146)
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
    init_box = init_box.astype(jnp.float32)
    return {"box": init_box,
            "template": patch,
            # slot 0 = the init template (reference init:73); slots >=
            # n_online are padding, masked out of attention
            "online_templates": jnp.tile(patch[None], (K, 1, 1, 1)),
            "n_online": jnp.asarray(1, jnp.int32),
            "online_max_template": patch,
            "max_pred_score": jnp.asarray(-1.0),
            "forget_id": jnp.asarray(0, jnp.int32),
            "frame_num": jnp.asarray(0, jnp.int32),
            # his_w/his_h AverageMeters (tracker:60-61), seeded with the
            # init box (tracker:93-94); stored as (sum_w, sum_h, count)
            "his_sum": jnp.stack([init_box[2], init_box[3]]),
            "his_count": jnp.asarray(1.0)}


def _re_constrain(rt: MixFormerRuntime, prev, box, score, his_avg):
    """tracker_utils.py re_constraint_{simple,complex}: revert to the
    previous state on implausible jumps."""
    prev_avg_wh = (prev[2] + prev[3]) / 2
    dis = (jnp.abs(box[0] + box[2] / 2 - prev[0] - prev[2] / 2)
           + jnp.abs(box[1] + box[3] / 2 - prev[1] - prev[3] / 2))
    if rt.re_constrain == "simple":
        return jnp.where(dis > 2 * prev_avg_wh, prev, box)
    # complex (tracker_utils.py:146-166): three ordered gates
    def change(r):
        return jnp.maximum(r, 1.0 / r)

    scale_change = jnp.maximum(change(box[2] / his_avg[0]),
                               change(box[3] / his_avg[1]))
    reject = ((dis > 2 * prev_avg_wh)
              | ((dis > 1.5 * prev_avg_wh) & (score < rt.conf_thr))
              | (scale_change > rt.scale_thr))
    return jnp.where(reject, prev, box)


def _mixformer_core(rt: MixFormerRuntime, model: MixFormer, params,
                    state, search, resize_factors, im_hw, cand_fn):
    """Shared per-frame logic. `search` (S,H,W,C) + `resize_factors` (S,) are
    the (possibly multi-scale) crops; `cand_fn(box)` yields the nomination
    template patch for the post-constraint box (device crop in production,
    injected host crop in the parity harness)."""
    H, W = im_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    prev = state["box"]
    n_scales = search.shape[0]

    K = rt.online_size
    ot_mask = (jnp.arange(K) < state["n_online"])[None]
    out = model.apply(
        params,
        jnp.tile(state["template"][None], (n_scales, 1, 1, 1)),
        jnp.tile(state["online_templates"][None], (n_scales, 1, 1, 1, 1)),
        search,
        ot_mask=jnp.tile(ot_mask, (n_scales, 1)))
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
    box_raw = box

    if rt.re_constrain != "none":
        box = _re_constrain(rt, prev, box, score,
                            state["his_sum"] / state["his_count"])
    # his meters track the POST-constraint state (tracker:154-155)
    state = {**state, "box": box,
             "his_sum": state["his_sum"] + jnp.stack([box[2], box[3]]),
             "his_count": state["his_count"] + 1.0}

    # online-template nomination (tracker:155-166)
    max_score = state["max_pred_score"] * rt.max_score_decay
    cand = cand_fn(box)
    nominate = (score > rt.online_threshold) & (score > max_score)
    state = {
        **state,
        "online_max_template": jnp.where(nominate, cand,
                                         state["online_max_template"]),
        "max_pred_score": jnp.where(nominate, score, max_score),
    }

    # ring update at the interval (tracker:167-183): concat while the ring
    # is not full (slot = n_online, forget pointer unchanged), then replace
    # at the forget pointer
    at_interval = (state["frame_num"] % rt.update_interval) == 0
    n = state["n_online"]
    growing = n < K
    slot = jnp.where(growing, n, state["forget_id"])
    new_ring = jax.lax.dynamic_update_index_in_dim(
        state["online_templates"], state["online_max_template"], slot, 0)
    state = {
        **state,
        "online_templates": jnp.where(at_interval, new_ring,
                                      state["online_templates"]),
        "n_online": jnp.where(at_interval & growing, n + 1, n),
        "forget_id": jnp.where(at_interval & ~growing,
                               (state["forget_id"] + 1) % K,
                               state["forget_id"]),
        "max_pred_score": jnp.where(at_interval, -1.0,
                                    state["max_pred_score"]),
        "online_max_template": jnp.where(at_interval, state["template"],
                                         state["online_max_template"]),
    }
    aux = {"nominate": nominate, "at_interval": at_interval,
           "box_raw": box_raw, "pred_score": score}
    return state, box, score, aux


def mixformer_track_step(rt: MixFormerRuntime, model: MixFormer, params,
                         state, frame):
    """Production step: device crops for the search scales and the
    nomination candidate."""
    H, W = frame.shape[0], frame.shape[1]
    mean, std = _mean_std(frame.shape[-1])
    prev = state["box"]

    crops, rfs = [], []
    for sf in rt.scale_factors:
        crop, rf = crop_resize_normalized(
            frame, prev, rt.search_factor * sf, rt.search_size, mean, std)
        crops.append(crop)
        rfs.append(rf)

    def cand_fn(box):
        return crop_resize_normalized(frame, box, rt.template_factor,
                                      rt.template_size, mean, std)[0]

    state, box, score, _ = _mixformer_core(
        rt, model, params, state, jnp.stack(crops), jnp.stack(rfs),
        (float(H), float(W)), cand_fn)
    return state, box, score


def mixformer_step_from_patch(rt: MixFormerRuntime, model: MixFormer, params,
                              state, search, resize_factor, cand, im_hw):
    """Parity-harness step: single-scale host-cropped `search` patch
    (normalized, (H,W,C)), host resize factor, and an injected nomination
    candidate patch (the harness crops it at the reference's box and
    byte-compares the raw crops separately)."""
    return _mixformer_core(rt, model, params, state, search[None],
                           jnp.asarray(resize_factor)[None], im_hw,
                           lambda box: cand)


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
