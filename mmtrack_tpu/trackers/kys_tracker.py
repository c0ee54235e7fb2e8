"""KYS online tracker — DiMP runtime + scene-propagation fusion, on device.

Rebuild of the keep_track fork's KYS tracker loop
(RGBD/models/keep_track_vot2021/pytracking/tracker/kys/dimp_motion.py:35-409)
on top of the DiMP runtime in trackers/dimp_tracker.py. Per tracked frame,
in ONE jitted step:

  - DiMP classification, score trimmed to the 18x18 feature grid
    (classify_target, dimp_motion.py:240-245),
  - previous-frame motion feature / GRU-state alignment: center-shift when
    the target left the central region, else the sub-pixel rounding shift
    (get_response_prediction, dimp_motion.py:272-321) — both are the SAME
    bilinear resample with different translation vectors, so the branch is
    one masked select feeding one shift,
  - the half-pixel fix_coordinate_shift on the DiMP score in / response out
    (PredictorWrapper, motion_predictor.py:168-235),
  - cost volume + ResponsePredictor fusion (models/kys.py),
  - fused-score localization with the peak-offset fallback to the DiMP peak
    and DiMP-score hard-negative mining (localize_target +
    compute_target_location + perform_hn_mining_dimp,
    dimp_motion.py:323-409),
  - the standard DiMP IoUNet refinement / memory / filter re-optimization
    (shared helpers from trackers/dimp_tracker.py).

The GRU state starts invalid: on the first tracked frame the predictor
derives it from the stored init Gaussian label
(init_hidden_state_predictor; state_prev None path in
resp_predictor.py:493-498) — encoded here as a `gru_valid` flag so the
whole loop stays one static-shape compiled step.

The reference ships NO parameter file for KYS (pytracking/parameter/ has
only keep_track + alpha_refine): constants below are the tracker code's own
`params.get` defaults on the DiMP-50 base geometry, with the toggles the
KYS method requires (windowing, center/sub-pixel alignment, hard-negative
mining, occlusion state reset — Bhat et al., ECCV 2020) enabled.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.kys import (KYSNet, center_shift_translation,
                                    shift_features)
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.ops.window import gauss_label_2d, hann2d
from mmtrack_tpu.trackers.dimp_tracker import (DiMPRuntime, _get_iounet_box,
                                               _max2d, _normalize,
                                               _refine_box, _sample_geometry,
                                               _update_memory,
                                               FLAG_HARD_NEG, FLAG_NORMAL,
                                               FLAG_NOT_FOUND)


@dataclass(frozen=True)
class KYSRuntime(DiMPRuntime):
    # fused-score localization (dimp_motion.py:323-356; .get defaults)
    target_not_found_threshold_fused: float = 0.05
    dimp_threshold: float | None = 0.05
    remove_offset_in_fused_score: bool = True
    # hard-negative mining on the raw DiMP score (dimp_motion.py:384-409)
    perform_hn_mining_dimp: bool = True
    target_neighborhood_scale_safe: float = 2.2
    # update gates (dimp_motion.py:157-188)
    min_dimp_score_update: float = -1.0
    min_dimp_score_for_scale_update: float = -1.0
    # previous-frame alignment (dimp_motion.py:283-299)
    move_feat_to_center: bool = True
    prev_feat_remove_subpixel_shift: bool = True
    reset_state_during_occlusion: bool = True
    apply_window_to_dimp_score: bool = True
    window_output: bool = True
    # labels (dimp_motion.py:102-106)
    output_sigma_factor: float = 0.25
    score_downsample_factor: int = 1

    @property
    def motion_sz(self) -> int:
        """Motion grid = feature grid (score trimmed to it)."""
        return self.feat_sz


def _motion_window(rt: KYSRuntime) -> jnp.ndarray:
    """hann2d over the score map, trimmed to the feature grid
    (init_classifier, dimp_motion.py:674-685)."""
    S = rt.feat_sz + (rt.kernel_size + 1) % 2
    return hann2d(S)[: rt.feat_sz, : rt.feat_sz]


def _label_at(rt: KYSRuntime, pos, sample_pos, sample_scale, base_target_sz):
    """Gaussian label on the motion grid (get_label_function,
    dimp_motion.py:411-423)."""
    S = rt.motion_sz
    sigma = (jnp.sqrt(jnp.prod(base_target_sz))
             * (S / rt.score_downsample_factor / rt.image_sample_size)
             * rt.output_sigma_factor)
    center_norm = (pos - sample_pos) / (sample_scale * rt.image_sample_size)
    ksz_even = (rt.kernel_size + 1) % 2
    center = S * center_norm + 0.5 * ksz_even  # (y, x)
    return gauss_label_2d(S, S, sigma, sigma, center[0], center[1])


def kys_init_state(rt: KYSRuntime, model: KYSNet, params, frame, init_box_xywh):
    """First-frame init: the DiMP classifier/IoUNet path (dimp_tracker)
    plus the motion module (init_motion_module, dimp_motion.py:251-270)."""
    from mmtrack_tpu.trackers.dimp_tracker import dimp_init_state
    state = dimp_init_state(rt, model, params, frame, init_box_xywh)

    # motion init: one more extraction at the centered position
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"],
        im_hw=(frame.shape[0], frame.shape[1]))
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    bfeat = model.apply(params, patch[None], method=KYSNet.extract_backbone)
    motion_feat = model.apply(params, bfeat, method=KYSNet.motion_feat)[0]

    label = _label_at(rt, state["pos"], sample_pos, sample_scale,
                      state["base_target_sz"])
    box_patch = _get_iounet_box(rt, state["pos"], state["target_sz"],
                                sample_pos, sample_scale)
    S = rt.motion_sz
    state.update({
        "motion_feat": motion_feat,
        "gru_state": jnp.zeros((S, S, model.state_dim), jnp.float32),
        "gru_valid": jnp.asarray(False),
        "prev_label": label,
        "prev_box_patch": box_patch,
        # per-frame observability (confidence maps + parity harness)
        "last_dimp": jnp.zeros((S, S), jnp.float32),
        "last_fused": jnp.zeros((S, S), jnp.float32),
        "last_flag": jnp.asarray(FLAG_NORMAL, jnp.int32),
    })
    return state


def _prev_alignment(rt: KYSRuntime, state):
    """Translation applied to the previous frame's motion feature + GRU
    state (get_response_prediction, dimp_motion.py:277-299). Returns the
    (t_x, t_y) normalized shift (zeros when disabled/invalid)."""
    S = rt.motion_sz
    box_patch = state["prev_box_patch"]
    box_c = box_patch[:2] + 0.5 * box_patch[2:]  # (x, y) crop coords
    c_max = rt.image_sample_size * (0.5 + 1.0 / rt.search_area_scale)
    c_min = rt.image_sample_size * (0.5 - 1.0 / rt.search_area_scale)
    off_center = ~jnp.all((box_c < c_max) & (box_c > c_min))

    t_center = center_shift_translation(box_patch, (S, S), rt.feat_stride)
    # sub-pixel rounding shift; fix_coordinate_shift=1 adds the half cell
    box_c_feat = box_c / rt.feat_stride
    feat_trans = (jnp.round(box_c_feat) + 0.5 - box_c_feat) / S
    zeros = jnp.zeros(2, jnp.float32)
    t = jnp.where(rt.move_feat_to_center & off_center, t_center,
                  jnp.where(rt.prev_feat_remove_subpixel_shift,
                            feat_trans, zeros))
    return jnp.where(state["gru_valid"], t, zeros)


def kys_track_step(rt: KYSRuntime, model: KYSNet, params, state: dict,
                   frame: jnp.ndarray):
    """One tracked frame (dimp_motion.py:115-214). Returns
    (state, box_xywh, fused_score)."""
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"],
        im_hw=(frame.shape[0], frame.shape[1]))
    patch = crop_at(frame, state["pos"], crop_sz, rt.image_sample_size,
                    origin_yx=tl)
    return kys_step_from_patch(rt, model, params, state, patch,
                               sample_pos, sample_scale,
                               (float(frame.shape[0]),
                                float(frame.shape[1])))


def kys_step_from_patch(rt: KYSRuntime, model: KYSNet, params, state: dict,
                        patch: jnp.ndarray, sample_pos, sample_scale,
                        img_hw):
    """The tracked-frame step from an already-extracted raw (0..255)
    sample patch + its geometry (everything in dimp_motion.py:115-214
    after extract_backbone_features). Shared by the fused device path and
    the trajectory parity harness, which feeds the reference's own
    crops."""
    H_im, W_im = img_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}

    patch = _normalize(patch)
    bfeat = model.apply(params, patch[None], method=KYSNet.extract_backbone)
    clf_feat = model.apply(params, bfeat,
                           method=KYSNet.extract_classification_feat)
    scores_full = model.apply(params, state["filter"], clf_feat,
                              method=KYSNet.classify)[0]
    S = rt.motion_sz
    scores_dimp = scores_full[:S, :S]  # classify_target's [..., :-1, :-1]
    motion_feat = model.apply(params, bfeat, method=KYSNet.motion_feat)[0]

    window = _motion_window(rt) if rt.window_output else None
    scores_win = scores_dimp * window if (
        window is not None and rt.apply_window_to_dimp_score) else scores_dimp

    # ---- align previous frame, run the propagation predictor ----
    t_prev = _prev_alignment(rt, state)
    do_shift = state["gru_valid"] & jnp.any(t_prev != 0.0)
    feat_prev = jnp.where(do_shift,
                          shift_features(state["motion_feat"], t_prev),
                          state["motion_feat"])
    gru_prev = jnp.where(do_shift,
                         shift_features(state["gru_state"], t_prev),
                         state["gru_state"])

    # half-pixel fix_coordinate_shift on score/label in, response out
    t_half = jnp.full((2,), -0.5 / S, jnp.float32)
    score_in = shift_features(scores_win[..., None], t_half)[..., 0]
    label_in = shift_features(state["prev_label"][..., None], t_half)[..., 0]
    init_state = model.apply(params, label_in[None],
                             method=KYSNet.init_motion_state)[0]
    state_in = jnp.where(state["gru_valid"], gru_prev, init_state)

    fused_s, gru_new, _aux = model.apply(
        params, feat_prev[None], motion_feat[None], state_in[None],
        score_in[None], rt.dimp_threshold, window,
        method=KYSNet.predict_response)
    fused = shift_features(fused_s[0][..., None], -t_half)[..., 0]
    scores_am = jax.nn.relu(fused)  # (S, S)

    # ---- localization on the fused score (dimp_motion.py:323-382) ----
    max_fused, disp_fused = _max2d(scores_am)
    flat_id = (disp_fused[0] * S + disp_fused[1]).astype(jnp.int32)
    dimp_at_loc = scores_win.reshape(-1)[flat_id]

    _, disp_dimp = _max2d(scores_win)
    use_dimp_peak = rt.remove_offset_in_fused_score & (
        jnp.max(jnp.abs(disp_fused - disp_dimp)) == 1.0)
    disp = jnp.where(use_dimp_peak, disp_dimp, disp_fused)

    output_sz = float(S)
    translation = (disp - S // 2) * (rt.image_sample_size / output_sz) \
        * sample_scale
    not_found = max_fused < rt.target_not_found_threshold_fused

    # hard-negative mining on the raw DiMP score
    neigh = rt.target_neighborhood_scale_safe \
        * (jnp.sqrt(jnp.prod(state["target_sz"])) / sample_scale) \
        * (output_sz / rt.image_sample_size)
    iy = jnp.arange(S, dtype=jnp.float32)[:, None]
    ix = jnp.arange(S, dtype=jnp.float32)[None, :]
    top = jnp.maximum(jnp.round(disp[0] - neigh / 2), 0.0)
    bottom = jnp.minimum(jnp.round(disp[0] + neigh / 2 + 1), output_sz)
    left = jnp.maximum(jnp.round(disp[1] - neigh / 2), 0.0)
    right = jnp.minimum(jnp.round(disp[1] + neigh / 2 + 1), output_sz)
    inside = ((iy >= top) & (iy < bottom)) & ((ix >= left) & (ix < right))
    masked = jnp.where(inside, 0.0, scores_dimp)
    max2, _ = _max2d(masked)
    dimp_at_disp = scores_dimp.reshape(-1)[
        (disp[0] * S + disp[1]).astype(jnp.int32)]
    hard_neg = (rt.perform_hn_mining_dimp & ~not_found
                & (max2 > rt.hard_negative_threshold * dimp_at_disp)
                & (max2 > 0.1))

    flag = jnp.where(not_found, FLAG_NOT_FOUND,
                     jnp.where(hard_neg, FLAG_HARD_NEG, FLAG_NORMAL))
    found = flag != FLAG_NOT_FOUND
    state = {**state, "last_dimp": scores_dimp, "last_fused": scores_am,
             "last_flag": flag}

    # ---- position / IoUNet scale update (dimp_motion.py:156-192) ----
    new_pos = sample_pos + translation
    inside_offset = (rt.target_inside_ratio - 0.5) * state["target_sz"]
    img_sz = jnp.asarray([H_im, W_im], jnp.float32)
    new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                          inside_offset)
    state = {**state, "pos": jnp.where(found, new_pos, state["pos"])}

    ref_pos, ref_sz, ref_scale, ref_ok = _refine_box(
        rt, model, params, bfeat, state, sample_pos, sample_scale,
        rng_refine)
    update_scale = dimp_at_loc > rt.min_dimp_score_for_scale_update
    apply_ref = found & ref_ok
    state = {
        **state,
        "pos": jnp.where(apply_ref, ref_pos, state["pos"]),
        "target_sz": jnp.where(apply_ref & update_scale, ref_sz,
                               state["target_sz"]),
        "target_scale": jnp.where(apply_ref & update_scale, ref_scale,
                                  state["target_scale"]),
    }

    # ---- memory + filter update (dimp_motion.py:171-188) ----
    update_ok = found & (dimp_at_loc > rt.min_dimp_score_update)
    lr = jnp.where(hard_neg, rt.hard_negative_learning_rate, rt.learning_rate)
    box_crop = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)
    updated = _update_memory(rt, state, clf_feat[0], box_crop, lr)
    state = jax.tree.map(lambda a, b: jnp.where(update_ok, a, b),
                         updated, state)
    num_iter = jnp.where(
        ~update_ok, 0,
        jnp.where(hard_neg, rt.net_opt_hn_iter,
                  jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                            rt.net_opt_update_iter, 0)))
    new_filter = model.apply(
        params, state["filter"], state["memory_feat"], state["memory_boxes"],
        state["sample_weights"], num_iter, method=KYSNet.optimize_filter)
    state = {**state, "filter": new_filter}

    # ---- motion-state handoff (dimp_motion.py:197-206) ----
    new_label = _label_at(rt, state["pos"], sample_pos, sample_scale,
                          state["base_target_sz"])
    gru_kept = jnp.where(rt.reset_state_during_occlusion,
                         jnp.zeros_like(gru_new[0]), state["gru_state"])
    state = {
        **state,
        "motion_feat": jnp.where(found, motion_feat, state["motion_feat"]),
        "gru_state": jnp.where(found, gru_new[0], gru_kept),
        "gru_valid": state["gru_valid"] | found,
        "prev_label": jnp.where(found, new_label, state["prev_label"]),
        "prev_box_patch": jnp.where(found, box_crop,
                                    state["prev_box_patch"]),
    }

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, max_fused


class KYSTracker:
    """OO facade with the reference BaseTracker API (initialize/track)."""

    def __init__(self, model: KYSNet, params, runtime: KYSRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or KYSRuntime()
        self._init_fn = jax.jit(partial(kys_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(kys_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
