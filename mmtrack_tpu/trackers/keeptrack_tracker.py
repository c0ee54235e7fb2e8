"""KeepTrack tracker: DiMP runtime + peak-matching target association.

Rebuild of the KeepTrack tracking loop (RGBD/models/keep_track_vot2021/
pytracking/tracker/keep_track/keep_track.py:366-604): instead of ATOM's
two-peak distractor heuristic, EVERY score-map peak becomes a candidate with
a descriptor; identities persist across frames through the matcher
(mmtrack_tpu.trackers.keep_track), the selected identity drives localization,
and the search area rescales by the mean of recent target scales while the
target is lost (keep_track.py:538-548).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.dimp import DiMPNet
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.trackers.dimp_tracker import (
    DiMPRuntime,
    _get_iounet_box,
    _normalize,
    _refine_box,
    _sample_geometry,
    _update_memory,
    FLAG_HARD_NEG,
    FLAG_NORMAL,
    FLAG_NOT_FOUND,
)
from mmtrack_tpu.trackers.keep_track import (
    PeakMatchConfig,
    extract_peaks,
    gather_descriptors,
    init_peak_state,
    update_peak_state,
)


@dataclass(frozen=True)
class KeepTrackRuntime(DiMPRuntime):
    peaks: PeakMatchConfig = PeakMatchConfig()
    scale_memory: int = 30   # recent target-scale ring for occlusion rescale
    # learned SuperGlue-style matcher (models/peak_matching.py, the
    # reference's peak_matching.py) vs the mutual-NN fallback
    use_learned_matcher: bool = True
    descriptor_dim: int = 256


def _peak_descriptors(rt: KeepTrackRuntime, bundle, matcher_params, feat,
                      coords):
    """Peak descriptors: learned DescriptorExtractor conv when the learned
    matcher is active, plain normalized feature gather otherwise."""
    if bundle is None:
        return gather_descriptors(feat, coords)
    desc_mod, _ = bundle
    return desc_mod.apply(matcher_params["desc"], feat, coords)


def _make_match_fn(rt: KeepTrackRuntime, bundle, matcher_params):
    """Adapter: PeakMatcher -> update_peak_state's match_fn interface."""
    if bundle is None:
        return None
    _, matcher = bundle

    def fn(prev, scores, coords, valid, desc):
        to_px = lambda c: (c[:, ::-1] + 0.5) * rt.feat_stride   # (y,x)->(x,y)
        out = matcher.apply(
            matcher_params["matcher"],
            desc[None], to_px(coords)[None], scores[None], valid[None],
            prev["peak_desc"][None], to_px(prev["peak_coords"])[None],
            prev["peak_scores"][None], prev["peak_valid"][None],
            image_size_wh=(float(rt.image_sample_size),
                           float(rt.image_sample_size)))
        return out["matches0"][0], out["match_scores0"][0]

    return fn


def keeptrack_init_state(rt: KeepTrackRuntime, model: DiMPNet, bundle,
                         params, matcher_params, frame: jnp.ndarray,
                         init_box: jnp.ndarray) -> dict:
    from mmtrack_tpu.trackers.dimp_tracker import dimp_init_state

    state = dimp_init_state(rt, model, params, frame, init_box)

    # initial peak collection from the first classification map
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"])
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    bfeat = model.apply(params, patch[None], method=DiMPNet.extract_backbone)
    clf_feat = model.apply(params, bfeat, method=DiMPNet.extract_classification_feat)
    scores = model.apply(params, state["filter"], clf_feat,
                         method=DiMPNet.classify)[0]
    p_scores, p_coords, p_valid = extract_peaks(scores, rt.peaks)
    # descriptors from the classification feature grid (score grid offset by
    # the even-kernel halo is within one cell; gather at clipped coords)
    desc = _peak_descriptors(rt, bundle, matcher_params, clf_feat[0], p_coords)
    state["peaks"] = init_peak_state(rt.peaks, p_scores, p_coords, p_valid, desc)
    state["scale_ring"] = jnp.full((rt.scale_memory,), state["target_scale"])
    state["scale_ptr"] = jnp.asarray(0, jnp.int32)
    return state


def keeptrack_track_step(rt: KeepTrackRuntime, model: DiMPNet, bundle,
                         params, matcher_params, state: dict,
                         frame: jnp.ndarray):
    """One frame with peak-matching association."""
    H, W = frame.shape[0], frame.shape[1]
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}

    # occlusion-aware search rescale: while lost, sample at the mean of
    # recent target scales (keep_track.py:538-548)
    lost_prev = state["peaks"]["flag_not_found"]
    eff_scale = jnp.where(lost_prev, state["scale_ring"].mean(),
                          state["target_scale"])

    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], eff_scale)
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    bfeat = model.apply(params, patch[None], method=DiMPNet.extract_backbone)
    clf_feat = model.apply(params, bfeat, method=DiMPNet.extract_classification_feat)
    scores = model.apply(params, state["filter"], clf_feat,
                         method=DiMPNet.classify)[0]

    # peak matching replaces localize_advanced
    p_scores, p_coords, p_valid = extract_peaks(scores, rt.peaks)
    desc = _peak_descriptors(rt, bundle, matcher_params, clf_feat[0], p_coords)
    peaks, sel_peak, lost = update_peak_state(
        state["peaks"], rt.peaks, p_scores, p_coords, p_valid, desc,
        match_fn=_make_match_fn(rt, bundle, matcher_params))
    state = {**state, "peaks": peaks}

    S = rt.score_sz
    output_sz = float(S - (rt.kernel_size + 1) % 2)
    score_center = (S - 1) / 2.0
    sel = jnp.maximum(sel_peak, 0)
    disp = p_coords[sel] - score_center
    translation = disp * (rt.image_sample_size / output_sz) * sample_scale
    max_score = p_scores[sel]

    found = ~lost
    flag = jnp.where(lost, FLAG_NOT_FOUND,
                     jnp.where(sel_peak != 0, FLAG_HARD_NEG, FLAG_NORMAL))

    new_pos = sample_pos + translation
    inside_offset = (rt.target_inside_ratio - 0.5) * state["target_sz"]
    img_sz = jnp.asarray([H, W], jnp.float32)
    new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset), inside_offset)
    state = {**state, "pos": jnp.where(found, new_pos, state["pos"])}

    ref_pos, ref_sz, ref_scale, ref_ok = _refine_box(
        rt, model, params, bfeat, state, sample_pos, sample_scale, rng_refine)
    apply_ref = found & ref_ok
    state = {
        **state,
        "pos": jnp.where(apply_ref, ref_pos, state["pos"]),
        "target_sz": jnp.where(apply_ref, ref_sz, state["target_sz"]),
        "target_scale": jnp.where(apply_ref, ref_scale, state["target_scale"]),
    }

    # target-scale ring for the occlusion rescale
    ptr = state["scale_ptr"] % rt.scale_memory
    ring = state["scale_ring"].at[ptr].set(state["target_scale"])
    state = {**state,
             "scale_ring": jnp.where(apply_ref, ring, state["scale_ring"]),
             "scale_ptr": jnp.where(apply_ref, state["scale_ptr"] + 1,
                                    state["scale_ptr"])}

    # memory + filter update, certainty-gated (keep_track: updates only when
    # the peak selection is certain)
    update_ok = found & peaks["selection_certain"]
    lr = jnp.where(flag == FLAG_HARD_NEG, rt.hard_negative_learning_rate,
                   rt.learning_rate)
    box_crop = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)
    updated = _update_memory(rt, state, clf_feat[0], box_crop, lr)
    mem_keys = ("memory_feat", "memory_boxes", "sample_weights",
                "num_stored", "prev_replace_ind")
    state = {**state, **{k: jnp.where(update_ok, updated[k], state[k])
                         for k in mem_keys}}

    num_iter = jnp.where(
        ~update_ok, 0,
        jnp.where(flag == FLAG_HARD_NEG, rt.net_opt_hn_iter,
                  jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                            rt.net_opt_update_iter, 0)))
    new_filter = model.apply(
        params, state["filter"], state["memory_feat"], state["memory_boxes"],
        state["sample_weights"], num_iter, method=DiMPNet.optimize_filter)
    state = {**state, "filter": new_filter}

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, max_score


class KeepTrackTracker:
    """OO facade (BaseTracker API).

    With rt.use_learned_matcher (default), peak association runs through the
    SuperGlue-style PeakMatcher + DescriptorExtractor
    (models/peak_matching.py); pass trained weights via `matcher_params`
    ({'desc': ..., 'matcher': ...}) — random init otherwise."""

    def __init__(self, model: DiMPNet, params,
                 runtime: KeepTrackRuntime | None = None,
                 matcher_params=None, clf_feat_dim: int = 512):
        self.model = model
        self.params = params
        self.rt = runtime or KeepTrackRuntime()

        if self.rt.use_learned_matcher:
            from mmtrack_tpu.models.peak_matching import (DescriptorExtractor,
                                                          PeakMatcher)
            desc_mod = DescriptorExtractor(self.rt.descriptor_dim)
            matcher = PeakMatcher(descriptor_dim=self.rt.descriptor_dim,
                                  input_dim=self.rt.descriptor_dim)
            self.bundle = (desc_mod, matcher)
            if matcher_params is None:
                K = self.rt.peaks.num_peaks
                S = self.rt.feat_sz
                rng = jax.random.PRNGKey(0)
                dvars = desc_mod.init(rng, jnp.zeros((S, S, clf_feat_dim)),
                                      jnp.zeros((K, 2)))
                d = jnp.zeros((1, K, self.rt.descriptor_dim))
                k = jnp.zeros((1, K, 2))
                s = jnp.zeros((1, K))
                v = jnp.ones((1, K), bool)
                mvars = matcher.init(rng, d, k, s, v, d, k, s, v)
                matcher_params = {"desc": dvars, "matcher": mvars}
        else:
            self.bundle = None
            matcher_params = {}
        self.matcher_params = matcher_params

        self._init_fn = jax.jit(partial(keeptrack_init_state, self.rt,
                                        self.model, self.bundle))
        self._step_fn = jax.jit(partial(keeptrack_track_step, self.rt,
                                        self.model, self.bundle))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, self.matcher_params,
                                   jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(
            self.params, self.matcher_params, self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
