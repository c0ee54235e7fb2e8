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
    """KeepTrack at its reference configuration — super_dimp_hinge geometry
    + the certainty-weighted memory (keep_track_vot2021/pytracking/
    parameter/keep_track/release.py:12-88). The base network is
    build_super_dimp50 (plain RGB DiMP-50, hinge-residual GN optimizer)."""
    # super_dimp_hinge geometry (release.py:12-15)
    image_sample_size: int = 480          # 30*16
    search_area_scale: float = 8.0
    border_mode: str = "inside_major"
    patch_max_scale_change: float = 1.5
    # PrDiMP-style relative box refinement (release.py:60-67)
    box_refinement_space: str = "relative"
    box_refinement_iter: int = 10
    box_refinement_step_length: float = 2.5e-3
    # tracker-generated Gaussian training labels (keep_track.py:1337-1351)
    output_sigma_factor: float = 0.25
    # certainty-weighted memory (release.py:76-88)
    use_certainty_for_weight_computation: bool = True
    certainty_ths: float = 0.5            # certainty_for_weight_computation_ths
    id0_weight_increase: bool = True

    peaks: PeakMatchConfig = PeakMatchConfig()
    scale_memory: int = 30   # recent target-scale ring for occlusion rescale
    # learned SuperGlue-style matcher (models/peak_matching.py, the
    # reference's peak_matching.py) vs the mutual-NN fallback
    use_learned_matcher: bool = True
    descriptor_dim: int = 256


def _label_spatial(rt: KeepTrackRuntime, sigma, center_yx):
    """Separable Gaussian label on the (feat_sz + end_pad) score grid with
    the origin at the map center (dcf.label_function_spatial /
    gauss_spatial, keep_track_vot2021/pytracking/libs/dcf.py:48-59; the
    end pad extends the grid asymmetrically for even kernels)."""
    S = rt.feat_sz
    end_pad = (rt.kernel_size + 1) % 2
    k = jnp.arange(S + end_pad, dtype=jnp.float32) - (S - 1) / 2.0
    gy = jnp.exp(-0.5 / sigma[0] ** 2 * (k - center_yx[0]) ** 2)
    gx = jnp.exp(-0.5 / sigma[1] ** 2 * (k - center_yx[1]) ** 2)
    return gy[:, None] * gx[None, :]


def _frame_label(rt: KeepTrackRuntime, sigma, pos, sample_pos, sample_scale):
    """Per-frame training label (get_label_function,
    keep_track.py:1498-1507)."""
    end_pad = (rt.kernel_size + 1) % 2
    norm = (pos - sample_pos) / (sample_scale * rt.image_sample_size)
    center = rt.feat_sz * norm + 0.5 * end_pad
    return _label_spatial(rt, sigma, center)


def _update_memory_keeptrack(rt: KeepTrackRuntime, state, clf_feat, box_crop,
                             label, lr, certainty):
    """update_memory + update_sample_weights_based_on_certainty
    (keep_track.py:1371-1496): the replacement slot is the LOWEST
    certainty*weight beyond the protected init slots (not the lowest
    weight), the previous-slot weight carry is skipped when the same slot
    is replaced twice in a row, and the label + certainty memories are
    written alongside features and boxes."""
    M = rt.sample_memory_size
    sw = state["sample_weights"]
    num = state["num_stored"]
    prev = state["prev_replace_ind"]
    num_init = rt.num_init_samples

    cert_w = state["certainties"] * sw
    cand = jnp.where(jnp.arange(M) >= num_init, cert_w, jnp.inf)
    r_min = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num < M, num, r_min)

    first = prev < 0
    same = (~first) & (r_ind == prev)
    sw_first = (sw / (1 - lr)).at[r_ind].set(lr)
    sw_else = sw.at[r_ind].set(sw[jnp.maximum(prev, 0)] / (1 - lr))
    sw1 = jnp.where(first, sw_first, jnp.where(same, sw, sw_else))
    sw1 = sw1 / sw1.sum()
    init_sum = sw1[:num_init].sum()
    need = init_sum < rt.init_samples_minimum_weight
    rest = sw1[num_init:].sum()
    sw2 = (sw1 / (rt.init_samples_minimum_weight + rest)
           ).at[:num_init].set(rt.init_samples_minimum_weight / num_init)
    sw1 = jnp.where(need, sw2, sw1)

    return {
        **state,
        "memory_feat": state["memory_feat"].at[r_ind].set(clf_feat),
        "memory_boxes": state["memory_boxes"].at[r_ind].set(box_crop),
        "memory_labels": state["memory_labels"].at[r_ind].set(label),
        "certainties": state["certainties"].at[r_ind].set(certainty),
        "sample_weights": sw1,
        "num_stored": jnp.minimum(num + 1, M),
        "prev_replace_ind": r_ind,
    }


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
    """First-frame initialization at the super_dimp_hinge recipe
    (keep_track.py:375-474 + init_classifier:1557-1636): augmented sample
    set -> tracker-generated Gaussian labels (init_target_labels) ->
    filter init + hinge-residual GN optimization; memory seeded with all
    samples at weight 1/N and certainty 1.0 for the ground-truth init
    samples (init_target_label_certainties).

    NB the init crop uses replicate borders even under
    border_mode='inside_major' — the reference's generate_init_samples
    gate (keep_track.py:1248) only matches 'inside' exactly.
    """
    from mmtrack_tpu.ops.augment import dimp_init_augmentations, feature_dropout

    x, y, w, h = init_box
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])
    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    init_sample_pos = jnp.round(pos)
    init_sample_scale = target_scale
    rng = jax.random.PRNGKey(0)
    box_crop = _get_iounet_box(rt, pos, target_sz, init_sample_pos,
                               init_sample_scale)

    S_im = rt.image_sample_size
    if rt.use_augmentation:
        rng, rng_shift, rng_drop = jax.random.split(rng, 3)
        S_e = S_im * rt.augmentation_expansion_factor
        szl_e, tl_e, _, _ = _sample_geometry(
            rt, init_sample_pos, target_scale, out_size=S_e)  # replicate
        expanded = _normalize(crop_at(frame, init_sample_pos, szl_e, S_e,
                                      origin_yx=tl_e))
        patches, shifts = dimp_init_augmentations(
            expanded, S_im, rng_shift,
            random_shift_factor=rt.random_shift_factor)

        bfeat = model.apply(params, patches, method=DiMPNet.extract_backbone)
        clf_feat = model.apply(params, bfeat,
                               method=DiMPNet.extract_classification_feat)
        if rt.aug_dropout_num > 0:
            drop = feature_dropout(clf_feat[0], rng_drop, rt.aug_dropout_num,
                                   rt.aug_dropout_prob)
            clf_feat = jnp.concatenate([clf_feat, drop], axis=0)
        shifts = jnp.concatenate(
            [shifts, jnp.zeros((rt.aug_dropout_num, 2), jnp.float32)], axis=0)
        boxes = box_crop[None] + jnp.concatenate(
            [shifts[:, ::-1], jnp.zeros_like(shifts)], axis=1)
        bfeat0 = {k: v[:1] for k, v in bfeat.items()}
    else:
        szl, tl0, _, _ = _sample_geometry(rt, init_sample_pos, target_scale)
        patch = _normalize(crop_at(frame, init_sample_pos, szl, S_im,
                                   origin_yx=tl0))
        bfeat = model.apply(params, patch[None],
                            method=DiMPNet.extract_backbone)
        clf_feat = model.apply(params, bfeat,
                               method=DiMPNet.extract_classification_feat)
        shifts = jnp.zeros((1, 2), jnp.float32)
        boxes = box_crop[None]
        bfeat0 = bfeat

    # Gaussian labels per augmented sample (init_target_labels,
    # keep_track.py:1331-1351): sigma from the base target size, centers
    # shifted per transform
    sigma_v = jnp.sqrt(jnp.prod(
        rt.feat_sz / rt.image_sample_size * base_target_sz)) \
        * rt.output_sigma_factor
    sigma = jnp.stack([sigma_v, sigma_v])
    end_pad = (rt.kernel_size + 1) % 2
    norm = (pos - init_sample_pos) / (init_sample_scale * rt.image_sample_size)
    center0 = rt.feat_sz * norm + 0.5 * end_pad
    centers = center0[None] + shifts / rt.image_sample_size * rt.feat_sz
    labels = jax.vmap(lambda c: _label_spatial(rt, sigma, c))(centers)

    N = clf_feat.shape[0]
    w0 = model.apply(params, clf_feat, boxes, method=DiMPNet.get_filter)
    filt = model.apply(params, w0, clf_feat, labels, None, rt.net_opt_iter,
                       method=DiMPNet.optimize_filter_hinge)
    mod3, mod4 = model.apply(
        params, [bfeat0["layer2"], bfeat0["layer3"]], box_crop[None],
        method=lambda m, f, b: m.bb_regressor.get_modulation(f, b))

    M = rt.sample_memory_size
    Sf = rt.feat_sz
    C = clf_feat.shape[-1]
    So = Sf + end_pad
    state = {
        "pos": pos, "target_sz": target_sz,
        "target_scale": target_scale, "base_target_sz": base_target_sz,
        "sigma": sigma,
        "filter": filt,
        "memory_feat": jnp.zeros((M, Sf, Sf, C), jnp.float32).at[:N].set(clf_feat),
        "memory_boxes": jnp.zeros((M, 4), jnp.float32).at[:N].set(boxes),
        "memory_labels": jnp.zeros((M, So, So), jnp.float32).at[:N].set(labels),
        "certainties": jnp.zeros((M,), jnp.float32).at[:N].set(1.0),
        "sample_weights": jnp.zeros((M,), jnp.float32).at[:N].set(1.0 / N),
        "num_stored": jnp.asarray(N, jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "iou_mod3": mod3[0], "iou_mod4": mod4[0],
        "rng": rng,
    }

    # initial peak collection from the first classification map
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"],
        im_hw=(frame.shape[0], frame.shape[1]))
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
        rt, state["pos"], eff_scale, im_hw=(H, W))
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
    hard_neg = flag == FLAG_HARD_NEG
    lr = jnp.where(hard_neg, rt.hard_negative_learning_rate,
                   rt.learning_rate)
    box_crop = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)

    # target label certainty (target_label_certainty_type='max_score_map',
    # keep_track.py:809-810) with the id0 boost (update_memory:1375-1378:
    # certainty := max(c, sqrt(c)) while identity 0 is still selected)
    certainty = jnp.max(scores)
    if rt.id0_weight_increase:
        certainty = jnp.where(peaks["selected_object_id"] == 0,
                              jnp.maximum(certainty, jnp.sqrt(certainty)),
                              certainty)
    # per-frame Gaussian training label at the refined position
    # (track -> get_label_function, keep_track.py:566-576)
    train_y = _frame_label(rt, state["sigma"], state["pos"], sample_pos,
                           sample_scale)

    updated = _update_memory_keeptrack(rt, state, clf_feat[0], box_crop,
                                       train_y, lr, certainty)
    mem_keys = ("memory_feat", "memory_boxes", "memory_labels", "certainties",
                "sample_weights", "num_stored", "prev_replace_ind")
    state = {**state, **{k: jnp.where(update_ok, updated[k], state[k])
                         for k in mem_keys}}

    # hard-negative re-optimization is skipped when the sample's certainty
    # is below the weight-computation threshold (update_classifier,
    # keep_track.py:1655-1663)
    hn_iter = jnp.where(certainty < rt.certainty_ths, 0, rt.net_opt_hn_iter) \
        if rt.use_certainty_for_weight_computation else rt.net_opt_hn_iter
    num_iter = jnp.where(
        ~update_ok, 0,
        jnp.where(hard_neg, hn_iter,
                  jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                            rt.net_opt_update_iter, 0)))
    # optimizer sample weights: certainty-suppressed (certainties < ths
    # zeroed, then multiplied into the age weights — keep_track.py:1684-1695)
    if rt.use_certainty_for_weight_computation:
        certs = state["certainties"]
        w_opt = state["sample_weights"] * jnp.where(
            certs < rt.certainty_ths, 0.0, certs)
    else:
        w_opt = state["sample_weights"]
    new_filter = model.apply(
        params, state["filter"], state["memory_feat"],
        state["memory_labels"], w_opt, num_iter,
        method=DiMPNet.optimize_filter_hinge)
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
