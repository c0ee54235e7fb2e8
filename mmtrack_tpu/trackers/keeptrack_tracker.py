"""KeepTrack tracker: DiMP runtime + peak-matching target association.

Rebuild of the KeepTrack tracking loop (RGBD/models/keep_track_vot2021/
pytracking/tracker/keep_track/keep_track.py:366-604 +
localize_target_by_peak_matching:946-1040): every score-map peak becomes a
candidate with a learned descriptor and an image-coordinate keypoint;
identities persist across frames through the SuperGlue-style matcher
(mmtrack_tpu.models.peak_matching), the selected identity drives
localization, and ATOM's advanced localization serves as the fallback on
low-score frames and whenever the match memory has a gap — exactly the
reference's three-way state machine:

  - max_score < 0.05     -> advanced localization, collection kept stale,
                            match memory NOT refreshed (:950-952),
  - memory gap / frame 2 -> advanced localization, collection re-created
                            from the current peaks with
                            peak_selection_is_certain=(frame_num<10)
                            (:956-958 + 1027-1032),
  - otherwise            -> peak matching against the previous frame
                            (matches1 consumed, :985-997).

While the target is lost the search area regrows from the recent
target-scale history (:538-548), and the classifier memory is
certainty-weighted with the reference's permanent sub-threshold zeroing
(update_classifier:1689-1697).
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
    _localize_advanced,
    _normalize,
    _refine_box,
    _sample_geometry,
    FLAG_HARD_NEG,
    FLAG_NORMAL,
    FLAG_NOT_FOUND,
)
from mmtrack_tpu.trackers.keep_track import (
    NEG_ID,
    PeakMatchConfig,
    extract_peaks,
    gather_descriptors,
    init_peak_state,
    peak_keypoints,
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
    enable_search_area_rescaling_at_occlusion: bool = True

    peaks: PeakMatchConfig = PeakMatchConfig()
    # recent target-scale ring: the reference windows its scale history to
    # the last 60 entries (keep_track.py:544 target_scales[-60:])
    scale_memory: int = 60
    # skip_running_matching_network_for_single_peak_cases (release.py:84)
    skip_matching_single_peak: bool = True
    single_peak_score: float = 0.5        # keep_track.py:972
    # learned SuperGlue-style matcher (models/peak_matching.py, the
    # reference's peak_matching.py) vs the mutual-NN fallback
    use_learned_matcher: bool = True
    descriptor_dim: int = 256
    # descriptors come from the RAW backbone layer3 — the matcher net's
    # get_backbone_clf_feat selects classification_layer=['layer3']
    # (keep_track.py:1181); 1024-d for the super_dimp ResNet-50
    desc_feat_dim: int = 1024


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
    """Peak descriptors from the raw backbone layer3 feature map
    (keep_track.py:1181 get_backbone_clf_feat -> descriptor_extractor):
    learned DescriptorExtractor conv when the learned matcher is active,
    plain normalized feature gather otherwise."""
    if bundle is None:
        return gather_descriptors(feat, coords)
    desc_mod, _ = bundle
    return desc_mod.apply(matcher_params["desc"], feat, coords)


def _occlusion_rescale(rt: KeepTrackRuntime, ring, count, counter):
    """Search-area regrowth while lost (keep_track.py:538-548): of the last
    `scale_memory` stored scales, keep those >= the most recent one, and
    average the newest max(2, min(30, counter)) of them."""
    Mr = rt.scale_memory
    num_scales = jnp.clip(counter, 2, 30)
    newest = (count - 1) % Mr
    idxs = (newest - jnp.arange(Mr)) % Mr
    ordered = ring[idxs]                        # [0] = newest
    validk = jnp.arange(Mr) < jnp.minimum(count, Mr)
    cand = validk & (ordered >= ordered[0])
    csum = jnp.cumsum(cand.astype(jnp.int32))
    take = cand & (csum <= num_scales)
    return (ordered * take).sum() / jnp.maximum(take.sum(), 1)


def keeptrack_init_state(rt: KeepTrackRuntime, model: DiMPNet, bundle,
                         params, matcher_params, frame: jnp.ndarray,
                         init_box: jnp.ndarray) -> dict:
    """First-frame initialization at the super_dimp_hinge recipe
    (keep_track.py:375-474 + init_classifier:1557-1636): augmented sample
    set -> tracker-generated Gaussian labels (init_target_labels) ->
    filter init + hinge-residual GN optimization; memory seeded with all
    samples at weight 1/N and certainty 1.0 for the ground-truth init
    samples (init_target_label_certainties).

    The peak collection is NOT created here — the reference's match memory
    is empty until the first tracked frame, which therefore localizes via
    the advanced fallback and seeds the collection from its own peaks
    (localize_target_by_peak_matching:956-958 + 1027-1032).

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
    K = rt.peaks.num_peaks
    D = rt.descriptor_dim if bundle is not None else bfeat0["layer3"].shape[-1]
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
        # empty peak collection + empty match memory: the reference's
        # self.peak_collection = None / MatchingMemory() at initialize
        "peaks": init_peak_state(
            rt.peaks, jnp.zeros((K,), jnp.float32), jnp.zeros((K, 2), jnp.float32),
            jnp.zeros((K, 2), jnp.float32), jnp.zeros((K,), bool),
            jnp.zeros((K, D), jnp.float32), certain=True),
        "mem_ok": jnp.asarray(False),
        "scale_ring": jnp.zeros((rt.scale_memory,), jnp.float32),
        "ring_count": jnp.asarray(0, jnp.int32),
        "nf_counter": jnp.asarray(0, jnp.int32),
        "last_flag": jnp.asarray(FLAG_NORMAL, jnp.int32),
        "last_use_match": jnp.asarray(False),
    }
    return state


def keeptrack_track_step(rt: KeepTrackRuntime, model: DiMPNet, bundle,
                         params, matcher_params, state: dict,
                         frame: jnp.ndarray):
    """One frame: reference-exact crop geometry + the post-crop step."""
    H, W = frame.shape[0], frame.shape[1]
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"], im_hw=(H, W))
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    return keeptrack_step_from_patch(
        rt, model, bundle, params, matcher_params, state, patch, tl, crop_sz,
        sample_pos, sample_scale, (float(H), float(W)))


def keeptrack_step_from_patch(rt: KeepTrackRuntime, model: DiMPNet, bundle,
                              params, matcher_params, state: dict,
                              patch: jnp.ndarray, tl, crop_side,
                              sample_pos, sample_scale, im_hw):
    """One frame of the reference's three-way localization state machine
    (track:476-604 + localize_target_by_peak_matching:946-1040), starting
    from an already-normalized crop + its geometry — split out so the
    trajectory parity harness can feed the REFERENCE'S own recorded crops
    through our state machine."""
    H, W = im_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}
    pre_scale = state["target_scale"]

    bfeat = model.apply(params, patch[None], method=DiMPNet.extract_backbone)
    clf_feat = model.apply(params, bfeat, method=DiMPNet.extract_classification_feat)
    scores = model.apply(params, state["filter"], clf_feat,
                         method=DiMPNet.classify)[0]
    max_score_raw = jnp.max(scores)

    # --- localization state machine ---
    # low:   score too weak for matching -> advanced loc, stale collection,
    #        match memory NOT refreshed (:950-952)
    # fresh: memory gap (incl. frame 2) -> advanced loc, collection re-init
    # match: peak matching against the previous frame's peaks
    low = max_score_raw < rt.peaks.peak_threshold
    use_match = ~low & state["mem_ok"]

    p_scores, p_coords, p_valid = extract_peaks(scores, rt.peaks)
    desc = _peak_descriptors(rt, bundle, matcher_params, bfeat["layer3"][0],
                             p_coords)
    S = rt.score_sz
    kpts = peak_keypoints(p_coords, S, tl, crop_side)

    adv_trans, adv_flag, _ = _localize_advanced(rt, scores, state, sample_pos,
                                                sample_scale)

    prev = state["peaks"]
    K = rt.peaks.num_peaks
    # 1-v-1 speedup (keep_track.py:971-975): exactly one strong peak on
    # both sides -> identity match with prob 1, matcher skipped
    speedup = (prev["peak_valid"].sum() == 1) & (p_valid.sum() == 1) & \
        (prev["peak_scores"].max() > rt.single_peak_score) & \
        (p_scores.max() > rt.single_peak_score)
    if not rt.skip_matching_single_peak:
        speedup = jnp.asarray(False)
    run_matcher = use_match & ~speedup

    def _trivial(_):
        ar = jnp.arange(K)
        return (jnp.where(ar == 0, 0, NEG_ID).astype(jnp.int32),
                jnp.where(ar == 0, 1.0, 0.0).astype(jnp.float32))

    def _matcher(_):
        if bundle is None:
            from mmtrack_tpu.trackers.keep_track import match_peaks
            idx, prob = match_peaks(prev["peak_desc"], prev["peak_coords"],
                                    prev["peak_valid"], desc, p_coords,
                                    p_valid, rt.peaks)
            return idx.astype(jnp.int32), prob.astype(jnp.float32)
        _, matcher = bundle
        # set0 = previous frame, set1 = current; consume matches1 — the
        # reference's call order (keep_track.py:985-997). Keypoints are
        # (y, x) IMAGE coords and image_size is passed as (W, H): the
        # torch normalize_keypoints builds size=[[w,h]] from an (H,W)
        # shape (peak_matching.py:113-124), pairing y against w — quirk
        # replicated verbatim.
        out = matcher.apply(
            matcher_params["matcher"],
            prev["peak_desc"][None], prev["peak_kpts"][None],
            prev["peak_scores"][None], prev["peak_valid"][None],
            desc[None], kpts[None], p_scores[None], p_valid[None],
            image_size_wh=(float(W), float(H)))
        return out["matches1"][0].astype(jnp.int32), \
            out["match_scores1"][0].astype(jnp.float32)

    match_idx, match_prob = jax.lax.cond(run_matcher, _matcher, _trivial, None)

    matched_peaks, sel_peak, lost_m = update_peak_state(
        prev, rt.peaks, p_scores, p_coords, kpts, p_valid, desc,
        match_fn=lambda *_: (match_idx, match_prob))
    fresh_peaks = init_peak_state(rt.peaks, p_scores, p_coords, kpts, p_valid,
                                  desc, certain=state["frame_num"] < 10)
    peaks = jax.tree_util.tree_map(
        lambda m, f, o: jnp.where(use_match, m, jnp.where(low, o, f)),
        matched_peaks, fresh_peaks, prev)
    state = {**state, "peaks": peaks, "mem_ok": ~low}

    output_sz = float(S - (rt.kernel_size + 1) % 2)
    score_center = (S - 1) / 2.0
    sel = jnp.maximum(sel_peak, 0)
    peak_trans = (p_coords[sel] - score_center) \
        * (rt.image_sample_size / output_sz) * sample_scale
    coll_flag = jnp.where(lost_m, FLAG_NOT_FOUND, FLAG_NORMAL).astype(jnp.int32)
    flag = jnp.where(use_match, coll_flag, adv_flag)
    translation = jnp.where(use_match, peak_trans, adv_trans)
    found = flag != FLAG_NOT_FOUND
    state = {**state, "last_flag": flag, "last_use_match": use_match}

    # object_presence_score with the id0 sqrt boost, evaluated on the
    # POST-update collection (track:512-515); the empty init collection
    # carries selected id 0, covering the reference's `collection is None`
    presence = max_score_raw
    id0 = peaks["selected_object_id"] == 0
    if rt.id0_weight_increase:
        presence = jnp.where(
            id0, jnp.maximum(presence, jnp.sqrt(jnp.maximum(presence, 0.0))),
            presence)

    new_pos = sample_pos + translation
    img_sz = jnp.asarray([H, W], jnp.float32)
    if rt.use_iou_net:
        inside_offset = (rt.target_inside_ratio - 0.5) * state["target_sz"]
        new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                              inside_offset)
        state = {**state, "pos": jnp.where(found, new_pos, state["pos"])}

        ref_pos, ref_sz, ref_scale, ref_ok = _refine_box(
            rt, model, params, bfeat, state, sample_pos, sample_scale,
            rng_refine)
        apply_ref = found & ref_ok
        state = {
            **state,
            "pos": jnp.where(apply_ref, ref_pos, state["pos"]),
            "target_sz": jnp.where(apply_ref, ref_sz, state["target_sz"]),
            "target_scale": jnp.where(apply_ref, ref_scale,
                                      state["target_scale"]),
        }
    else:
        # classifier-only published mode (keep_track.py:532-533:
        # update_state(new_pos, sample_scales[scale_ind]) — scale
        # re-quantized from the crop geometry, clamped to the init scale
        # bounds, inside clamp on the NEW size)
        min_sf = jnp.max(10.0 / state["base_target_sz"])
        max_sf = jnp.min(img_sz / state["base_target_sz"])
        new_scale = jnp.clip(sample_scale, min_sf, max_sf)
        new_sz = state["base_target_sz"] * new_scale
        inside_offset = (rt.target_inside_ratio - 0.5) * new_sz
        new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                              inside_offset)
        state = {
            **state,
            "pos": jnp.where(found, new_pos, state["pos"]),
            "target_sz": jnp.where(found, new_sz, state["target_sz"]),
            "target_scale": jnp.where(found, new_scale,
                                      state["target_scale"]),
        }

    # target-scale history: the PRE-refine scale is appended on every found
    # frame (track:526-527, before refine_target_box runs); while lost the
    # counter drives the occlusion regrowth and target_scale is
    # PERSISTENTLY overwritten by the windowed mean (:538-548)
    count = state["ring_count"]
    ring_app = state["scale_ring"].at[count % rt.scale_memory].set(pre_scale)
    nf_counter = jnp.where(found, 0,
                           jnp.where(count > 0, state["nf_counter"] + 1,
                                     state["nf_counter"]))
    rescale_on = (~found) & (count > 0) & \
        rt.enable_search_area_rescaling_at_occlusion
    mean_scale = _occlusion_rescale(rt, state["scale_ring"], count, nf_counter)
    state = {
        **state,
        "scale_ring": jnp.where(found, ring_app, state["scale_ring"]),
        "ring_count": jnp.where(found, count + 1, count),
        "nf_counter": nf_counter.astype(jnp.int32),
        "target_scale": jnp.where(rescale_on, mean_scale,
                                  state["target_scale"]),
    }

    # --- classifier/memory update ---
    # update gates on the FLAG alone (track:568 update_flag = flag not in
    # [not_found, uncertain]); the collection path only emits
    # normal/not_found, hard_negative/uncertain come from the fallback
    update_ok = (flag == FLAG_NORMAL) | (flag == FLAG_HARD_NEG)
    hard_neg = flag == FLAG_HARD_NEG
    lr = jnp.where(hard_neg, rt.hard_negative_learning_rate,
                   rt.learning_rate)
    box_crop = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)

    # target label certainty (target_label_certainty_type='max_score_map',
    # keep_track.py:809-810). The id0 sqrt boost applies to the STORED
    # certainty only (update_memory:1375-1378); the hard-negative skip
    # gate compares the UNBOOSTED value (update_classifier:1665-1669).
    cert_raw = max_score_raw
    cert_store = cert_raw
    if rt.id0_weight_increase:
        cert_store = jnp.where(
            id0, jnp.maximum(cert_raw, jnp.sqrt(jnp.maximum(cert_raw, 0.0))),
            cert_raw)
    # per-frame Gaussian training label at the refined position
    # (track -> get_label_function, keep_track.py:566-576)
    train_y = _frame_label(rt, state["sigma"], state["pos"], sample_pos,
                           sample_scale)

    updated = _update_memory_keeptrack(rt, state, clf_feat[0], box_crop,
                                       train_y, lr, cert_store)
    mem_keys = ("memory_feat", "memory_boxes", "memory_labels", "certainties",
                "sample_weights", "num_stored", "prev_replace_ind")
    state = {**state, **{k: jnp.where(update_ok, updated[k], state[k])
                         for k in mem_keys}}

    # the certainty-zeroing quirk: computing the optimizer weights mutates
    # the stored certainties through a tensor view — sub-threshold entries
    # are PERMANENTLY zeroed on every update frame, including the sample
    # stored this frame (update_classifier:1689-1697)
    if rt.use_certainty_for_weight_computation:
        certs = state["certainties"]
        certs = jnp.where(update_ok & (certs < rt.certainty_ths), 0.0, certs)
        state = {**state, "certainties": certs}
        w_opt = state["sample_weights"] * certs
    else:
        w_opt = state["sample_weights"]

    # hard-negative re-optimization is skipped when the sample's (unboosted)
    # certainty is below the threshold (update_classifier:1665-1669)
    hn_iter = jnp.where(cert_raw < rt.certainty_ths, 0, rt.net_opt_hn_iter) \
        if rt.use_certainty_for_weight_computation else rt.net_opt_hn_iter
    num_iter = jnp.where(
        ~update_ok, 0,
        jnp.where(hard_neg, hn_iter,
                  jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                            rt.net_opt_update_iter, 0)))
    new_filter = model.apply(
        params, state["filter"], state["memory_feat"],
        state["memory_labels"], w_opt, num_iter,
        method=DiMPNet.optimize_filter_hinge)
    state = {**state, "filter": new_filter}

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, presence


class KeepTrackTracker:
    """OO facade (BaseTracker API).

    With rt.use_learned_matcher (default), peak association runs through the
    SuperGlue-style PeakMatcher + DescriptorExtractor
    (models/peak_matching.py); pass trained weights via `matcher_params`
    ({'desc': ..., 'matcher': ...}) — random init otherwise."""

    def __init__(self, model: DiMPNet, params,
                 runtime: KeepTrackRuntime | None = None,
                 matcher_params=None):
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
                dvars = desc_mod.init(rng,
                                      jnp.zeros((S, S, self.rt.desc_feat_dim)),
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
