"""KeepTrack: distractor-aware peak matching and identity tracking.

Rebuild of RGBD/models/keep_track_vot2021/pytracking/tracker/keep_track/
keep_track.py (MatchingMemory:30, PeakCollection:251-364,
localize_target_by_peak_matching:946, extract_descriptors_and_keypoints:1178)
re-designed for fixed shapes:
  - per frame, the top-K local maxima of the classifier score map become
    candidate peaks with descriptors gathered from backbone features and
    keypoints in IMAGE coordinates (extract_descriptors_and_keypoints maps
    score-map cells through the search-area box, keep_track.py:1188-1193),
  - peaks are matched to the previous frame's peaks by the learned
    SuperGlue-style matcher (models/peak_matching.py) or a mutual-nearest
    cosine fallback,
  - fixed-size identity bookkeeping follows the reference's rules: keep the
    selected identity while matched, drop low-probability assignments,
    flag not_found when the selected object vanishes, re-detect on a
    sufficiently strong new peak, and jump to a stronger peak only when its
    identity postdates the last occlusion event,
  - the release configuration runs with
    disable_chronological_occlusion_redetection_logic=True
    (parameter/keep_track/release.py:80): the occlusion markers are pinned
    to 0, so redetection/jump only gate on peak score.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_ID = -1


@dataclass(frozen=True)
class PeakMatchConfig:
    num_peaks: int = 8
    nms_radius: int = 2                   # local_max_ks=5 -> radius 2
    peak_threshold: float = 0.05
    match_sim_threshold: float = 0.5
    match_dist_threshold: float = 6.0     # score-map cells
    drop_prob_threshold: float = 0.6
    drop_prob_low_score: float = 0.85
    low_peak_score: float = 0.2
    certain_score: float = 0.75
    redetect_score: float = 0.25
    # disable_chronological_occlusion_redetection_logic (release.py:80):
    # occlusion markers stay 0 so any identity qualifies for jump/redetect.
    disable_chrono: bool = True


def extract_peaks(score_map: jnp.ndarray, cfg: PeakMatchConfig):
    """Top-K local maxima of a (H, W) score map after NxN max-pool NMS,
    sorted descending by score (find_local_maxima, ltr/models/
    memory_learning/peak_prediction.py:25-45: ks=5 max-pool mask + strict
    score > th + 'Highest peak first' argsort).

    Returns (scores (K,), coords (K, 2) float (y, x), valid (K,));
    sub-threshold slots carry score 0."""
    H, W = score_map.shape
    r = cfg.nms_radius
    padded = jnp.pad(score_map, r, constant_values=-jnp.inf)
    windows = jnp.stack([
        padded[r + dy:r + dy + H, r + dx:r + dx + W]
        for dy in range(-r, r + 1) for dx in range(-r, r + 1)], axis=0)
    is_max = score_map >= windows.max(axis=0)
    cand = jnp.where(is_max & (score_map > cfg.peak_threshold), score_map, -jnp.inf)
    scores, idx = jax.lax.top_k(cand.reshape(-1), cfg.num_peaks)
    coords = jnp.stack([idx // W, idx % W], axis=1).astype(jnp.float32)
    valid = jnp.isfinite(scores)
    return jnp.where(valid, scores, 0.0), coords, valid


def gather_descriptors(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """L2-normalized feature vectors at peak cells. feat (H, W, C) in the
    score-map grid; coords (K, 2)."""
    H, W = feat.shape[0], feat.shape[1]
    ys = jnp.clip(coords[:, 0].astype(jnp.int32), 0, H - 1)
    xs = jnp.clip(coords[:, 1].astype(jnp.int32), 0, W - 1)
    d = feat[ys, xs]
    return d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-6)


def peak_keypoints(coords: jnp.ndarray, score_sz: int, tl_yx, crop_side):
    """Score-map cells -> IMAGE-coordinate keypoints in (y, x) order
    (extract_descriptors_and_keypoints, keep_track.py:1188-1193:
    kpt = box_extent * cell/(S-1) + box_origin where the search_area_box
    extent is crop_side - 1, keep_track.py:504)."""
    scale = (crop_side - 1.0) / (score_sz - 1.0)
    return coords * scale + tl_yx[None, :]


def match_peaks(desc_prev, coords_prev, valid_prev, desc_cur, coords_cur,
                valid_cur, cfg: PeakMatchConfig):
    """Mutual-nearest-neighbor assignment with positional gating — the
    dependency-free stand-in for the learned matcher.

    Returns (match_idx (K,) int — index into prev peaks or -1,
    match_prob (K,))."""
    sim = desc_cur @ desc_prev.T  # (K, K)
    dist = jnp.linalg.norm(coords_cur[:, None] - coords_prev[None], axis=-1)
    gate = (dist < cfg.match_dist_threshold) & valid_prev[None] & valid_cur[:, None]
    sim = jnp.where(gate, sim, -jnp.inf)

    best_prev = jnp.argmax(sim, axis=1)                # cur -> prev
    best_cur = jnp.argmax(sim, axis=0)                 # prev -> cur
    k = jnp.arange(cfg.num_peaks)
    mutual = best_cur[best_prev] == k
    best_sim = sim[k, best_prev]
    ok = mutual & (best_sim > cfg.match_sim_threshold)
    prob = jax.nn.sigmoid(4.0 * (best_sim - cfg.match_sim_threshold))
    return jnp.where(ok, best_prev, NEG_ID), jnp.where(ok, prob, 0.0)


def init_peak_state(cfg: PeakMatchConfig, scores, coords, kpts, valid,
                    descriptors, certain=True):
    """Fresh peak collection (PeakCollection.__init__, keep_track.py:252-274).

    `certain` is peak_selection_is_certain=(frame_num < 10) — may be a
    traced bool. When uncertain, the id counter, selected id, and both
    occlusion markers start at 1 instead of 0 (keep_track.py:266-270); the
    highest peak still carries the selected id either way."""
    K = cfg.num_peaks
    certain = jnp.asarray(certain)
    base = jnp.where(certain, 0, 1).astype(jnp.int32)
    object_ids = jnp.where(valid, base + jnp.arange(K), NEG_ID)
    return {
        "peak_scores": scores,
        "peak_coords": coords,
        "peak_kpts": kpts,
        "peak_valid": valid,
        "peak_desc": descriptors,
        "object_ids": object_ids,
        "best_obj_score": jnp.where(valid, scores, 0.0),
        "selected_object_id": base,
        "object_id_cntr": base + valid.sum().astype(jnp.int32),
        "occlusion_id_state": base,
        "occl_certain_state": base,
        "selection_certain": certain,
        "flag_not_found": jnp.asarray(False),
    }


def update_peak_state(state: dict, cfg: PeakMatchConfig, scores, coords,
                      kpts, valid, descriptors, match_fn=None):
    """One frame of identity bookkeeping (PeakCollection.update,
    keep_track.py:276-364). Returns (new_state, selected_peak_idx (int, -1
    if lost), flag_not_found).

    match_fn(prev_state, scores, coords, kpts, valid, descriptors) ->
    (match_idx, match_prob) overrides the mutual-NN matcher — the learned
    SuperGlue-style matcher (models/peak_matching.py) plugs in here."""
    K = cfg.num_peaks
    if match_fn is not None:
        match_idx, match_prob = match_fn(state, scores, coords, kpts, valid,
                                         descriptors)
    else:
        match_idx, match_prob = match_peaks(
            state["peak_desc"], state["peak_coords"], state["peak_valid"],
            descriptors, coords, valid, cfg)

    matched = match_idx >= 0
    prev_obj = jnp.where(matched, state["object_ids"][jnp.maximum(match_idx, 0)],
                         NEG_ID)
    prev_best = jnp.where(matched,
                          state["best_obj_score"][jnp.maximum(match_idx, 0)], 0.0)

    # drop low-probability assignments of the selected object
    # (keep_track.py:293-298, drop_low_assignment_prob)
    is_selected = prev_obj == state["selected_object_id"]
    prob_too_low = (match_prob < cfg.drop_prob_threshold) | \
        ((match_prob < cfg.drop_prob_low_score) & (scores < cfg.low_peak_score))
    drop = is_selected & prob_too_low
    keep_match = matched & ~drop

    # new identities for unmatched/dropped valid peaks, in peak order
    # (keep_track.py:297+308: fresh ids from the running counter)
    fresh_rank = jnp.cumsum((~keep_match & valid).astype(jnp.int32)) - 1
    fresh_ids = state["object_id_cntr"] + fresh_rank
    object_ids = jnp.where(keep_match, prev_obj,
                           jnp.where(valid, fresh_ids, NEG_ID))
    best_obj_score = jnp.where(keep_match, jnp.maximum(prev_best, scores),
                               jnp.where(valid, scores, 0.0))
    new_cntr = state["object_id_cntr"] + (~keep_match & valid).sum()

    sel = state["selected_object_id"]
    sel_mask = (object_ids == sel) & valid
    detected = sel_mask.any()
    sel_peak = jnp.argmax(sel_mask)  # ids unique per frame -> the match

    # certainty: strong historical score on the selected track, evaluated
    # pre-jump (keep_track.py:321-322)
    certain = state["selection_certain"] | \
        (detected & (best_obj_score[sel_peak] > cfg.certain_score))

    # jump to the strongest peak if its track beats the selected one and its
    # identity postdates the last occlusion (keep_track.py:325-335)
    top_is_other = detected & (sel_peak != 0) & valid[0] & \
        (best_obj_score[0] > best_obj_score[sel_peak]) & \
        (object_ids[0] >= state["occlusion_id_state"])
    sel = jnp.where(top_is_other, object_ids[0], sel)
    sel_peak = jnp.where(top_is_other, 0, sel_peak)

    # lost: the occlusion markers advance BEFORE the redetect scan
    # (keep_track.py:337-354). object_id_cntr_state is the PRE-FRAME
    # counter (captured at update start, keep_track.py:282), so only peaks
    # assigned fresh ids on this very frame can steal the identity.
    # With disable_chrono (release config) both markers pin to 0 and the
    # certainty flag is forced off on every newly-lost frame.
    lost_now = ~detected
    newly_lost = lost_now & ~state["flag_not_found"]
    occl_state = jnp.where(
        newly_lost,
        jnp.where(certain, state["object_id_cntr"],
                  state["occl_certain_state"]),
        state["occlusion_id_state"])
    occl_certain = jnp.where(newly_lost & certain, state["object_id_cntr"],
                             state["occl_certain_state"])
    if cfg.disable_chrono:
        occl_state = jnp.where(newly_lost, 0, occl_state)
        occl_certain = jnp.where(newly_lost, 0, occl_certain)
    redet_mask = valid & (scores > cfg.redetect_score) & \
        (object_ids >= occl_state)
    can_redetect = lost_now & redet_mask.any()
    redet_peak = jnp.argmax(redet_mask)   # first qualifying peak (:356-364)
    sel = jnp.where(can_redetect, object_ids[redet_peak], sel)
    sel_peak_out = jnp.where(detected, sel_peak,
                             jnp.where(can_redetect, redet_peak, NEG_ID))
    # certainty resets when the target newly disappears (keep_track.py:345)
    certain = jnp.where(newly_lost, False, certain)

    new_state = {
        "peak_scores": scores, "peak_coords": coords, "peak_kpts": kpts,
        "peak_valid": valid,
        "peak_desc": descriptors, "object_ids": object_ids,
        "best_obj_score": best_obj_score,
        "selected_object_id": sel.astype(jnp.int32),
        "object_id_cntr": new_cntr.astype(jnp.int32),
        "occlusion_id_state": occl_state.astype(jnp.int32),
        "occl_certain_state": occl_certain.astype(jnp.int32),
        "selection_certain": certain,
        "flag_not_found": sel_peak_out < 0,
    }
    return new_state, sel_peak_out, sel_peak_out < 0
