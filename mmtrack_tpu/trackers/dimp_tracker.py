"""DiMP / DeT online tracker runtime — fully on-device functional loop.

Rebuild of RGBD/models/DeT/pytracking/tracker/dimp/dimp.py:25-740 as a pure
TrackerState pytree + ONE jitted step:
  - sample extraction (replicate border) + dual-backbone features,
  - classification by the online-learned filter,
  - ATOM advanced localization (not_found / uncertain / hard_negative flag
    lattice via distractor analysis, dimp.py:239-304) as a lax select chain,
  - ATOM IoUNet box refinement by gradient ascent on predicted IoU
    (dimp.py:652-740) with jax.grad supplying d(IoU)/d(box),
  - fixed 50-slot sample memory with min-weight replacement
    (dimp.py:412-510) as masked scatter updates,
  - steepest-descent filter re-optimization with DYNAMIC iteration count
    (hard-negative 1 / every-20th 2 / else 0, dimp.py:607-650) through one
    compiled fori_loop.

Constants default to DeT_DiMP50_Max
(pytracking/parameter/dimp/DeT_DiMP50_Max.py:12-63).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.dimp import AtomIoUNet, DiMPNet
from mmtrack_tpu.ops.augment import dimp_init_augmentations, feature_dropout
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

FLAG_NORMAL, FLAG_NOT_FOUND, FLAG_UNCERTAIN, FLAG_HARD_NEG = 0, 1, 2, 3


@dataclass(frozen=True)
class DiMPRuntime:
    image_sample_size: int = 288
    search_area_scale: float = 5.0
    feat_stride: int = 16
    kernel_size: int = 4
    sample_memory_size: int = 50
    learning_rate: float = 0.01
    init_samples_minimum_weight: float = 0.25
    train_skipping: int = 20
    net_opt_iter: int = 10
    net_opt_update_iter: int = 2
    net_opt_hn_iter: int = 1
    target_not_found_threshold: float = 0.25
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    hard_negative_learning_rate: float = 0.02
    target_inside_ratio: float = 0.2
    # dimp.py:87/125-131: with use_iou_net=False the IoUNet is skipped and
    # update_state(new_pos, sample_scales[scale_ind]) re-quantizes the
    # scale from the sample geometry (clamped to the init scale bounds,
    # dimp.py:77-78 + 488-497) — classifier-only tracking
    use_iou_net: bool = True
    iounet_k: int = 3
    num_init_random_boxes: int = 9
    box_jitter_pos: float = 0.1
    box_jitter_sz: float = 0.5
    maximal_aspect_ratio: float = 6.0
    box_refinement_iter: int = 5
    box_refinement_step_length: float = 1.0
    # 'default' ascends in box space scaled by size (dimp.py:727-752);
    # 'relative' in the PrDiMP [cx/sw, cy/sh, log w, log h] parametrization
    # (optimize_boxes_relative, keep_track.py / dimp.py:755-790)
    box_refinement_space: str = "default"
    # sample_patch border handling (preprocessing.py:57-150): 'replicate'
    # or 'inside'/'inside_major' (shrink to image, shift crop inside)
    border_mode: str = "replicate"
    patch_max_scale_change: float = float("inf")
    # 'none' | 'softmax': PrDiMP localizes on the softmax predictive
    # distribution over the flattened score map (dimp.py:202-213)
    score_preprocess: str = "none"
    # First-frame augmentation set (DeT_DiMP50_Max.py:30-39; the image
    # transforms live in ops/augment.py, dropout is feature-space).
    use_augmentation: bool = True
    augmentation_expansion_factor: int = 2
    random_shift_factor: float = 1.0 / 3.0
    aug_dropout_num: int = 2
    aug_dropout_prob: float = 0.2

    @property
    def num_init_samples(self) -> int:
        if not self.use_augmentation:
            return 1
        from mmtrack_tpu.ops.augment import num_image_augmentations
        return num_image_augmentations() + self.aug_dropout_num

    @property
    def feat_sz(self) -> int:
        return self.image_sample_size // self.feat_stride  # 18

    @property
    def score_sz(self) -> int:
        return self.feat_sz + (self.kernel_size + 1) % 2  # 19 for even kernel


def _normalize(patch: jnp.ndarray) -> jnp.ndarray:
    c = patch.shape[-1]  # 6-ch composed frames or plain RGB
    return (patch / 255.0 - jnp.asarray(MEAN_6CH[:c])) \
        / jnp.asarray(STD_6CH[:c])


def _sample_geometry(rt: DiMPRuntime, pos_yx, target_scale,
                     out_size: int | None = None, im_hw=None):
    """Reference-exact crop geometry (sample_patch,
    pytracking/features/preprocessing.py:57-150, df=1 path): integer
    center by truncation (pos.long()), side by round, and the
    tl = posl - (szl-1)//2 / br = posl + szl//2 + 1 split. Returns
    (crop side szl, top-left (y, x), sample_pos, sample_scale).

    With rt.border_mode 'inside'/'inside_major' (and im_hw given), the
    crop is first shrunk so it fits the image (shrink factor clamped to
    [1, patch_max_scale_change], truncated to integer size) and then
    shifted inside, including the halving correction when it still
    overhangs both edges (preprocessing.py:78-125) — the super_dimp /
    KeepTrack configuration (keep_track/release.py:14-15).

    Deviation kept on purpose: the reference pre-downsamples by an integer
    factor df when the crop is >~2.1x the output (strided slicing, then
    bilinear) — a memory optimization for host torch. Our crop is a single
    bilinear gather at full resolution (strictly higher quality); df is
    not modeled.
    """
    S = rt.image_sample_size if out_size is None else out_size
    posl = jnp.trunc(pos_yx)                       # torch .long(): trunc to 0
    if rt.border_mode in ("inside", "inside_major") and im_hw is not None:
        im_sz = jnp.asarray(im_hw, jnp.float32)
        shrink = (target_scale * S) / im_sz        # per-axis
        shrink = shrink.max() if rt.border_mode == "inside" else shrink.min()
        shrink = jnp.clip(shrink, 1.0, rt.patch_max_scale_change)
        # (sample_sz / shrink).long(): truncation, then round is identity
        szl = jnp.maximum(jnp.trunc(target_scale * S / shrink), 2.0)
    else:
        im_sz = None
        szl = jnp.maximum(jnp.round(target_scale * S), 2.0)
    tl = posl - jnp.floor((szl - 1.0) / 2.0)
    br = posl + jnp.floor(szl / 2.0) + 1.0
    if im_sz is not None:
        # shift the crop inside the image (preprocessing.py:115-125)
        shift = jnp.clip(-tl, 0.0, None) - jnp.clip(br - im_sz, 0.0, None)
        tl = tl + shift
        br = br + shift
        # if still outside on both sides, center the overhang
        outside = jnp.floor((jnp.clip(-tl, 0.0, None)
                             + jnp.clip(br - im_sz, 0.0, None)) / 2.0)
        shift = (-tl - outside) * (outside > 0)
        tl = tl + shift
        br = br + shift
    sample_pos = 0.5 * (tl + br - 1.0)
    sample_scale = szl / S
    return szl, tl, sample_pos, sample_scale


def _get_iounet_box(rt: DiMPRuntime, pos_yx, sz_hw, sample_pos, sample_scale):
    """Image-coords target -> xywh box in the crop frame (dimp.py:get_iounet_box)."""
    box_center = (pos_yx - sample_pos) / sample_scale + (rt.image_sample_size - 1) / 2
    box_sz = sz_hw / sample_scale
    ul = box_center - (box_sz - 1) / 2
    return jnp.concatenate([ul[::-1], box_sz[::-1]])  # (x, y, w, h)


def _max2d(scores: jnp.ndarray):
    """(val, (row, col)) of the max of a 2D map."""
    idx = jnp.argmax(scores)
    H, W = scores.shape
    return scores.reshape(-1)[idx], jnp.stack([idx // W, idx % W]).astype(jnp.float32)


def dimp_init_state(rt: DiMPRuntime, model: DiMPNet, params, frame: jnp.ndarray,
                    init_box_xywh: jnp.ndarray) -> dict:
    """First-frame initialization (dimp.py:25-91).

    With rt.use_augmentation (the DeT_DiMP50_Max default) the initial filter
    is optimized over the full augmented sample set — identity, 4 relative
    shifts, flip, 3 blurs, 4 rotations as one static image batch
    (generate_init_samples, dimp.py:331-400) plus 2 feature-space dropout
    copies (init_classifier, dimp.py:546-549) — and all N samples seed the
    memory with weight 1/N (init_memory, dimp.py:412-431). IoU modulation
    uses only the identity sample (init_iou_net, iounet_augmentation=False).
    """
    x, y, w, h = init_box_xywh
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])

    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    # init crop geometry (dimp.py:354 + generate_init_samples): the init
    # sample is centered at pos.round() and the target box in crop coords
    # uses sample_scale = target_scale exactly (not the rounded szl/S).
    init_sample_pos = jnp.round(pos)
    init_sample_scale = target_scale
    rng = jax.random.PRNGKey(0)
    box_crop = _get_iounet_box(rt, pos, target_sz, init_sample_pos,
                               init_sample_scale)

    if rt.use_augmentation:
        rng, rng_shift, rng_drop = jax.random.split(rng, 3)
        S_im = rt.image_sample_size
        S_e = S_im * rt.augmentation_expansion_factor
        szl_e, tl_e, _, _ = _sample_geometry(rt, init_sample_pos,
                                             target_scale, out_size=S_e)
        expanded = _normalize(crop_at(frame, init_sample_pos, szl_e, S_e,
                                      origin_yx=tl_e))
        patches, shifts = dimp_init_augmentations(
            expanded, S_im, rng_shift,
            random_shift_factor=rt.random_shift_factor)

        bfeat = model.apply(params, patches, method="extract_backbone")
        clf_feat = model.apply(params, bfeat, method="extract_classification_feat")
        if rt.aug_dropout_num > 0:
            drop = feature_dropout(clf_feat[0], rng_drop, rt.aug_dropout_num,
                                   rt.aug_dropout_prob)
            clf_feat = jnp.concatenate([clf_feat, drop], axis=0)

        # target box per sample: + (shift_x, shift_y) (init_target_boxes,
        # dimp.py:402-410); dropout copies reuse the identity transform.
        shifts = jnp.concatenate(
            [shifts, jnp.zeros((rt.aug_dropout_num, 2), jnp.float32)], axis=0)
        boxes = box_crop[None] + jnp.concatenate(
            [shifts[:, ::-1], jnp.zeros_like(shifts)], axis=1)
        bfeat0 = {k: v[:1] for k, v in bfeat.items()}
    else:
        szl, tl, _, _ = _sample_geometry(rt, init_sample_pos, target_scale)
        patch = _normalize(crop_at(frame, init_sample_pos, szl,
                                   rt.image_sample_size, origin_yx=tl))
        bfeat = model.apply(params, patch[None], method="extract_backbone")
        clf_feat = model.apply(params, bfeat, method="extract_classification_feat")
        boxes = box_crop[None]
        bfeat0 = bfeat

    return dimp_assemble_init_state(
        rt, model, params, clf_feat, boxes, bfeat0, box_crop,
        pos, target_sz, target_scale, base_target_sz, rng)


def dimp_assemble_init_state(rt: DiMPRuntime, model: DiMPNet, params,
                             clf_feat, boxes, bfeat0, box_crop,
                             pos, target_sz, target_scale, base_target_sz,
                             rng) -> dict:
    """Build the tracker state from already-extracted init samples
    (init_classifier + init_memory + init_iou_net, dimp.py:412-589):
    filter init + steepest-descent optimization over the N samples, IoU
    modulation from the identity sample, memory seeded with weight 1/N.

    Split out so the trajectory parity harness can feed the REFERENCE'S
    own recorded init patches through our network and state machine."""
    N = clf_feat.shape[0]
    w0 = model.apply(params, clf_feat, boxes, method="get_filter")
    filt = model.apply(params, w0, clf_feat, boxes, None,
                       rt.net_opt_iter, method="optimize_filter")

    mod3, mod4 = model.apply(
        params, [bfeat0["layer2"], bfeat0["layer3"]], box_crop[None],
        method=lambda m, f, b: m.bb_regressor.get_modulation(f, b))

    M = rt.sample_memory_size
    S = rt.feat_sz
    C = clf_feat.shape[-1]
    memory_feat = jnp.zeros((M, S, S, C), jnp.float32).at[:N].set(clf_feat)
    memory_boxes = jnp.zeros((M, 4), jnp.float32).at[:N].set(boxes)
    sample_weights = jnp.zeros((M,), jnp.float32).at[:N].set(1.0 / N)

    return {
        "pos": pos, "target_sz": target_sz,
        "target_scale": target_scale, "base_target_sz": base_target_sz,
        "filter": filt,
        "memory_feat": memory_feat, "memory_boxes": memory_boxes,
        "sample_weights": sample_weights,
        "num_stored": jnp.asarray(N, jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "iou_mod3": mod3[0], "iou_mod4": mod4[0],
        "rng": rng,
        # localization flag of the most recent tracked frame (FLAG_*);
        # -1 until the first track step — exposed for the free-running
        # A/B's event-sequence comparison
        "last_flag": jnp.asarray(-1, jnp.int32),
    }


def _localize_advanced(rt: DiMPRuntime, scores, state, sample_pos, sample_scale):
    """ATOM distractor-aware localization (dimp.py:239-304); returns
    (translation_yx, flag, max_score)."""
    S = rt.score_sz
    output_sz = float(S - (rt.kernel_size + 1) % 2)
    score_center = (S - 1) / 2.0

    max1, disp1 = _max2d(scores)
    target_disp1 = disp1 - score_center
    scale_fac = (rt.image_sample_size / output_sz) * sample_scale
    trans1 = target_disp1 * scale_fac

    # mask the target neighborhood, find the second peak — bounds exactly
    # as dimp.py:270-275: round() (half-even, = python round) with the
    # asymmetric +1 bottom/right edge, clamped to the map
    neigh = rt.target_neighborhood_scale * (state["target_sz"] / sample_scale) \
        * (output_sz / rt.image_sample_size)
    iy = jnp.arange(S, dtype=jnp.float32)[:, None]
    ix = jnp.arange(S, dtype=jnp.float32)[None, :]
    top = jnp.maximum(jnp.round(disp1[0] - neigh[0] / 2), 0.0)
    bottom = jnp.minimum(jnp.round(disp1[0] + neigh[0] / 2 + 1), float(S))
    left = jnp.maximum(jnp.round(disp1[1] - neigh[1] / 2), 0.0)
    right = jnp.minimum(jnp.round(disp1[1] + neigh[1] / 2 + 1), float(S))
    inside = ((iy >= top) & (iy < bottom)) & ((ix >= left) & (ix < right))
    masked = jnp.where(inside, 0.0, scores)
    max2, disp2 = _max2d(masked)
    target_disp2 = disp2 - score_center
    trans2 = target_disp2 * scale_fac

    prev_vec = (state["pos"] - sample_pos) / scale_fac
    disp_norm1 = jnp.sqrt(((target_disp1 - prev_vec) ** 2).sum())
    disp_norm2 = jnp.sqrt(((target_disp2 - prev_vec) ** 2).sum())
    disp_thresh = rt.displacement_scale * math.sqrt(S * S) / 2

    # flag lattice (evaluated densely, selected by priority)
    not_found = max1 < rt.target_not_found_threshold
    distractor = max2 > rt.distractor_threshold * max1
    hn_d1 = distractor & (disp_norm2 > disp_thresh) & (disp_norm1 < disp_thresh)
    hn_d2 = distractor & (disp_norm2 < disp_thresh) & (disp_norm1 > disp_thresh)
    uncertain_d = distractor & ~hn_d1 & ~hn_d2
    hard_neg2 = (~distractor & (max2 > rt.hard_negative_threshold * max1)
                 & (max2 > rt.target_not_found_threshold))

    flag = jnp.where(
        not_found, FLAG_NOT_FOUND,
        jnp.where(hn_d1, FLAG_HARD_NEG,
                  jnp.where(hn_d2, FLAG_HARD_NEG,
                            jnp.where(uncertain_d, FLAG_UNCERTAIN,
                                      jnp.where(hard_neg2, FLAG_HARD_NEG,
                                                FLAG_NORMAL)))))
    translation = jnp.where(hn_d2 & ~not_found, trans2, trans1)
    return translation, flag.astype(jnp.int32), max1


def _refine_box(rt: DiMPRuntime, model, params, bfeat, state, sample_pos,
                sample_scale, rng):
    """IoUNet gradient-ascent refinement (dimp.py:652-740). Returns
    (new_pos, new_sz, new_scale, ok)."""
    init_box = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)
    if rt.num_init_random_boxes > 0:
        sq = jnp.sqrt(jnp.prod(init_box[2:]))
        rand_factor = sq * jnp.asarray([rt.box_jitter_pos, rt.box_jitter_pos,
                                        rt.box_jitter_sz, rt.box_jitter_sz])
        min_edge = jnp.min(init_box[2:]) / 3
        r = (jax.random.uniform(rng, (rt.num_init_random_boxes, 4)) - 0.5) * rand_factor
        new_sz = jnp.maximum(init_box[2:] + r[:, 2:], min_edge)
        new_center = init_box[:2] + init_box[2:] / 2 + r[:, :2]
        jittered = jnp.concatenate([new_center - new_sz / 2, new_sz], axis=1)
        boxes = jnp.concatenate([init_box[None], jittered], axis=0)  # (P, 4)
    else:
        boxes = init_box[None]

    iou_feat = model.apply(params, [bfeat["layer2"], bfeat["layer3"]],
                           method=lambda m, f: m.bb_regressor.get_iou_feat(f))
    mod = (state["iou_mod3"][None], state["iou_mod4"][None])

    def iou_of(props):
        return model.apply(params, mod, iou_feat, props[None],
                           method=lambda m, a, b, c: m.bb_regressor.predict_iou(a, b, c))[0]

    # NB the reference returns `outputs` from the LAST loop iteration — the
    # IoU of the boxes BEFORE their final gradient step (dimp.py:752) — and
    # ranks the post-step boxes by it. Reproduce that off-by-one exactly.
    zeros_iou = jnp.zeros((boxes.shape[0],), boxes.dtype)
    if rt.box_refinement_space == "relative":
        # PrDiMP/KeepTrack parametrization [cx/sw, cy/sh, log w, log h]
        # normalized by the FIRST box's size (optimize_boxes_relative +
        # bbutils.rect_to_rel/rel_to_rect)
        sz_norm = boxes[:1, 2:]

        def to_rect(rel):
            sz = jnp.exp(rel[:, 2:])
            c = rel[:, :2] * sz_norm
            return jnp.concatenate([c - 0.5 * sz, sz], axis=1)

        def ascent_rel(_, carry):
            rel, _prev = carry
            ious, vjp = jax.vjp(lambda b: iou_of(to_rect(b)), rel)
            (g,) = vjp(jnp.ones_like(ious))
            return (rel + rt.box_refinement_step_length * g, ious)

        c0 = boxes[:, :2] + 0.5 * boxes[:, 2:]
        rel0 = jnp.concatenate([c0 / sz_norm, jnp.log(boxes[:, 2:])], axis=1)
        rel, ious = jax.lax.fori_loop(0, rt.box_refinement_iter, ascent_rel,
                                      (rel0, zeros_iou))
        boxes = to_rect(rel)
    else:
        def ascent(_, carry):
            bxs, _prev = carry
            # one forward + one VJP per iteration, like the reference's
            # forward + backward (optimize_boxes_default, dimp.py:727-752)
            ious, vjp = jax.vjp(iou_of, bxs)
            (g,) = vjp(jnp.ones_like(ious))
            sz_rep = jnp.tile(bxs[:, 2:], (1, 2))
            return (bxs + rt.box_refinement_step_length * g * sz_rep, ious)

        boxes, ious = jax.lax.fori_loop(0, rt.box_refinement_iter, ascent,
                                        (boxes, zeros_iou))

    boxes = boxes.at[:, 2:].set(jnp.maximum(boxes[:, 2:], 1.0))
    ar = boxes[:, 2] / boxes[:, 3]
    keep = (ar < rt.maximal_aspect_ratio) & (ar > 1 / rt.maximal_aspect_ratio)
    ious_k = jnp.where(keep, ious, -jnp.inf)
    top_iou, top_idx = jax.lax.top_k(
        ious_k, min(rt.iounet_k, boxes.shape[0]))
    top_boxes = boxes[top_idx]
    valid = jnp.isfinite(top_iou)
    denom = jnp.maximum(valid.sum(), 1)
    pred = (top_boxes * valid[:, None]).sum(0) / denom

    new_pos = (pred[:2] + pred[2:] / 2)[::-1]  # (y, x) crop coords
    new_pos = (new_pos - (rt.image_sample_size - 1) / 2) * sample_scale + sample_pos
    new_sz = pred[2:][::-1] * sample_scale
    new_scale = jnp.sqrt(jnp.prod(new_sz) / jnp.prod(state["base_target_sz"]))
    return new_pos, new_sz, new_scale, keep.any()


def _update_memory(rt: DiMPRuntime, state, clf_feat, box_crop, lr):
    """Min-weight sample replacement (dimp.py:433-510), fixed shapes."""
    sw = state["sample_weights"]
    num = state["num_stored"]
    prev = state["prev_replace_ind"]
    num_init = rt.num_init_samples
    s_ind = num_init  # init_samples_minimum_weight is set -> protect init slots

    cand = jnp.where(jnp.arange(rt.sample_memory_size) >= s_ind, sw, jnp.inf)
    r_min = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num < rt.sample_memory_size, num, r_min)

    first_update = prev < 0
    sw1 = jnp.where(first_update, sw / (1 - lr), sw)
    new_w = jnp.where(first_update, lr, sw1[jnp.maximum(prev, 0)] / (1 - lr))
    sw1 = sw1.at[r_ind].set(new_w)
    sw1 = sw1 / sw1.sum()
    # enforce minimum weight on the init sample
    init_sum = sw1[:num_init].sum()
    need = init_sum < rt.init_samples_minimum_weight
    rest = sw1[num_init:].sum()
    sw2 = sw1 / (rt.init_samples_minimum_weight + rest)
    sw2 = sw2.at[:num_init].set(rt.init_samples_minimum_weight / num_init)
    sw1 = jnp.where(need, sw2, sw1)

    return {
        **state,
        "memory_feat": state["memory_feat"].at[r_ind].set(clf_feat),
        "memory_boxes": state["memory_boxes"].at[r_ind].set(box_crop),
        "sample_weights": sw1,
        "num_stored": jnp.minimum(num + 1, rt.sample_memory_size),
        "prev_replace_ind": r_ind,
    }


def dimp_track_step(rt: DiMPRuntime, model: DiMPNet, params, state: dict,
                    frame: jnp.ndarray):
    """One tracked frame (dimp.py:94-176). Returns (state, box_xywh, score)."""
    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"],
        im_hw=(frame.shape[0], frame.shape[1]))
    patch = crop_at(frame, state["pos"], crop_sz, rt.image_sample_size,
                    origin_yx=tl)
    return dimp_step_from_patch(rt, model, params, state, patch,
                                sample_pos, sample_scale,
                                (float(frame.shape[0]), float(frame.shape[1])))


def dimp_step_from_patch(rt: DiMPRuntime, model: DiMPNet, params, state: dict,
                         patch: jnp.ndarray, sample_pos, sample_scale,
                         img_hw):
    """The tracked-frame step from an already-extracted raw (0..255) sample
    patch + its geometry (everything in dimp.py:94-176 after
    extract_backbone_features's sample_patch call). Shared by the fused
    device path and the trajectory parity harness, which feeds the
    reference's own crops."""
    H, W = img_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}

    patch = _normalize(patch)
    bfeat = model.apply(params, patch[None], method="extract_backbone")
    clf_feat = model.apply(params, bfeat, method="extract_classification_feat")
    scores = model.apply(params, state["filter"], clf_feat,
                         method="classify")[0]
    if rt.score_preprocess == "softmax":
        # PrDiMP: localize on the softmax predictive distribution
        # (dimp.py:205-213, softmax_reg with reg=None)
        scores = jax.nn.softmax(scores.reshape(-1)).reshape(scores.shape)

    translation, flag, max_score = _localize_advanced(
        rt, scores, state, sample_pos, sample_scale)
    found = flag != FLAG_NOT_FOUND

    # classifier position update, clamped inside the image (update_state)
    new_pos = sample_pos + translation
    img_sz = jnp.asarray([H, W], jnp.float32)
    if rt.use_iou_net:
        inside_offset = (rt.target_inside_ratio - 0.5) * state["target_sz"]
        new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                              inside_offset)
        state = {**state, "pos": jnp.where(found, new_pos, state["pos"])}

        # IoUNet refinement
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
        # dimp.py:130-131: update_state(new_pos, sample_scales[scale_ind])
        # — scale re-quantized from the integer crop geometry, clamped to
        # the init bounds (dimp.py:77-78), target_sz re-derived, and the
        # inside clamp uses the NEW size (update_state:490-497)
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

    # memory + filter update
    update_ok = (flag == FLAG_NORMAL) | (flag == FLAG_HARD_NEG)
    hard_neg = flag == FLAG_HARD_NEG
    lr = jnp.where(hard_neg, rt.hard_negative_learning_rate, rt.learning_rate)
    box_crop = _get_iounet_box(rt, state["pos"], state["target_sz"],
                               sample_pos, sample_scale)

    updated = _update_memory(rt, state, clf_feat[0], box_crop, lr)
    state = jax.tree.map(lambda a, b: jnp.where(update_ok, a, b), updated, state)

    num_iter = jnp.where(
        ~update_ok, 0,
        jnp.where(hard_neg, rt.net_opt_hn_iter,
                  jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                            rt.net_opt_update_iter, 0)))
    new_filter = model.apply(
        params, state["filter"], state["memory_feat"], state["memory_boxes"],
        state["sample_weights"], num_iter, method="optimize_filter")
    state = {**state, "filter": new_filter,
             "last_flag": jnp.asarray(flag, jnp.int32)}

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, max_score


def prdimp50_runtime(**overrides) -> DiMPRuntime:
    """PrDiMP-50 tracker constants (AR fork
    pytracking/parameter/dimp/prdimp50.py:12-67): 352px samples at scale
    6, inside_major borders, softmax score preprocessing with a 0.04
    not-found threshold, relative-space box refinement (2.5e-3 x 10)."""
    base = dict(image_sample_size=22 * 16, search_area_scale=6.0,
                border_mode="inside_major", patch_max_scale_change=1.5,
                score_preprocess="softmax", target_not_found_threshold=0.04,
                box_refinement_space="relative", box_refinement_iter=10,
                box_refinement_step_length=2.5e-3)
    base.update(overrides)
    return DiMPRuntime(**base)


class DiMPTracker:
    """OO facade with the reference BaseTracker API (initialize/track)."""

    def __init__(self, model: DiMPNet, params, runtime: DiMPRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or DiMPRuntime()
        self._init_fn = jax.jit(partial(dimp_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(dimp_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
