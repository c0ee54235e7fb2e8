"""LWL online segmentation tracker — the VOS loop as one jitted step.

Rebuild of the keep_track fork's LWL tracker
(RGBD/models/keep_track_vot2021/pytracking/tracker/lwl/lwl.py:16-585).
Per tracked frame, in ONE compiled step over static shapes:

  - update the target model from the PREVIOUS frame's full-image
    segmentation probabilities: crop them back to the previous search
    region (zero-border mask crop), push (features, mask) into the
    fixed-slot memory, re-run the few-shot GN learner on a schedule
    (lwl.py:126-137, 550-585),
  - re-estimate the target box from those probabilities: probability
    center-of-mass + sqrt(variance) * 4 ('var' seg_to_bb_mode,
    lwl.py:281-305), gated by min_mask_area and clipped scale change,
  - crop the current frame, run backbone + target-model features, apply
    the few-shot filter, decode the mask (models/lwl.py),
  - paste the crop scores back into image coordinates with -100 outside
    the search region (convert_scores_crop_to_image, lwl.py:335-364) —
    done here as a single inverse-map bilinear gather over the static
    (H, W) grid instead of the reference's dynamic-size
    interpolate-then-paste (identical sampling formula, no dynamic
    shapes),
  - output the binary mask, its bounding box, and the probability map
    that becomes the next frame's update signal.

Box-only init: models with `use_box_encoder` run the LWL-box variant's
learned box->mask encoder on the full frame (lwl_box_net.py +
label_encoder.ResidualDS16FeatSWBoxCatMultiBlock, trained by
make_lwl_box_train_step); plain models fall back to rasterizing the box
as a rectangle mask.

The reference ships NO parameter file for LWL (pytracking/parameter/
holds only keep_track + alpha_refine); constants marked (*) below are
upstream-paper choices, the rest are the tracker code's own `.get`
defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.lwl import LWLNet
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH


@dataclass(frozen=True)
class LWLRuntime:
    image_sample_size: int = 30 * 16        # (*) 480, the super-dimp grid
    search_area_scale: float = 6.0          # (*)
    feat_stride: int = 16
    sample_memory_size: int = 32            # (*)
    learning_rate: float = 0.1              # (*)
    init_samples_minimum_weight: float = 0.25
    train_skipping: int = 1                 # (*) update schedule
    net_opt_iter: int = 20                  # (*)
    net_opt_update_iter: int = 3            # (*)
    # segmentation -> box ('var' mode is the only one implemented upstream)
    min_mask_area: float = 100.0            # (*) occlusion gate
    seg_to_bb_sz_factor: float = 4.0
    max_scale_change: tuple[float, float] = (0.95, 1.1)  # (*)
    border_mode: str = "replicate"
    update_target_model: bool = True

    @property
    def feat_sz(self) -> int:
        return self.image_sample_size // self.feat_stride


def _normalize(patch: jnp.ndarray) -> jnp.ndarray:
    # RGB-only network; composed 6-channel frames keep their color triplet
    patch = patch[..., :3]
    return (patch / 255.0 - jnp.asarray(MEAN_6CH[:3])) / jnp.asarray(STD_6CH[:3])


def _centered_pos(rt: LWLRuntime, model: LWLNet, pos, target_scale):
    """get_centered_sample_pos (lwl.py:314-317)."""
    off = (rt.feat_sz + model.filter_size) % 2
    return pos + off * target_scale * rt.image_sample_size / (2 * rt.feat_sz)


def _crop_geometry(rt: LWLRuntime, pos, target_scale):
    """sample_patch geometry, replicate mode (preprocessing.py df=1 path)."""
    S = rt.image_sample_size
    posl = jnp.trunc(pos)
    szl = jnp.maximum(jnp.round(target_scale * S), 2.0)
    tl = posl - jnp.floor((szl - 1.0) / 2.0)
    br = posl + jnp.floor(szl / 2.0) + 1.0
    sample_pos = 0.5 * (tl + br - 1.0)
    sample_scale = szl / S
    return szl, tl, sample_pos, sample_scale


def _crop_mask_nearest(img: jnp.ndarray, tl, szl, out_sz: int) -> jnp.ndarray:
    """Mask crop matching sample_patch(is_mask=True): integer tl/size crop
    with ZERO padding, then F.interpolate(mode='nearest') — src index =
    floor(dst * in/out) (preprocessing.py:133,145). img (H, W) -> (S, S)."""
    H, W = img.shape
    idx = jnp.floor(jnp.arange(out_sz, dtype=jnp.float32)
                    * (szl / out_sz)).astype(jnp.int32)
    ys = tl[0].astype(jnp.int32) + idx
    xs = tl[1].astype(jnp.int32) + idx
    vy = (ys >= 0) & (ys < H)
    vx = (xs >= 0) & (xs < W)
    g = img[jnp.clip(ys, 0, H - 1)][:, jnp.clip(xs, 0, W - 1)]
    return jnp.where(vy[:, None] & vx[None, :], g, 0.0)


def _seg_to_box(rt: LWLRuntime, prob_im: jnp.ndarray, pos, target_sz):
    """get_target_state 'var' mode (lwl.py:281-305); prob_im (H, W)."""
    H, W = prob_im.shape
    total = prob_im.sum()
    safe = jnp.maximum(total, 1e-6)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    row = prob_im.sum(axis=1)
    col = prob_im.sum(axis=0)
    e_y = (row * ys).sum() / safe
    e_x = (col * xs).sum() / safe
    e_h = (row * (ys - e_y) ** 2).sum() / safe
    e_w = (col * (xs - e_x) ** 2).sum() / safe
    new_pos = jnp.stack([e_y, e_x])
    new_sz = jnp.stack([jnp.sqrt(jnp.maximum(e_h, 0.0)),
                        jnp.sqrt(jnp.maximum(e_w, 0.0))]) * rt.seg_to_bb_sz_factor
    ok = total >= rt.min_mask_area
    return jnp.where(ok, new_pos, pos), jnp.where(ok, new_sz, target_sz)


def _paste_scores(rt: LWLRuntime, scores: jnp.ndarray, sample_pos,
                  sample_scale, im_hw) -> jnp.ndarray:
    """convert_scores_crop_to_image (lwl.py:335-364) as an inverse-map
    bilinear gather: out[y, x] samples the (S, S) crop score map at the
    half-pixel-aligned coordinate the reference's interpolate-then-paste
    produces; -100 outside the pasted region."""
    S = rt.image_sample_size
    H, W = im_hw
    out_sz = jnp.floor(S * sample_scale)          # F.interpolate(scale) size
    r1 = jnp.trunc(sample_pos[0] - 0.5 * out_sz)  # int() truncation
    c1 = jnp.trunc(sample_pos[1] - 0.5 * out_sz)

    def axis_coords(n, origin):
        u = jnp.arange(n, dtype=jnp.float32) - origin
        inside = (u >= 0) & (u < out_sz)
        # F.interpolate(scale_factor=s) maps with s ITSELF (torch does not
        # recompute the scale from the floor-truncated output size):
        # src = (dst + 0.5)/s - 0.5
        src = (u + 0.5) / sample_scale - 0.5
        return jnp.clip(src, 0.0, S - 1.0), inside

    ys, in_y = axis_coords(H, r1)
    xs, in_x = axis_coords(W, c1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]

    def tap(yi, xi):
        return scores[jnp.clip(yi, 0, S - 1)][:, jnp.clip(xi, 0, S - 1)]

    v = ((1 - fy) * (1 - fx) * tap(y0, x0) + (1 - fy) * fx * tap(y0, x0 + 1)
         + fy * (1 - fx) * tap(y0 + 1, x0) + fy * fx * tap(y0 + 1, x0 + 1))
    return jnp.where(in_y[:, None] & in_x[None, :], v, -100.0)


def _mask_to_box(mask: jnp.ndarray) -> jnp.ndarray:
    """masks_to_bboxes(fmt='t') (bounding_box_utils.py:160-193): tight
    (x, y, w, h) of the binary mask; an empty mask maps through the
    reference's [0,0,0,0]-vertices path to (0, 0, 1, 1)."""
    H, W = mask.shape
    any_row = mask.any(axis=1)
    any_col = mask.any(axis=0)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    y0 = jnp.min(jnp.where(any_row, ys, H))
    y1 = jnp.max(jnp.where(any_row, ys, -1))
    x0 = jnp.min(jnp.where(any_col, xs, W))
    x1 = jnp.max(jnp.where(any_col, xs, -1))
    nonempty = any_row.any()
    box = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]).astype(jnp.float32)
    return jnp.where(nonempty, box,
                     jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32))


def _update_memory(rt: LWLRuntime, state, feat, mask_crop, lr):
    """Min-weight replacement with protected init slots (lwl.py:464-521)."""
    sw = state["sample_weights"]
    num = state["num_stored"]
    prev = state["prev_replace_ind"]
    num_init = 1

    cand = jnp.where(jnp.arange(rt.sample_memory_size) >= num_init, sw, jnp.inf)
    r_min = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num < rt.sample_memory_size, num, r_min)

    first = prev < 0
    sw1 = jnp.where(first, sw / (1 - lr), sw)
    new_w = jnp.where(first, lr, sw1[jnp.maximum(prev, 0)] / (1 - lr))
    sw1 = sw1.at[r_ind].set(new_w)
    sw1 = sw1 / sw1.sum()
    init_sum = sw1[:num_init].sum()
    need = init_sum < rt.init_samples_minimum_weight
    rest = sw1[num_init:].sum()
    sw2 = sw1 / (rt.init_samples_minimum_weight + rest)
    sw2 = sw2.at[:num_init].set(rt.init_samples_minimum_weight / num_init)
    sw1 = jnp.where(need, sw2, sw1)

    return {
        **state,
        "memory_feat": state["memory_feat"].at[r_ind].set(feat),
        "memory_masks": state["memory_masks"].at[r_ind].set(mask_crop),
        "sample_weights": sw1,
        "num_stored": jnp.minimum(num + 1, rt.sample_memory_size),
        "prev_replace_ind": r_ind,
    }


def lwl_init_state(rt: LWLRuntime, model: LWLNet, params, frame,
                   init_box_xywh, init_mask=None):
    """initialize (lwl.py:27-106). `init_mask` (H, W) float in [0, 1];
    None uses the learned box->mask encoder on the FULL frame when the
    model carries one (lwl.py:59-71, the LWL-box variant), else the
    rectangle rasterization of the box."""
    H, W = frame.shape[0], frame.shape[1]
    x, y, w, h = init_box_xywh
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])

    box_init_raw = None
    if init_mask is None and model.use_box_encoder:
        full = _normalize(frame)[None]
        bf = model.apply(params, full, method="extract_backbone")
        tm = model.apply(params, bf, method="extract_target_model_features")
        box_init_raw = model.apply(params, init_box_xywh[None], tm, bf,
                                   (H, W), method="mask_from_box")[0]
        init_mask = jax.nn.sigmoid(box_init_raw)
    elif init_mask is None:
        iy = jnp.arange(H, dtype=jnp.float32)[:, None]
        ix = jnp.arange(W, dtype=jnp.float32)[None, :]
        init_mask = (((iy >= y) & (iy < y + h)) &
                     ((ix >= x) & (ix < x + w))).astype(jnp.float32)

    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    init_sample_pos = jnp.round(pos)
    szl, tl, sample_pos, sample_scale = _crop_geometry(rt, init_sample_pos,
                                                       target_scale)
    patch = _normalize(crop_at(frame, init_sample_pos, szl,
                               rt.image_sample_size, origin_yx=tl))
    mask_crop = _crop_mask_nearest(init_mask, tl, szl,
                                   rt.image_sample_size)

    bfeat = model.apply(params, patch[None], method="extract_backbone")
    feat = model.apply(params, bfeat,
                       method="extract_target_model_features")[0]
    label, sw = model.apply(params, mask_crop[None], method="encode_labels")
    filt = model.apply(params, feat[None], label, sw, None, rt.net_opt_iter,
                       method="get_filter")

    M = rt.sample_memory_size
    fh = rt.feat_sz
    C = feat.shape[-1]
    S = rt.image_sample_size
    # the init frame's full-image "previous segmentation": the reference
    # stores the RAW +-100 scaled mask (lwl.py:57), so at frame 2 the
    # seg-to-box sum is hugely negative and the min_mask_area gate keeps
    # the init box — reproduced verbatim (later frames store sigmoid
    # probabilities, lwl.py:194-196)
    # box-encoder init stores the decoder's RAW logits (lwl.py:74); mask
    # init the reference's +-100 scaling (lwl.py:57)
    seg_raw = box_init_raw if box_init_raw is not None \
        else (init_mask - 0.5) * 200.0

    return {
        "pos": pos, "target_sz": target_sz,
        "target_scale": target_scale, "base_target_sz": base_target_sz,
        "filter": filt,
        "memory_feat": jnp.zeros((M, fh, fh, C)).at[0].set(feat),
        "memory_masks": jnp.zeros((M, S, S)).at[0].set(mask_crop),
        "sample_weights": jnp.zeros((M,)).at[0].set(1.0),
        "num_stored": jnp.asarray(1, jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "prev_feat": feat,
        "prev_pos": _centered_pos(rt, model, pos, target_scale),
        "prev_scale": target_scale,
        "seg_prob_im": seg_raw,
    }


def lwl_track_step(rt: LWLRuntime, model: LWLNet, params, state: dict,
                   frame: jnp.ndarray):
    """One tracked frame (lwl.py:108-214). Returns
    (state, box_xywh, mask (H, W) bool, max_prob)."""
    H, W = frame.shape[0], frame.shape[1]
    state = {**state, "frame_num": state["frame_num"] + 1}
    prev_prob = state["seg_prob_im"]

    # ---- update the target model from the previous frame's output ----
    if rt.update_target_model:
        szl_p, tl_p, _, _ = _crop_geometry(rt, state["prev_pos"],
                                           state["prev_scale"])
        prev_mask_crop = _crop_mask_nearest(prev_prob, tl_p, szl_p,
                                            rt.image_sample_size)
        can_update = state["frame_num"] > 2
        updated = _update_memory(rt, state, state["prev_feat"],
                                 prev_mask_crop, rt.learning_rate)
        state = jax.tree.map(lambda a, b: jnp.where(can_update, a, b),
                             updated, state)
        num_iter = jnp.where(
            can_update & ((state["frame_num"] - 1) % rt.train_skipping == 0),
            rt.net_opt_update_iter, 0)
        label_m, sw_m = model.apply(params, state["memory_masks"],
                                    method="encode_labels")
        new_filt = model.apply(
            params, state["filter"], state["memory_feat"], label_m, sw_m,
            state["sample_weights"], num_iter, rt.net_opt_update_iter,
            method="optimize_filter")
        state = {**state, "filter": new_filt}

    # ---- box + search region from the previous segmentation ----
    pos, target_sz = _seg_to_box(rt, prev_prob, state["pos"],
                                 state["target_sz"])
    new_scale = jnp.sqrt(jnp.prod(target_sz)
                         / jnp.prod(state["base_target_sz"]))
    change = new_scale / state["target_scale"]
    lo, hi = rt.max_scale_change
    new_scale = jnp.where(change < lo, state["target_scale"] * lo,
                          jnp.where(change > hi, state["target_scale"] * hi,
                                    new_scale))
    target_sz = state["base_target_sz"] * new_scale
    state = {**state, "pos": pos, "target_sz": target_sz,
             "target_scale": new_scale}

    # ---- segment the current frame ----
    c_pos = _centered_pos(rt, model, pos, new_scale)
    szl, tl, sample_pos, sample_scale = _crop_geometry(rt, c_pos, new_scale)
    patch = _normalize(crop_at(frame, c_pos, szl, rt.image_sample_size,
                               origin_yx=tl))
    bfeat = model.apply(params, patch[None], method="extract_backbone")
    feat = model.apply(params, bfeat,
                       method="extract_target_model_features")
    scores = model.apply(params, state["filter"], feat, bfeat,
                         (rt.image_sample_size, rt.image_sample_size),
                         method="segment")[0]
    scores_im = _paste_scores(rt, scores, sample_pos, sample_scale, (H, W))
    prob_im = jax.nn.sigmoid(scores_im)
    mask_im = scores_im > 0.0
    box = _mask_to_box(mask_im)

    state = {
        **state,
        "prev_feat": feat[0],
        "prev_pos": c_pos,
        "prev_scale": new_scale,
        "seg_prob_im": prob_im,
    }
    return state, box, mask_im, jnp.max(prob_im)


class LWLTracker:
    """OO facade; mask-capable (predicts_segmentation_mask)."""

    predicts_segmentation_mask = True

    def __init__(self, model: LWLNet, params,
                 runtime: LWLRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or LWLRuntime()
        self._init_fn = jax.jit(partial(lwl_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(lwl_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        mask = info.get("init_mask")
        mask = None if mask is None else jnp.asarray(
            np.asarray(mask, np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box, mask)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, mask, score = self._step_fn(
            self.params, self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "segmentation": np.asarray(mask),
                "best_score": float(score)}
