"""STM mask tracker — space-time memory segmentation as one jitted step.

Rebuild of the keep_track fork's STM tracker
(RGBD/models/keep_track_vot2021/pytracking/tracker/stm/stm.py:17-354),
single-object mode (probabilities carry the reference's K=2
soft-aggregation sharpening — models/stm.py segment). Per tracked
frame:

  - crop the search region around the current position (replicate
    border, the shared sample_patch geometry),
  - segment against the memory bank PLUS the previous frame's key/value
    (this_keys = cat(keys, prev_key), stm.py:108-112),
  - memorize the prediction as the new prev key/value,
  - commit prev into the bank on the memory_skip_rate schedule with the
    reference's first-frame-protected truncation — expressed here as a
    STATIC ring: slot 0 is the init frame, slots 1..T-1 a circular
    buffer, a validity mask folds un-written slots out of the attention
    softmax (vs the reference's unbounded concat + slicing),
  - mask -> position via the probability center of mass ('md_hack'
    seg_to_bb_mode keeps the size fixed, stm.py:193-198; 'var' also
    implemented), paste the crop probabilities into image coordinates
    (zero fill, convert_mask_crop_to_im, stm.py:248-269).

The fork ships NO parameter file for STM (and no checkpoint hook-up —
initialize_features loads params.network_path); constants below are the
tracker code's .get defaults on a 384 px crop (divisible by the
stride-16 memory grid).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.stm import STMNet
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.trackers.lwl_tracker import (_crop_geometry,
                                              _crop_mask_nearest)


@dataclass(frozen=True)
class STMRuntime:
    image_sample_size: int = 384
    search_area_scale: float = 5.0
    feat_stride: int = 16
    mem_slots: int = 20            # max_mem_sz analog (static ring)
    memory_skip_rate: int = 5      # to_memorize schedule (stm.py:50)
    seg_to_bb_mode: str = "md_hack"
    seg_to_bb_sz_factor: float = 4.0
    min_mask_area: float = -10.0   # .get default: never gate
    max_scale_change: tuple[float, float] = (0.95, 1.1)
    mask_threshold: float = 0.5

    @property
    def feat_sz(self) -> int:
        return self.image_sample_size // self.feat_stride


def _to_unit(patch: jnp.ndarray) -> jnp.ndarray:
    return patch[..., :3] / 255.0


def _seg_to_state(rt: STMRuntime, prob_im, pos, target_sz):
    """get_target_state (stm.py:190-246): 'md_hack' = center of mass only;
    'var' also re-estimates the size."""
    H, W = prob_im.shape
    total = prob_im.sum()
    safe = jnp.maximum(total, 1e-6)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    row = prob_im.sum(axis=1)
    col = prob_im.sum(axis=0)
    e_y = (row * ys).sum() / safe
    e_x = (col * xs).sum() / safe
    new_pos = jnp.stack([e_y, e_x])
    if rt.seg_to_bb_mode == "var":
        e_h = (row * (ys - e_y) ** 2).sum() / safe
        e_w = (col * (xs - e_x) ** 2).sum() / safe
        new_sz = jnp.stack([jnp.sqrt(jnp.maximum(e_h, 0.0)),
                            jnp.sqrt(jnp.maximum(e_w, 0.0))]) \
            * rt.seg_to_bb_sz_factor
    else:  # md_hack: size untouched
        new_sz = target_sz
    ok = total >= rt.min_mask_area
    return jnp.where(ok, new_pos, pos), jnp.where(ok, new_sz, target_sz)


def _paste_prob(rt: STMRuntime, prob, sample_pos, sample_scale, im_hw):
    """convert_mask_crop_to_im (stm.py:248-269): like LWL's paste but with
    ZERO fill outside the search region."""
    S = rt.image_sample_size
    H, W = im_hw
    out_sz = jnp.floor(S * sample_scale)
    r1 = jnp.trunc(sample_pos[0] - 0.5 * out_sz)
    c1 = jnp.trunc(sample_pos[1] - 0.5 * out_sz)

    def axis(n, origin):
        u = jnp.arange(n, dtype=jnp.float32) - origin
        inside = (u >= 0) & (u < out_sz)
        # torch F.interpolate(scale_factor=s): src = (dst + 0.5)/s - 0.5
        # (the scale is NOT recomputed from the floored output size)
        src = jnp.clip((u + 0.5) / sample_scale - 0.5, 0.0, S - 1.0)
        return src, inside

    ys, in_y = axis(H, r1)
    xs, in_x = axis(W, c1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]

    def tap(yi, xi):
        return prob[jnp.clip(yi, 0, S - 1)][:, jnp.clip(xi, 0, S - 1)]

    v = ((1 - fy) * (1 - fx) * tap(y0, x0) + (1 - fy) * fx * tap(y0, x0 + 1)
         + fy * (1 - fx) * tap(y0 + 1, x0) + fy * fx * tap(y0 + 1, x0 + 1))
    return jnp.where(in_y[:, None] & in_x[None, :], v, 0.0)


def stm_init_state(rt: STMRuntime, model: STMNet, params, frame,
                   init_box_xywh, init_mask=None):
    """initialize (stm.py:40-94): crop around the target, memorize the
    init mask. Box-only init rasterizes the box as the mask."""
    H, W = frame.shape[0], frame.shape[1]
    x, y, w, h = init_box_xywh
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])
    if init_mask is None:
        iy = jnp.arange(H, dtype=jnp.float32)[:, None]
        ix = jnp.arange(W, dtype=jnp.float32)[None, :]
        init_mask = (((iy >= y) & (iy < y + h)) &
                     ((ix >= x) & (ix < x + w))).astype(jnp.float32)

    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    S = rt.image_sample_size
    szl, tl, sample_pos, sample_scale = _crop_geometry(rt, pos, target_scale)
    patch = _to_unit(crop_at(frame, pos, szl, S, origin_yx=tl))
    mask_crop = _crop_mask_nearest(init_mask, tl, szl, S)

    k, v = model.apply(params, patch[None], mask_crop[None],
                       method="memorize")
    T = rt.mem_slots
    hF = rt.feat_sz
    keys = jnp.zeros((T, hF, hF, model.keydim)).at[0].set(k[0])
    vals = jnp.zeros((T, hF, hF, model.valdim)).at[0].set(v[0])
    valid = jnp.zeros((T,)).at[0].set(1.0)
    return {
        "pos": pos, "target_sz": target_sz,
        "target_scale": target_scale, "base_target_sz": base_target_sz,
        "mem_keys": keys, "mem_vals": vals, "mem_valid": valid,
        "mem_ptr": jnp.asarray(1, jnp.int32),   # ring pointer (slot 0 = init)
        "prev_key": k[0], "prev_val": v[0],
        "frame_num": jnp.asarray(1, jnp.int32),
    }


def stm_track_step(rt: STMRuntime, model: STMNet, params, state: dict,
                   frame: jnp.ndarray):
    """One tracked frame (stm.py:96-177). Returns
    (state, box_xywh, mask (H, W) bool, max_prob)."""
    S = rt.image_sample_size
    szl, tl, sample_pos, sample_scale = _crop_geometry(
        rt, state["pos"], state["target_scale"])
    patch = _to_unit(crop_at(frame, state["pos"], szl, S, origin_yx=tl))
    return stm_step_from_patch(rt, model, params, state, patch,
                               sample_pos, sample_scale,
                               (float(frame.shape[0]),
                                float(frame.shape[1])))


def stm_step_from_patch(rt: STMRuntime, model: STMNet, params, state: dict,
                        patch: jnp.ndarray, sample_pos, sample_scale,
                        img_hw):
    """The tracked-frame step from an already-extracted [0, 1] crop + its
    geometry (everything in stm.py:96-177 after sample_patch_multiscale);
    shared by the device path and the trajectory parity harness."""
    H, W = int(img_hw[0]), int(img_hw[1])  # static: the paste's grids
    state = {**state, "frame_num": state["frame_num"] + 1}
    S = rt.image_sample_size

    # attention bank = static ring + the previous frame appended
    keys = jnp.concatenate([state["mem_keys"], state["prev_key"][None]], 0)
    vals = jnp.concatenate([state["mem_vals"], state["prev_val"][None]], 0)
    valid = jnp.concatenate([state["mem_valid"], jnp.ones((1,))], 0)
    prob = model.apply(params, patch[None], keys, vals, valid,
                       method="segment")

    # memorize the prediction as the new prev (stm.py:136-137)
    k, v = model.apply(params, patch[None], prob[None], method="memorize")

    # commit prev into the ring on the schedule (stm.py:133-134, 100-107);
    # slot 0 (init) is protected, the rest is circular
    do_commit = ((state["frame_num"] - 1) % rt.memory_skip_rate) == 0
    slot = 1 + (state["mem_ptr"] - 1) % (rt.mem_slots - 1)
    mem_keys = jnp.where(do_commit,
                         state["mem_keys"].at[slot].set(state["prev_key"]),
                         state["mem_keys"])
    mem_vals = jnp.where(do_commit,
                         state["mem_vals"].at[slot].set(state["prev_val"]),
                         state["mem_vals"])
    mem_valid = jnp.where(do_commit,
                          state["mem_valid"].at[slot].set(1.0),
                          state["mem_valid"])
    mem_ptr = jnp.where(do_commit, state["mem_ptr"] + 1, state["mem_ptr"])

    prob_im = _paste_prob(rt, prob, sample_pos, sample_scale, (H, W))
    pos, target_sz = _seg_to_state(rt, prob_im, state["pos"],
                                   state["target_sz"])
    new_scale = jnp.sqrt(jnp.prod(target_sz)
                         / jnp.prod(state["base_target_sz"]))
    change = new_scale / state["target_scale"]
    lo, hi = rt.max_scale_change
    new_scale = jnp.where(change < lo, state["target_scale"] * lo,
                          jnp.where(change > hi, state["target_scale"] * hi,
                                    new_scale))
    target_sz = state["base_target_sz"] * new_scale

    mask_im = prob_im > rt.mask_threshold
    state = {
        **state,
        "pos": pos, "target_sz": target_sz, "target_scale": new_scale,
        "mem_keys": mem_keys, "mem_vals": mem_vals, "mem_valid": mem_valid,
        "mem_ptr": mem_ptr,
        "prev_key": k[0], "prev_val": v[0],
    }
    box = jnp.concatenate([
        (pos - (target_sz - 1) / 2)[::-1], target_sz[::-1]])
    return state, box, mask_im, jnp.max(prob_im)


class STMTracker:
    """OO facade; mask-capable."""

    predicts_segmentation_mask = True

    def __init__(self, model: STMNet, params,
                 runtime: STMRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or STMRuntime()
        self._init_fn = jax.jit(partial(stm_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(stm_track_step, self.rt, self.model))
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
