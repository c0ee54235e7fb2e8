"""OSTrack-online: dual-template OSTrack with confidence-gated refresh.

Rebuild of RGBD/models/OSTrack/lib/test/tracker/ostrack_online.py:26-328 as
a functional state + ONE jitted step, at the published online-entry
configuration (lib/test/parameter/ostrack_online.py +
experiments/ostrack/ostrack320_elimination_cls_t2m12_ep50.yaml: search
320 px / factor 5, template 128 px / factor 2, DropBlock token
elimination at layers (3,6,9) keep 0.7 under the CTR_POINT template
mask, ScoreTransformer with 2 class-attn + 12 MLP layers):

  - the init template and one online template run as a template batch of 2
    with the search tiled to match (ostrack_online.py:116-124);
  - backbone token streams are merged by averaging over the template batch
    and the CENTER head decodes from the merged map under a Hann window
    (lines 136-168);
  - the ScoreTransformer cls head scores the predicted box against the
    init template's full z+x token sequence -> confidence
    (forward_cls_head(cat_template_search[0:1], ...), lines 143-151);
  - main-lobe analysis of the merged score map (psr_dynamic,
    lib/test/utils/psr.py:40-76) — 8-connected flood fill from the peak,
    done as a lax.while_loop of 3x3 max-pool dilations;
  - the online template refreshes at the new state only when
    main_lobe_area <= threshold AND confidence >= 0.5 (lines 154-158,
    193-198).

The 'redetect' option falls back to the init-template maps when the merged
peak is weak (lines 171-177); the published config ships it off
(TEST.REDETECT default False).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.heads import CenterPredictor, cal_bbox
from mmtrack_tpu.models.vipt import (ScoreTransformer, ViPTrack,
                                     ce_keep_schedule, generate_ctr_mask)
from mmtrack_tpu.ops.box import clip_box
from mmtrack_tpu.ops.crop import crop_resize_normalized
from mmtrack_tpu.ops.window import hann2d
from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH


@dataclass(frozen=True)
class OSTrackOnlineRuntime:
    """Published constants: experiments/ostrack/
    ostrack320_elimination_cls_t2m12_ep50.yaml TEST block + the
    lib/config/ostrack/config.py defaults it inherits."""
    template_factor: float = 2.0        # TEST.TEMPLATE_FACTOR
    template_size: int = 128            # TEST.TEMPLATE_SIZE
    search_factor: float = 5.0          # TEST.SEARCH_FACTOR
    search_size: int = 320              # TEST.SEARCH_SIZE
    stride: int = 16
    margin: float = 10.0
    cls_threshold: float = 0.5          # ostrack_online.py:60
    main_lobe_score_ratio: float = 0.2  # line 58
    main_lobe_area_threshold: int = 10  # TEST.MAIN_LOB_AREA_THR default
    redetect: bool = False              # TEST.REDETECT default
    redetect_threshold: float = 0.05    # TEST.REDE_THRESH default
    # backbone elimination (MODEL.BACKBONE PRUNING_LOC / KEEP_RATIO /
    # TEMPLATE_RANGE) — active at inference in the reference ('prune' in
    # BACKBONE.TYPE threads box_mask_z, ostrack_online.py:93-96)
    ce_loc: tuple = (3, 6, 9)
    ce_keep_ratio: tuple = (0.7, 0.7, 0.7)
    ce_template_range: str = "CTR_POINT"
    # ScoreTransformer depth (HEAD.NUM_CLS_ATTN_LAYERS=2,
    # NUM_CLS_MLP_LAYERS=12 — the 't2m12' in the experiment name)
    cls_attn_layers: int = 2
    cls_mlp_layers: int = 12

    @property
    def feat_sz(self) -> int:
        return self.search_size // self.stride

    @property
    def ce_keep_lens(self) -> tuple:
        return ce_keep_schedule(self.feat_sz ** 2, self.ce_loc,
                                self.ce_keep_ratio)


def main_lobe(score_map: jnp.ndarray, ratio: float):
    """(area, mask) of the 8-connected component containing the peak of
    `score_map` above ratio*peak — psr_dynamic's scipy label() replaced by
    iterative dilation from the peak seed."""
    S = score_map.shape[-1]
    flat = score_map.reshape(-1)
    peak = flat.max()
    region = score_map > ratio * peak
    seed = jnp.zeros_like(flat).at[jnp.argmax(flat)].set(1.0).reshape(S, S)

    def dilate(m):
        p = jnp.pad(m, 1)
        win = jax.lax.reduce_window(p, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                    "VALID")
        return win

    def cond(carry):
        prev, cur = carry
        return jnp.any(prev != cur)

    def body(carry):
        _, cur = carry
        grown = jnp.where(region, dilate(cur) > 0, False).astype(jnp.float32)
        return cur, grown

    init = seed * region.astype(jnp.float32)
    _, mask = jax.lax.while_loop(cond, body, (jnp.zeros_like(seed), init))
    return mask.sum().astype(jnp.int32), mask.astype(bool)


def ostrack_online_init_state(rt: OSTrackOnlineRuntime, frame: jnp.ndarray,
                              init_box: jnp.ndarray) -> dict:
    C = frame.shape[-1]
    mean, std = jnp.asarray(MEAN_6CH[:C]), jnp.asarray(STD_6CH[:C])
    patch, _ = crop_resize_normalized(frame, init_box, rt.template_factor,
                                      rt.template_size, mean, std)
    return {"box": init_box.astype(jnp.float32),
            "template": patch,
            "online_template": patch,
            "frame_num": jnp.asarray(0, jnp.int32)}


def ostrack_online_step_from_patch(rt: OSTrackOnlineRuntime, model: ViPTrack,
                                   cls_model: ScoreTransformer, params,
                                   cls_params, state: dict,
                                   search: jnp.ndarray, resize_factor,
                                   im_hw):
    """The step from an already-normalized (S,S,C) search patch and its
    resize factor — the trajectory parity harness feeds the reference's
    own crops through this; the full step wraps it with the fused device
    crop. Returns (state with the new box but the online template NOT yet
    refreshed, box, conf, update_ok, aux maps)."""
    H, W = im_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    prev = state["box"]

    templates = jnp.stack([state["template"], state["online_template"]])
    searches = jnp.tile(search[None], (2, 1, 1, 1))
    box_mask_z = generate_ctr_mask(rt.template_size // rt.stride,
                                   rt.ce_template_range)
    out = model.apply(params, templates, searches, box_mask_z=box_mask_z,
                      ce_keep_lens=rt.ce_keep_lens)

    S = rt.feat_sz
    lens_x = S * S
    tokens = out["backbone_tokens"]                      # (2, L, C)
    merged = tokens.mean(axis=0, keepdims=True)          # (1, L, C)
    feat = merged[:, -lens_x:].reshape(1, S, S, -1)

    head = CenterPredictor(channel=model.head_channel, feat_sz=S)
    score_m, size_m, offset_m = head.apply(
        {"params": params["params"]["box_head"]}, feat)

    window = hann2d(S, centered=True)
    response = score_m * window[None]
    pred, _ = cal_bbox(response, size_m, offset_m)

    if rt.redetect:
        # weak merged peak -> fall back to the init-template maps (lines
        # 171-177); per-template maps come from the full forward
        f1_score = out["score_map"][0:1]
        f1_size, f1_offset = out["size_map"][0:1], out["offset_map"][0:1]
        idx = jnp.argmax(response.reshape(-1))
        tracked = f1_score.reshape(-1)[idx]
        f1_pred, _ = cal_bbox(f1_score * window[None], f1_size, f1_offset)
        pred = jnp.where(tracked <= rt.redetect_threshold, f1_pred, pred)

    # the cls head scores the predicted box against the INIT template's
    # full z+x token sequence — reference ostrack_online.py:143-151 calls
    # forward_cls_head(cat_template_search[0:1], pred_box) with the box
    # decoded from the WINDOWED merged maps
    conf = cls_model.apply(cls_params, tokens[0:1], pred)[0]
    area, _ = main_lobe(score_m[0], rt.main_lobe_score_ratio)
    update_ok = (area <= rt.main_lobe_area_threshold) \
        & (conf >= rt.cls_threshold)

    # map_box_back + clip (lines 179-184)
    pred_img = pred[0] * rt.search_size / resize_factor
    half_side = 0.5 * rt.search_size / resize_factor
    cx = pred_img[0] + (prev[0] + 0.5 * prev[2] - half_side)
    cy = pred_img[1] + (prev[1] + 0.5 * prev[3] - half_side)
    box = jnp.stack([cx - 0.5 * pred_img[2], cy - 0.5 * pred_img[3],
                     pred_img[2], pred_img[3]])
    box = clip_box(box, float(H), float(W), margin=rt.margin)
    state = {**state, "box": box}
    aux = {"merged_score": score_m[0], "response": response[0],
           "f1_score": out["score_map"], "area": area}
    return state, box, conf, update_ok, aux


def ostrack_online_track_step(rt: OSTrackOnlineRuntime, model: ViPTrack,
                              cls_model: ScoreTransformer, params, cls_params,
                              state: dict, frame: jnp.ndarray):
    H, W = frame.shape[0], frame.shape[1]
    C = frame.shape[-1]
    mean, std = jnp.asarray(MEAN_6CH[:C]), jnp.asarray(STD_6CH[:C])

    search, resize_factor = crop_resize_normalized(
        frame, state["box"], rt.search_factor, rt.search_size, mean, std)
    state, box, conf, update_ok, _aux = ostrack_online_step_from_patch(
        rt, model, cls_model, params, cls_params, state, search,
        resize_factor, (H, W))

    # template refresh at the NEW state (lines 193-198)
    cand, _ = crop_resize_normalized(frame, box, rt.template_factor,
                                     rt.template_size, mean, std)
    state = {**state,
             "online_template": jnp.where(update_ok, cand,
                                          state["online_template"])}
    return state, box, conf, update_ok


class OSTrackOnlineTracker:
    """OO facade. `cls_params` holds the ScoreTransformer head weights
    (trained by the cls stage, OSTrack lib/train TRAIN_CLS) at the
    published t2m12 depth."""

    def __init__(self, model: ViPTrack, params, cls_params,
                 runtime: OSTrackOnlineRuntime | None = None,
                 cls_model: ScoreTransformer | None = None):
        self.model = model
        self.rt = runtime or OSTrackOnlineRuntime()
        self.cls_model = cls_model or ScoreTransformer(
            d_model=model.embed_dim, n_layers=self.rt.cls_attn_layers,
            n_mlp_layers=self.rt.cls_mlp_layers)
        self.params = params
        self.cls_params = cls_params
        self._init_fn = jax.jit(partial(ostrack_online_init_state, self.rt))
        self._step_fn = jax.jit(partial(ostrack_online_track_step, self.rt,
                                        self.model, self.cls_model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, conf, upd = self._step_fn(
            self.params, self.cls_params, self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(conf),
                "update_flag": bool(upd)}
