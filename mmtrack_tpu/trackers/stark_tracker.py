"""STARK-S/ST tracker runtime.

Rebuild of RGBD/models/SPT/lib/test/tracker/stark_s.py (+ stark_st dynamic
template): template embedded ONCE at init (the reference caches the backbone
output dict, stark_s.py forward_backbone), per frame one search embed +
transformer + corner decode; no Hanning window (pure regression). The ST
variant keeps a dynamic second template refreshed when the score head is
confident at the update interval.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.stark import STARK
from mmtrack_tpu.ops.box import clip_box
from mmtrack_tpu.ops.crop import crop_att_mask, crop_resize_normalized
from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH


@dataclass(frozen=True)
class STARKRuntime:
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 5.0
    search_size: int = 320
    margin: float = 10.0
    dynamic_template: bool = False       # STARK-ST
    update_interval: int = 200
    update_threshold: float = 0.5


def _mean_std(channels: int):
    return (jnp.asarray(MEAN_6CH[:channels]), jnp.asarray(STD_6CH[:channels]))


def stark_init_state(rt: STARKRuntime, model: STARK, params, frame, init_box):
    mean, std = _mean_std(frame.shape[-1])
    patch, _ = crop_resize_normalized(frame, init_box, rt.template_factor,
                                      rt.template_size, mean, std)
    att = crop_att_mask(init_box, rt.template_factor, rt.template_size,
                        frame.shape[0], frame.shape[1])
    z_c, z_d, z_pos, z_m = model.apply(params, patch[None], att[None],
                                       method=STARK.embed)
    state = {"box": init_box.astype(jnp.float32),
             "z_tokens": z_c[0], "z_pos": z_pos[0], "z_mask": z_m[0],
             "frame_num": jnp.asarray(0, jnp.int32)}  # stark_st.py: 0 at init
    if model.six_channel:
        state["z_tokens_d"] = z_d[0]
    if rt.dynamic_template:
        state["z_dyn"] = z_c[0]
        state["z_dyn_pos"] = z_pos[0]
        state["z_dyn_mask"] = z_m[0]
        if model.six_channel:
            state["z_dyn_d"] = z_d[0]
    return state


def stark_step_from_crop(rt: STARKRuntime, model: STARK, params, state,
                         search, search_att_mask, resize_factor,
                         img_h, img_w):
    """Embed + transformer + box/score heads + map-back + clip from an
    already-normalized search crop + its pixel attention mask (the tail
    of STARK_ST.track, stark_st.py:67-90). Shared by the fused device
    path and the bit-exact host-preprocessing path. Returns
    (new_box, score)."""
    x_c, x_d, x_pos, x_m = model.apply(params, search[None],
                                       search_att_mask[None],
                                       method=STARK.embed)

    z_c = state["z_tokens"][None]
    z_d = state.get("z_tokens_d")
    z_d = z_d[None] if z_d is not None else None
    z_pos = state["z_pos"][None]
    z_m = state["z_mask"][None]
    if rt.dynamic_template:
        z_c = jnp.concatenate([z_c, state["z_dyn"][None]], axis=1)
        if z_d is not None:
            z_d = jnp.concatenate([z_d, state["z_dyn_d"][None]], axis=1)
        z_pos = jnp.concatenate([z_pos, state["z_dyn_pos"][None]], axis=1)
        z_m = jnp.concatenate([z_m, state["z_dyn_mask"][None]], axis=1)

    dec, mem = model.apply(params, z_c, z_d, z_pos, x_c, x_d, x_pos,
                           z_m, x_m, method=STARK.transformer)
    pred = model.apply(params, dec, mem, method=STARK.forward_box_head)[0]

    score = jnp.asarray(1.0)
    if model.score_head:
        score = model.apply(params, dec, method=STARK.predict_score)[0]

    # map back: cxcywh [0,1] crop coords -> image
    pred_img = pred * rt.search_size / resize_factor
    prev = state["box"]
    half_side = 0.5 * rt.search_size / resize_factor
    cx = pred_img[0] + (prev[0] + 0.5 * prev[2] - half_side)
    cy = pred_img[1] + (prev[1] + 0.5 * prev[3] - half_side)
    box = jnp.stack([cx - 0.5 * pred_img[2], cy - 0.5 * pred_img[3],
                     pred_img[2], pred_img[3]])
    return clip_box(box, img_h, img_w, margin=rt.margin), score


def stark_track_step(rt: STARKRuntime, model: STARK, params, state, frame):
    H, W = frame.shape[0], frame.shape[1]
    mean, std = _mean_std(frame.shape[-1])
    state = {**state, "frame_num": state["frame_num"] + 1}
    search, resize_factor = crop_resize_normalized(
        frame, state["box"], rt.search_factor, rt.search_size, mean, std)
    att = crop_att_mask(state["box"], rt.search_factor, rt.search_size, H, W)
    box, score = stark_step_from_crop(rt, model, params, state, search, att,
                                      resize_factor, float(H), float(W))
    state = {**state, "box": box}

    # ST dynamic template refresh: exactly the reference's gate
    # (SPT/lib/test/tracker/stark_st.py:91-99: `frame_id % update_i == 0
    # and conf_score > 0.5` replaces z_dict_list[1]; the cls head runs
    # every frame). Default update_intervals=[200] -> one extra template.
    if rt.dynamic_template:
        do_update = ((state["frame_num"] % rt.update_interval) == 0) \
            & (score > rt.update_threshold)
        patch, _ = crop_resize_normalized(frame, box, rt.template_factor,
                                          rt.template_size, mean, std)
        att_z = crop_att_mask(box, rt.template_factor, rt.template_size, H, W)
        z_new_c, z_new_d, z_new_pos, z_new_m = model.apply(
            params, patch[None], att_z[None], method=STARK.embed)
        state = {**state,
                 "z_dyn": jnp.where(do_update, z_new_c[0], state["z_dyn"]),
                 "z_dyn_pos": jnp.where(do_update, z_new_pos[0],
                                        state["z_dyn_pos"]),
                 "z_dyn_mask": jnp.where(do_update, z_new_m[0],
                                         state["z_dyn_mask"])}
        if z_new_d is not None:
            state["z_dyn_d"] = jnp.where(do_update, z_new_d[0],
                                         state["z_dyn_d"])
    return state, box, score


class STARKTracker:
    """OO facade (BaseTracker API).

    host_preproc=True swaps the fused device crop for the bit-exact host
    cv2 twin of the reference's sample_target (ops/crop.py::
    sample_target_np) and uploads the normalized crop instead of the
    frame — for parity-critical A/B evaluation, as in ViPTTracker. The
    ST template refresh then also crops on host and gates in python
    (same `frame_id % interval == 0 and conf > 0.5` rule,
    stark_st.py:91-99)."""

    def __init__(self, model: STARK, params, runtime: STARKRuntime | None = None,
                 host_preproc: bool = False):
        self.model = model
        self.params = params
        self.rt = runtime or STARKRuntime()
        self.host_preproc = host_preproc
        self._init_fn = jax.jit(partial(stark_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(stark_track_step, self.rt, self.model))
        self._crop_step_fn = jax.jit(
            partial(stark_step_from_crop, self.rt, self.model))
        self._embed_fn = jax.jit(
            lambda p, patch, att: self.model.apply(p, patch[None], att[None],
                                                   method=STARK.embed))
        self.state = None

    def _host_crop(self, image: np.ndarray, box, factor: float, size: int):
        from mmtrack_tpu.ops.crop import sample_target_np

        crop, rf, att = sample_target_np(np.asarray(image),
                                         np.asarray(box, np.float64),
                                         factor, size)
        c = crop.shape[-1]
        normalized = ((crop.astype(np.float32) / 255.0 - MEAN_6CH[:c])
                      / STD_6CH[:c])
        return jnp.asarray(normalized), rf, jnp.asarray(att, bool)

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        if self.host_preproc:
            rt = self.rt
            patch, _, att = self._host_crop(image, info["init_bbox"],
                                            rt.template_factor,
                                            rt.template_size)
            z_c, z_d, z_pos, z_m = self._embed_fn(self.params, patch, att)
            self.state = {"box": box, "z_tokens": z_c[0],
                          "z_pos": z_pos[0], "z_mask": z_m[0],
                          "frame_num": jnp.asarray(0, jnp.int32)}
            if self.model.six_channel:
                self.state["z_tokens_d"] = z_d[0]
            if rt.dynamic_template:
                self.state["z_dyn"] = z_c[0]
                self.state["z_dyn_pos"] = z_pos[0]
                self.state["z_dyn_mask"] = z_m[0]
                if self.model.six_channel:
                    self.state["z_dyn_d"] = z_d[0]
        else:
            self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        if self.host_preproc:
            rt = self.rt
            H, W = image.shape[0], image.shape[1]
            self.state = {**self.state,
                          "frame_num": self.state["frame_num"] + 1}
            prev = np.asarray(self.state["box"], np.float64)
            search, rf, att = self._host_crop(image, prev, rt.search_factor,
                                              rt.search_size)
            box, score = self._crop_step_fn(
                self.params, self.state, search, att, jnp.float32(rf),
                float(H), float(W))
            self.state = {**self.state, "box": box}
            if rt.dynamic_template \
                    and int(self.state["frame_num"]) % rt.update_interval == 0 \
                    and float(score) > rt.update_threshold:
                patch, _, att_z = self._host_crop(
                    image, np.asarray(box, np.float64),
                    rt.template_factor, rt.template_size)
                z_c, z_d, z_pos, z_m = self._embed_fn(self.params, patch,
                                                      att_z)
                self.state = {**self.state, "z_dyn": z_c[0],
                              "z_dyn_pos": z_pos[0], "z_dyn_mask": z_m[0]}
                if z_d is not None:
                    self.state["z_dyn_d"] = z_d[0]
        else:
            self.state, box, score = self._step_fn(self.params, self.state,
                                                   jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
