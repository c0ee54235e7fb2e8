"""ViPT tracker runtime: a functional, fully-jitted per-frame loop.

Rebuild of ViPT/lib/test/tracker/vipt.py:17-130 and basetracker.py:20-26. The
reference's OO initialize()/track() becomes a pure TrackerState pytree
threaded through `vipt_track_step(params, state, frame)`; crop + normalize +
forward + Hanning penalty + decode + map-back + clip all run inside ONE jit
so a tracked frame costs a single host->device transfer (the frame) and a
single device->host transfer (box + score). The same pure step vmaps over a
`sequences` axis for batched multi-sequence inference (mmtrack_tpu.parallel).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.heads import cal_bbox
from mmtrack_tpu.models.vipt import ViPTrack, ce_keep_schedule, generate_ctr_mask
from mmtrack_tpu.ops.box import clip_box
from mmtrack_tpu.ops.crop import crop_resize_normalized
from mmtrack_tpu.ops.window import hann2d

# ImageNet statistics duplicated across both modality triplets
# (PreprocessorMM, ViPT/lib/test/tracker/data_utils.py:15-24).
MEAN_6CH = np.array([0.485, 0.456, 0.406] * 2, np.float32)
STD_6CH = np.array([0.229, 0.224, 0.225] * 2, np.float32)


@dataclass(frozen=True)
class ViPTRuntime:
    """Static runtime hyperparameters (TrackerParams analog,
    ViPT/lib/test/parameter/vipt.py:7-29)."""
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 4.0
    search_size: int = 256
    stride: int = 16
    margin: float = 10.0
    ce_template_range: str = "CTR_POINT"
    ce_loc: tuple[int, ...] = (3, 6, 9)
    ce_keep_ratio: tuple[float, ...] = (0.7, 0.7, 0.7)

    @property
    def feat_sz(self) -> int:
        return self.search_size // self.stride

    @property
    def ce_keep_lens(self) -> tuple[int, ...]:
        n = (self.search_size // self.stride) ** 2
        return ce_keep_schedule(n, self.ce_loc, self.ce_keep_ratio)

    @classmethod
    def from_config(cls, cfg) -> "ViPTRuntime":
        return cls(
            template_factor=cfg.TEST.TEMPLATE_FACTOR,
            template_size=cfg.TEST.TEMPLATE_SIZE,
            search_factor=cfg.TEST.SEARCH_FACTOR,
            search_size=cfg.TEST.SEARCH_SIZE,
            stride=cfg.MODEL.BACKBONE.STRIDE,
            ce_template_range=cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE,
            ce_loc=tuple(cfg.MODEL.BACKBONE.CE_LOC),
            ce_keep_ratio=tuple(cfg.MODEL.BACKBONE.CE_KEEP_RATIO),
        )


def vipt_init_state(rt: ViPTRuntime, frame: jnp.ndarray, init_box: jnp.ndarray) -> dict:
    """Build the tracker state from the first frame.

    Equivalent of ViPTTrack.initialize (vipt.py:41-62): one-shot template
    crop, stored normalized. state = {'box' (4,) xywh image coords,
    'template' (T, T, 6) normalized}.
    """
    c = frame.shape[-1]
    mean, std = jnp.asarray(MEAN_6CH[:c]), jnp.asarray(STD_6CH[:c])
    template, _ = crop_resize_normalized(
        frame, init_box, rt.template_factor, rt.template_size, mean, std)
    return {"box": init_box.astype(jnp.float32), "template": template}


def vipt_step_from_crop(rt: ViPTRuntime, model: ViPTrack, params,
                        template: jnp.ndarray, prev_box: jnp.ndarray,
                        search: jnp.ndarray, resize_factor: jnp.ndarray,
                        img_h, img_w):
    """Forward + decode + map-back + clip from an already-normalized search
    crop (the tail of ViPTTrack.track, vipt.py:71-110). Shared by the fused
    device path and the bit-exact host-preprocessing path."""
    box_mask_z = generate_ctr_mask(rt.template_size // rt.stride,
                                   rt.ce_template_range)
    out = model.apply(params, template[None], search[None],
                      box_mask_z, rt.ce_keep_lens)

    if getattr(model, "head_type", "CENTER") == "CENTER":
        window = hann2d(rt.feat_sz, rt.feat_sz)
        response = window[None] * out["score_map"]
        bbox, score = cal_bbox(response, out["size_map"], out["offset_map"])
    else:
        # CORNER/MLP heads regress the box directly (no center heatmap to
        # window — the reference's corner lineage uses pred_boxes as-is,
        # ostrack.py forward_head CORNER branch)
        bbox, score = out["pred_boxes"], out["max_score"]

    # crop coords [0,1] -> image scale
    pred = bbox[0] * rt.search_size / resize_factor  # (cx, cy, w, h)
    cx_prev = prev_box[0] + 0.5 * prev_box[2]
    cy_prev = prev_box[1] + 0.5 * prev_box[3]
    half_side = 0.5 * rt.search_size / resize_factor
    cx = pred[0] + (cx_prev - half_side)
    cy = pred[1] + (cy_prev - half_side)
    new_box = jnp.stack([cx - 0.5 * pred[2], cy - 0.5 * pred[3],
                         pred[2], pred[3]])
    new_box = clip_box(new_box, img_h, img_w, margin=rt.margin)
    return new_box, score[0]


def vipt_track_step(rt: ViPTRuntime, model: ViPTrack, params, state: dict,
                    frame: jnp.ndarray):
    """One tracked frame. Returns (new_state, box_xywh (4,), score ()).

    Equivalent of ViPTTrack.track (vipt.py:64-110): search crop around the
    previous box, forward, Hanning-window the center heatmap, decode, map the
    crop-relative box back to image coordinates, clip with 10px margin.
    """
    H, W = frame.shape[0], frame.shape[1]
    c = frame.shape[-1]
    mean, std = jnp.asarray(MEAN_6CH[:c]), jnp.asarray(STD_6CH[:c])
    search, resize_factor = crop_resize_normalized(
        frame, state["box"], rt.search_factor, rt.search_size, mean, std)
    new_box, score = vipt_step_from_crop(
        rt, model, params, state["template"], state["box"], search,
        resize_factor, float(H), float(W))
    new_state = {"box": new_box, "template": state["template"]}
    return new_state, new_box, score


def vipt_track_scan(rt: ViPTRuntime, model: ViPTrack, params, state: dict,
                    frames: jnp.ndarray):
    """Track a chunk of frames entirely on device via lax.scan.

    frames: (T, H, W, 6) (or (T, B, H, W, 6) when `state` carries a batch
    axis — pass a vmapped step through `batched=True`). The per-frame loop
    never leaves HBM (north-star requirement): one host->device transfer per
    chunk, boxes come back as (T, 4).
    """
    def body(carry, frame):
        new_state, box, score = vipt_track_step(rt, model, params, carry, frame)
        return new_state, (box, score)

    final_state, (boxes, scores) = jax.lax.scan(body, state, frames)
    return final_state, boxes, scores


def vipt_track_scan_batched(rt: ViPTRuntime, model: ViPTrack, params,
                            state: dict, frames: jnp.ndarray):
    """Batched chunk tracking: frames (T, B, H, W, 6), state leaves lead with B.

    scan over time of a vmapped step: B sequences advance in lockstep with
    zero host round-trips inside the chunk.
    """
    step = jax.vmap(partial(vipt_track_step, rt, model, params))

    def body(carry, frame_b):
        new_state, box, score = step(carry, frame_b)
        return new_state, (box, score)

    final_state, (boxes, scores) = jax.lax.scan(body, state, frames)
    return final_state, boxes, scores


class ViPTTracker:
    """OO facade with the reference BaseTracker API (initialize/track).

    Holds the jitted functional core; jit re-specializes automatically per
    frame resolution (a handful per dataset).

    host_preproc=True swaps the fused device crop for the bit-exact host
    cv2 twin (ops/crop.py::sample_target_np — byte-identical to the
    reference's sample_target incl. cv2's fixed-point uint8 resize) and
    uploads the normalized crop instead of the frame. Use for
    parity-critical evaluation; the device path is ~1 intensity level off
    cv2's fixed-point rounding, which matters only to bit-level A/B runs.
    """

    def __init__(self, model: ViPTrack, params,
                 runtime: Optional[ViPTRuntime] = None,
                 host_preproc: bool = False):
        self.model = model
        self.params = params
        self.rt = runtime or ViPTRuntime()
        self.host_preproc = host_preproc
        self._init_fn = jax.jit(partial(vipt_init_state, self.rt))
        self._step_fn = jax.jit(partial(vipt_track_step, self.rt, self.model))
        self._crop_step_fn = jax.jit(
            partial(vipt_step_from_crop, self.rt, self.model))
        self.state = None

    def _host_crop(self, image: np.ndarray, box, factor: float, size: int):
        from mmtrack_tpu.ops.crop import sample_target_np

        crop, rf, _ = sample_target_np(np.asarray(image),
                                       np.asarray(box, np.float64),
                                       factor, size)
        c = crop.shape[-1]
        normalized = ((crop.astype(np.float32) / 255.0 - MEAN_6CH[:c])
                      / STD_6CH[:c])
        return jnp.asarray(normalized), rf

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        if self.host_preproc:
            template, _ = self._host_crop(image, info["init_bbox"],
                                          self.rt.template_factor,
                                          self.rt.template_size)
            self.state = {"box": box, "template": template}
        else:
            self.state = self._init_fn(jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        if self.host_preproc:
            H, W = image.shape[0], image.shape[1]
            prev = np.asarray(self.state["box"], np.float64)
            search, rf = self._host_crop(image, prev, self.rt.search_factor,
                                         self.rt.search_size)
            box, score = self._crop_step_fn(
                self.params, self.state["template"], self.state["box"],
                search, jnp.float32(rf), float(H), float(W))
            self.state = {"box": box, "template": self.state["template"]}
        else:
            self.state, box, score = self._step_fn(self.params, self.state,
                                                   jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
