"""MOSSE — the classic closed-form Fourier correlation filter.

Rebuild of RGBD/models/keep_track_vot2021/pytracking/tracker/mosse/
mosse.py:10-139 on the shared Fourier ops (ops/fourier.py): per frame,
ONE jitted step does crop -> grayscale feature -> hann window -> centered
spectrum -> bicubic Fourier interpolation -> score H·X -> wraparound
localization -> exponential num/den filter update

    H = num / (den + reg),   num <- (1-lr) num + lr  y · conj(X)
                             den <- (1-lr) den + lr  sum_c |X|^2

(update_filter/apply_filter, mosse.py:115-133). Like ECO/CCOT, spectra
live as full centered complex series; the division happens per frequency.

The fork ships NO parameter file for MOSSE (pytracking/parameter/ has
only keep_track + alpha_refine) and no feature spec; constants below are
the MOSSE paper's (grayscale single-scale filter, lr 0.125) on the
ECO-style geometry the tracker code assumes (odd square search area,
min/max sample-size clamp).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.ops.fourier import (bicubic_interp_spectrum, cfft2,
                                     gauss_label_spectrum, max2d_wrapped,
                                     sample_scores)
from mmtrack_tpu.ops.window import hann2d
from mmtrack_tpu.trackers.eco_tracker import _crop


@dataclass(frozen=True)
class MOSSERuntime:
    search_area_scale: float = 4.5
    min_image_sample_size: int = 200 ** 2
    max_image_sample_size: int = 250 ** 2
    stride: int = 1                      # raw grayscale pixels
    learning_rate: float = 0.125         # MOSSE paper sec. 3.3
    reg_factor: float = 0.01
    output_sigma_factor: float = 1.0 / 16.0
    interp_bicubic_a: float = -0.75
    # score grid downsampling: the reference samples scores at
    # output_sz == img_support_sz; at stride 1 that is the identity
    score_upsample: int = 1
    # replicate the reference's float32 cubic_spline_fourier evaluation
    # (catastrophic cancellation at small f — see
    # ops/fourier.bicubic_interp_spectrum); OFF by default: the float64
    # kernel is the mathematically correct one and localization is
    # unaffected (the kernel scales filter and sample consistently)
    interp_f32_parity: bool = False


@dataclass(frozen=True)
class MOSSEGeom:
    sample_sz: int


def mosse_geometry(rt: MOSSERuntime, target_hw) -> tuple[MOSSEGeom, dict]:
    """Host-side per-sequence geometry (mosse.py:20-50)."""
    ts = np.asarray(target_hw, np.float64)
    search_area = float(np.prod(ts * rt.search_area_scale))
    if search_area > rt.max_image_sample_size:
        scale = np.sqrt(search_area / rt.max_image_sample_size)
    elif search_area < rt.min_image_sample_size:
        scale = np.sqrt(search_area / rt.min_image_sample_size)
    else:
        scale = 1.0
    base = ts / scale
    S = int(round(np.sqrt(np.prod(base * rt.search_area_scale))))
    # the reference's odd-ification (mosse.py:33): S += stride - S %
    # (2*stride) makes the FEATURE grid S/stride odd — at stride 1 the
    # sample side itself is odd, so the centered full spectrum is built
    # at F directly
    S += rt.stride - S % (2 * rt.stride)
    F = S // rt.stride
    Ff = F + (F + 1) % 2  # no-op for the odd F the reference produces
    sigma = np.sqrt(np.prod(base)) * rt.output_sigma_factor * (Ff / S)
    k = bicubic_interp_spectrum(Ff, rt.interp_bicubic_a,
                                f32_parity=rt.interp_f32_parity)
    consts = {
        "target_scale": np.float32(scale),
        "base_target_sz": jnp.asarray(base, jnp.float32),
        "window": hann2d(F),
        "interp": np.stack([k.real, k.imag], -1).astype(np.float32),
        "yf": gauss_label_spectrum(Ff, sigma, sigma),
    }
    return MOSSEGeom(S), consts


def _gray_spectrum(rt: MOSSERuntime, consts, frame, pos, side, S: int):
    """Crop -> grayscale -> window -> centered spectrum -> interpolation
    (extract_fourier_sample, mosse.py:135-139)."""
    patch = _crop(frame, pos, side, S)[..., :3]
    return _gray_window_spectrum(consts, patch)


def _gray_window_spectrum(consts, patch):
    """Grayscale feature -> window -> centered spectrum -> bicubic
    Fourier interpolation, from an already-cropped (S, S, 3) patch in
    [0, 255]. The grayscale is the reference's Grayscale feature — the
    CHANNEL MEAN of im/255 - 0.5 (pytracking/features/color.py:17-25),
    not a luma weighting."""
    gray = jnp.mean(patch / 255.0 - 0.5, axis=-1)
    x = gray * consts["window"]
    k = jax.lax.complex(consts["interp"][..., 0], consts["interp"][..., 1])
    return cfft2(x[None, None]) * k[None, None]  # (1, 1, F, F) complex


def mosse_init_state(rt: MOSSERuntime, geom: MOSSEGeom, consts: dict,
                     frame, init_box_xywh):
    x, y, w, h = init_box_xywh
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_scale = jnp.asarray(consts["target_scale"])
    xf = _gray_spectrum(rt, consts, frame, pos,
                        target_scale * geom.sample_sz, geom.sample_sz)
    num = consts["yf"][None, None] * jnp.conj(xf)
    den = jnp.sum(jnp.abs(xf) ** 2, axis=1)
    return {"pos": pos, "target_scale": target_scale,
            "num": num, "den": den,
            "frame_num": jnp.asarray(1, jnp.int32)}


def _mosse_localize(rt: MOSSERuntime, geom: MOSSEGeom, state: dict, xf):
    """Score + wraparound localization (mosse.py:73-94)."""
    S = geom.sample_sz
    sample_pos = jnp.round(state["pos"])
    H = state["num"] / (state["den"][:, None] + rt.reg_factor)
    sf = jnp.sum(H * xf, axis=1, keepdims=True)
    # evaluate on an odd grid >= the series size; the translation below
    # rescales grid cells back to image pixels by S / grid
    G = S * rt.score_upsample
    G += (G + 1) % 2
    s = sample_scores(sf[0, 0], G)
    max_score, disp = max2d_wrapped(s)
    translation = disp * (S / s.shape[-1]) * state["target_scale"]
    return max_score, sample_pos + translation


def _mosse_finish(rt: MOSSERuntime, consts: dict, state: dict, new_pos,
                  xf_u, max_score):
    """Filter EMA update with the fresh sample + output box
    (mosse.py:99-113 + update_filter:115-126)."""
    lr = rt.learning_rate
    num = (1 - lr) * state["num"] + lr * (consts["yf"][None, None]
                                          * jnp.conj(xf_u))
    den = (1 - lr) * state["den"] + lr * jnp.sum(jnp.abs(xf_u) ** 2, axis=1)
    state = {**state, "pos": new_pos, "num": num, "den": den,
             "frame_num": state["frame_num"] + 1}
    target_sz = consts["base_target_sz"] * state["target_scale"]
    box = jnp.concatenate([(new_pos - (target_sz - 1) / 2)[::-1],
                           target_sz[::-1]])
    return state, box, max_score


def mosse_track_step(rt: MOSSERuntime, geom: MOSSEGeom, consts: dict,
                     state: dict, frame):
    """One tracked frame (mosse.py:66-113); single scale."""
    S = geom.sample_sz
    xf = _gray_spectrum(rt, consts, frame, state["pos"],
                        state["target_scale"] * S, S)
    max_score, new_pos = _mosse_localize(rt, geom, state, xf)
    # update with a fresh sample at the new position (mosse.py:102-107)
    xf_u = _gray_spectrum(rt, consts, frame, new_pos,
                          state["target_scale"] * S, S)
    return _mosse_finish(rt, consts, state, new_pos, xf_u, max_score)


def mosse_step_from_patches(rt: MOSSERuntime, geom: MOSSEGeom, consts: dict,
                            state: dict, patch_loc, patch_upd):
    """One frame from already-cropped raw patches ((S, S, 3) in [0, 255]):
    the trajectory parity harness feeds the REFERENCE'S own two
    sample_patch crops (localize at pos, update at the new pos)."""
    xf = _gray_window_spectrum(consts, patch_loc)
    max_score, new_pos = _mosse_localize(rt, geom, state, xf)
    xf_u = _gray_window_spectrum(consts, patch_upd)
    return _mosse_finish(rt, consts, state, new_pos, xf_u, max_score)


class MOSSETracker:
    """OO facade with the reference BaseTracker API."""

    def __init__(self, runtime: MOSSERuntime | None = None):
        self.rt = runtime or MOSSERuntime()
        self.state = None
        self._geom = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = np.asarray(info["init_bbox"], np.float32)
        self._geom, consts = mosse_geometry(self.rt, (box[3], box[2]))
        self._consts = consts
        self._init_fn = jax.jit(partial(mosse_init_state, self.rt,
                                        self._geom, consts))
        self._step_fn = jax.jit(partial(mosse_track_step, self.rt,
                                        self._geom, consts))
        self.state = self._init_fn(jnp.asarray(image), jnp.asarray(box))

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
