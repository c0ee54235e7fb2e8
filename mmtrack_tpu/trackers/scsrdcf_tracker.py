"""SCSRDCF — spatially-regularized DCF solved by frequency-domain SOR.

Rebuild of RGBD/models/keep_track_vot2021/pytracking/tracker/scsrdcf/
scsrdcf.py:11-274: an SRDCF-style correlation filter whose spatial
regularization window enters as a small sparsified kernel W convolved
over the FILTER SPECTRUM, optimized per frame by successive
over-relaxation (Gauss-Seidel) on the normal equations

    (D + reg^2 + W^T W) f = rhs,   D = EMA |X|^2,  rhs = EMA y conj(X)

with the update (optimize_filter, scsrdcf.py:178-208):

    g <- W f
    f <- tau * Dinv(rhs) + (1 - tau) f - tau * Dinv(W^T g + 2 reg g).

Spectra are FULL centered complex series (ops/fourier.py), so the
reference's conjugate-symmetric padding dance before its half-spectrum
convolution collapses to one plain 2D convolution with the real reg
kernel (applied to real/imag separately). The whole per-frame update is
ONE jitted step on the MOSSE-style grayscale geometry.

The fork ships NO parameter file for SCSRDCF; solver constants below are
SRDCF-paper-style choices on the shared DCF geometry, documented here
because no reference values exist to pin.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.ops.fourier import (max2d_wrapped, reg_filter,
                                     sample_scores)
from mmtrack_tpu.trackers.mosse_tracker import (MOSSEGeom, MOSSERuntime,
                                                _gray_spectrum,
                                                mosse_geometry)


@dataclass(frozen=True)
class SCSRDCFRuntime(MOSSERuntime):
    learning_rate: float = 0.025
    # reg_factor 1.0 / tau 1.0: the SOR sweep diverges at small reg on
    # grayscale spectra (the high-frequency |X|^2 floor is tiny); these
    # choices converge in 5 sweeps and track (<2 px drift on the rigid
    # smoke test) - the fork ships no values to pin
    reg_factor: float = 1.0
    num_gs_iter: int = 5
    sor_weight: float = 1.0
    # sparsified spatial regularization window (get_reg_filter; the ECO
    # defaults for the shallow block)
    reg_window_min: float = 1e-4
    reg_window_edge: float = 1e-2
    reg_window_power: float = 2.0
    reg_sparsity_threshold: float = 0.05


def scsrdcf_geometry(rt: SCSRDCFRuntime, target_hw):
    geom, consts = mosse_geometry(rt, target_hw)
    base = np.asarray(consts["base_target_sz"])
    S = geom.sample_sz
    rk = reg_filter((S, S), base, rt.reg_window_min, rt.reg_window_edge,
                    rt.reg_window_power, rt.reg_sparsity_threshold,
                    pad_to=15)
    # the reference moves the kernel's DC tap into the scalar regularizer
    # and zeroes it in the kernel (scsrdcf.py:59-61)
    cy, cx = rk.shape[0] // 2, rk.shape[1] // 2
    reg_factor_eff = np.float32(rt.reg_factor + rk[cy, cx])
    rk = rk.copy()
    rk[cy, cx] = 0.0
    consts["reg_k"] = jnp.asarray(rk)
    consts["reg_factor"] = jnp.asarray(reg_factor_eff)
    return geom, consts


def _w_op(h: jnp.ndarray, reg_k: jnp.ndarray) -> jnp.ndarray:
    """Spectral convolution with the real reg kernel (the reference's W,
    scsrdcf.py:222-239), real/imag separately; (C, F, F) complex."""
    hr = jnp.stack([h.real, h.imag], axis=1)          # (C, 2, F, F)
    C, _, F, _ = hr.shape
    x = hr.reshape(C * 2, 1, F, F)
    k = reg_k.reshape(1, 1, *reg_k.shape)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y.reshape(C, 2, F, F)
    return jax.lax.complex(y[:, 0], y[:, 1])


def scsrdcf_init_state(rt: SCSRDCFRuntime, geom: MOSSEGeom, consts: dict,
                       frame, init_box_xywh):
    x, y, w, h = init_box_xywh
    pos = jnp.stack([y + (h - 1) / 2, x + (w - 1) / 2])
    target_scale = jnp.asarray(consts["target_scale"])
    xf = _gray_spectrum(rt, consts, frame, pos,
                        target_scale * geom.sample_sz, geom.sample_sz)[0]
    rhs = consts["yf"][None] * jnp.conj(xf)          # (C=1, F, F)
    lhs_data = jnp.abs(xf) ** 2
    f = _run_opt(rt, consts, jnp.zeros_like(rhs), rhs, lhs_data, first=True)
    return {"pos": pos, "target_scale": target_scale,
            "rhs": rhs, "lhs_data": lhs_data, "f": f,
            "frame_num": jnp.asarray(1, jnp.int32)}


def _run_opt(rt, consts, f, rhs, lhs_data, first: bool = False):
    """SOR sweep (optimize_filter, scsrdcf.py:178-208); statically
    unrolled (num_gs_iter is small, keeps the W convs fused). The scalar
    regularizer is the runtime constant PLUS the reg kernel's extracted
    DC tap (scsrdcf.py:59-61, applied in scsrdcf_geometry). On the INIT
    frame the sweep starts from f_bias itself (scsrdcf.py:177-179
    `self.f = self.f_bias.clone()`), not from zeros."""
    tau = rt.sor_weight
    reg = consts["reg_factor"]
    lhs = lhs_data + reg ** 2

    def dinv(h):
        return h / lhs

    f_bias = tau * dinv(rhs)
    if first:
        f = f_bias
    for _ in range(rt.num_gs_iter):
        g = _w_op(f, consts["reg_k"])
        f = f_bias + (1 - tau) * f - tau * dinv(_w_op(g, consts["reg_k"])
                                                + 2 * reg * g)
    return f


def _scsrdcf_localize(geom: MOSSEGeom, state: dict, xf):
    """Score + wraparound localization (scsrdcf.py:98-125)."""
    S = geom.sample_sz
    sample_pos = jnp.round(state["pos"])
    sf = jnp.sum(state["f"] * xf, axis=0)
    G = S + (S + 1) % 2
    s = sample_scores(sf, G)
    max_score, disp = max2d_wrapped(s)
    return max_score, sample_pos + disp * (S / G) * state["target_scale"]


def _scsrdcf_finish(rt: SCSRDCFRuntime, consts: dict, state: dict, new_pos,
                    xf_u, max_score):
    """Memory EMA + SOR re-optimization + output box
    (scsrdcf.py:130-141 + update_memory:143-161)."""
    lr = rt.learning_rate
    rhs = (1 - lr) * state["rhs"] + lr * (consts["yf"][None]
                                          * jnp.conj(xf_u))
    lhs_data = (1 - lr) * state["lhs_data"] + lr * jnp.abs(xf_u) ** 2
    f = _run_opt(rt, consts, state["f"], rhs, lhs_data)

    state = {**state, "pos": new_pos, "rhs": rhs, "lhs_data": lhs_data,
             "f": f, "frame_num": state["frame_num"] + 1}
    target_sz = consts["base_target_sz"] * state["target_scale"]
    box = jnp.concatenate([(new_pos - (target_sz - 1) / 2)[::-1],
                           target_sz[::-1]])
    return state, box, max_score


def scsrdcf_track_step(rt: SCSRDCFRuntime, geom: MOSSEGeom, consts: dict,
                       state: dict, frame):
    """One tracked frame (scsrdcf.py:91-141); single scale."""
    S = geom.sample_sz
    xf = _gray_spectrum(rt, consts, frame, state["pos"],
                        state["target_scale"] * S, S)[0]
    max_score, new_pos = _scsrdcf_localize(geom, state, xf)
    xf_u = _gray_spectrum(rt, consts, frame, new_pos,
                          state["target_scale"] * S, S)[0]
    return _scsrdcf_finish(rt, consts, state, new_pos, xf_u, max_score)


def scsrdcf_step_from_patches(rt: SCSRDCFRuntime, geom: MOSSEGeom,
                              consts: dict, state: dict, patch_loc,
                              patch_upd):
    """One frame from already-cropped raw patches — the trajectory parity
    harness feeds the REFERENCE'S own two sample_patch crops."""
    from mmtrack_tpu.trackers.mosse_tracker import _gray_window_spectrum

    xf = _gray_window_spectrum(consts, patch_loc)[0]
    max_score, new_pos = _scsrdcf_localize(geom, state, xf)
    xf_u = _gray_window_spectrum(consts, patch_upd)[0]
    return _scsrdcf_finish(rt, consts, state, new_pos, xf_u, max_score)


class SCSRDCFTracker:
    """OO facade with the reference BaseTracker API."""

    def __init__(self, runtime: SCSRDCFRuntime | None = None):
        self.rt = runtime or SCSRDCFRuntime()
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = np.asarray(info["init_bbox"], np.float32)
        geom, consts = scsrdcf_geometry(self.rt, (box[3], box[2]))
        self._geom = geom
        self._init_fn = jax.jit(partial(scsrdcf_init_state, self.rt,
                                        geom, consts))
        self._step_fn = jax.jit(partial(scsrdcf_track_step, self.rt,
                                        geom, consts))
        self.state = self._init_fn(jnp.asarray(image), jnp.asarray(box))

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
