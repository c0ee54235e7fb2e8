"""C-COT — continuous convolution operator tracker (ECO's predecessor).

Rebuild of RGBD/models/keep_track_vot2021/pytracking/tracker/ccot/
{ccot.py,optim.py}: the same Fourier-domain continuous-filter machinery
as ECO (trackers/eco_tracker.py) but WITHOUT the factorized projection —
per-channel filters over the full feature dimension — a plain min-weight
sample memory, and a preconditioned-CG filter update EVERY frame
(ccot.py:146-150). Init is a single unaugmented sample (ccot.py:75-100:
extract, sub-pixel Fourier shift to the integer grid, seed memory, CG).

The fork ships NO parameter file for CCOT; constants inherit ECO's
parameter/eco/default.py geometry and solver settings, EXCEPT where
ccot.py reads a single top-level value in place of ECO's per-block
fparams: one learning rate (the C-COT paper's 0.0075; ccot.py
params.learning_rate), one label sigma factor (1/16,
params.output_sigma_factor), one regularization window (the shallow-block
settings, dcf.get_reg_filter(..., self.params)), one SHARED sample-weight
vector (equal per-block rates make our per-block vectors identical to
it), an UNWEIGHTED block sum in apply_filter (ccot.py:159-161 — no
translation_weight), and C-COT's own second-sample weight split
(_update_weights_ccot). Two deliberate deviations, both trajectory-A/B'd
as inactive (tools/parity/check_trajectory_ccot.py): a 30-slot memory —
the reference's 200-slot ECO default would hold 200 full-channel spectra
(O(GB)) — and ECO's position/scale clamps kept in eco_step_from_patches
(ccot.py never clamps; the clamps only bind at image borders / extreme
scales where an unclamped C-COT has already failed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.backbones import ResNetVGGm1
from mmtrack_tpu.ops.fourier import conj_symmetrize, shift_spectrum
from mmtrack_tpu.ops.optimization import (
    cg_state_init,
    conjugate_gradient_stateful,
)
from mmtrack_tpu.trackers.eco_tracker import (ECOGeom, ECORuntime, _cplx,
                                              _crop, _extract_features,
                                              _filter_precond,
                                              _filter_residuals_block, _ri,
                                              _to_spectrum, eco_geometry,
                                              eco_track_step)


def ccot_runtime(**overrides) -> ECORuntime:
    base = dict(use_projection=False, train_every_frame=True,
                sample_memory_size=30,
                # full feature dims == "compressed" dims (no projection)
                compressed_dims=(96, 256),
                # ccot.py's single top-level reads (see module docstring)
                learning_rates=(0.0075, 0.0075),
                output_sigma_factors=(1 / 16, 1 / 16),
                translation_weights=(1.0, 1.0),
                reg_window_min=(1e-4, 1e-4),
                reg_window_edge=(10e-3, 10e-3),
                reg_sparsity_threshold=(0.05, 0.05),
                ccot_weight_update=True)
    base.update(overrides)
    return ECORuntime(**base)


def ccot_init_state(rt: ECORuntime, model, st: ECOGeom, params,
                    consts: dict, frame, init_box_xywh) -> dict:
    """First frame (ccot.py:14-100): ONE sample, shifted onto the integer
    grid, seeds the memory; filter from zero by preconditioned CG."""
    S = st.sample_sz
    x0, y0, w, h = init_box_xywh
    pos = jnp.stack([y0 + (h - 1) / 2, x0 + (w - 1) / 2])
    target_scale = jnp.asarray(consts["target_scale"])
    base_target_sz = consts["base_target_sz"]

    patch = _crop(frame, pos, target_scale * S, S)
    feats = _extract_features(model, params, patch[None], rt.blocks)
    X = tuple(_to_spectrum(feats[b], consts["windows"][b],
                           consts["interp"][b]) for b in range(rt.n_blocks))
    # shift the sample so the target sits on the integer grid (ccot.py:79-81)
    shift = 2 * jnp.pi * (pos - jnp.round(pos)) / (target_scale * S)
    X = tuple(shift_spectrum(x[0], shift[None]) for x in X)

    M = rt.sample_memory_size
    memory, sws, se = [], [], []
    for b in range(rt.n_blocks):
        mem = jnp.zeros((M,) + X[b].shape, jnp.complex64).at[0].set(X[b])
        memory.append(mem)
        sws.append(jnp.zeros((M,)).at[0].set(1.0))
        se.append(jnp.abs(X[b]) ** 2)

    hs = tuple(_ri(jnp.zeros_like(X[b])) for b in range(rt.n_blocks))
    diags = _filter_precond(rt, tuple(se), consts["reg_energy"])

    # the reference's init filter solve is the SAME FilterOptim instance
    # used online (run(init_CG_iter)), so its final conjugate direction
    # seeds the online carry — run the stateful CG per block (the
    # reference's per-TensorList-entry scalars make the two blocks
    # independent CG problems) and keep each block's state
    filters, cg_state = [], []
    for b in range(rt.n_blocks):
        res_fn = partial(_filter_residuals_block, rt, mem=memory[b],
                         yf=consts["yf"][b], sw=sws[b],
                         reg_k=consts["reg"][b])
        r0, jvp_fn = jax.linearize(res_fn, hs[b])
        _, vjp_fn = jax.vjp(res_fn, hs[b])
        b_rhs = jax.tree.map(lambda g: -g, vjp_fn(r0)[0])
        diag = diags[b]
        dx, cg_b = conjugate_gradient_stateful(
            lambda u: vjp_fn(jvp_fn(u))[0], b_rhs,
            jnp.zeros_like(hs[b]), rt.init_cg_iter,
            cg_state_init(hs[b]), precond=lambda x: x / diag,
            fletcher_reeves=rt.fletcher_reeves,
            direction_forget_factor=rt.direction_forget_factor)
        filters.append(_ri(conj_symmetrize(_cplx(hs[b] + dx))))
        cg_state.append(cg_b)
    filters = tuple(filters)
    cg_state = tuple(cg_state)

    return {
        "pos": pos, "target_scale": target_scale,
        "target_sz": base_target_sz * target_scale,
        "base_target_sz": base_target_sz,
        "filters": filters,
        "memory": tuple(memory),
        "sample_weights": tuple(sws),
        "prev_replace_ind": tuple(jnp.asarray(0, jnp.int32)
                                  for _ in range(rt.n_blocks)),
        "num_stored": jnp.asarray(1, jnp.int32),
        "sample_energy": tuple(se),
        "frame_num": jnp.asarray(1, jnp.int32),
        "cg_state": cg_state,
    }


class CCOTTracker:
    """OO facade; the per-frame step IS eco_track_step with the CCOT
    runtime flags (no projection, train every frame)."""

    def __init__(self, model: ResNetVGGm1, params,
                 runtime: ECORuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or ccot_runtime()
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = np.asarray(info["init_bbox"], np.float32)
        geom, consts = eco_geometry(self.rt, (box[3], box[2]))
        self._geom = geom
        self._init_fn = jax.jit(partial(ccot_init_state, self.rt,
                                        self.model, geom, self.params,
                                        consts))
        self._step_fn = jax.jit(partial(eco_track_step, self.rt, self.model,
                                        geom, self.params, consts))
        self.state = self._init_fn(jnp.asarray(image), jnp.asarray(box))

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.state, jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
