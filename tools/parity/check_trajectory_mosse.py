"""Trajectory-level A/B: the fork's own MOSSE / SCSRDCF loops vs ours.

Runs the reference's ACTUAL tracker classes —
keep_track_vot2021/pytracking/tracker/mosse/mosse.py::MOSSE and
tracker/scsrdcf/scsrdcf.py::SCSRDCF — side by side with mmtrack_tpu's
mosse_step_from_patches / scsrdcf_step_from_patches on the same synthetic
sequence, covering per transition:

  - the Grayscale feature (channel mean of im/255 - 0.5, color.py:17-25),
    hann window, centered-spectrum cfft2 + bicubic Fourier interpolation,
  - score synthesis (filter · X summed over channels; MOSSE additionally
    divides by den + reg) sampled on the odd support grid with wraparound
    localization (mosse.py:73-94 / scsrdcf.py:98-125),
  - the closed-form num/den EMA (MOSSE update_filter:115-126) and
    SCSRDCF's rhs/lhs EMA + frequency-domain SOR sweeps with the
    spectral reg-kernel convolution W and the extracted DC tap
    (scsrdcf.py:143-239),
  - the two-crop per-frame structure (localize at pos, update at the new
    pos) — both sides consume the REFERENCE'S own sample_patch crops.

The fork ships NO parameter file for either tracker (pytracking/
parameter/ has only keep_track + alpha_refine); the TrackerParams here
are MOSSERuntime/SCSRDCFRuntime's documented constants. Both loops are
teacher-forced from ground truth; filters are resynchronized from the
reference's post-frame state so every frame tests the complete step from
an identical starting point. The reference's half spectra (rows centered,
columns 0..K) are compared against the matching right half of our full
centered spectra; resync reconstructs the full layout by conjugate
symmetry (all resynced quantities are spectra of real signals).

Run: python tools/parity/check_trajectory_mosse.py [--tracker mosse|scsrdcf]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (  # noqa: E402
    patch_cuda_to_cpu,
    patch_legacy_fft,
    reference_available,
    reference_path,
)

TOL_FILTER = 1e-5     # post-frame filter quantities, RELATIVE to the
                      # reference's max magnitude (unnormalized-FFT scale)
TOL_PX = 1e-3         # output box agreement per transition
EPS_TIE = 1e-6        # argmax near-tie excusal margin


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    return np.ascontiguousarray(frames[..., :3]), gt


def half_to_full(c: np.ndarray) -> np.ndarray:
    """(..., R, Ck) complex half spectrum (rows centered, cols kx=0..K) ->
    (..., R, 2*Ck-1) full centered spectrum by conjugate symmetry."""
    R, Ck = c.shape[-2], c.shape[-1]
    full = np.zeros(c.shape[:-1] + (2 * Ck - 1,), np.complex64)
    full[..., Ck - 1:] = c
    full[..., :Ck - 1] = np.conj(c[..., ::-1, 1:][..., ::-1])
    return full


def run_reference(tracker_name: str, frames, gt, rt, freerun: bool = False):
    """freerun=True runs the reference loop UNINTERRUPTED from frame 0 (no
    per-frame pos forcing) — the deployment loop itself."""
    import torch

    patch_cuda_to_cpu()
    patch_legacy_fft()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/keep_track_vot2021"):
        color_mod = importlib.import_module("pytracking.features.color")
        extractor_mod = importlib.import_module(
            "pytracking.features.extractor")
        params_mod = importlib.import_module("pytracking.utils.params")
        if tracker_name == "mosse":
            trk_mod = importlib.import_module("pytracking.tracker.mosse.mosse")
            TrackerCls = trk_mod.MOSSE
        else:
            trk_mod = importlib.import_module(
                "pytracking.tracker.scsrdcf.scsrdcf")
            TrackerCls = trk_mod.SCSRDCF
        fourier_mod = importlib.import_module("pytracking.libs.fourier")

        p = params_mod.TrackerParams()
        p.debug = 0
        p.use_gpu = False
        p.device = "cpu"
        p.search_area_scale = rt.search_area_scale
        p.min_image_sample_size = rt.min_image_sample_size
        p.max_image_sample_size = rt.max_image_sample_size
        p.learning_rate = rt.learning_rate
        p.reg_factor = rt.reg_factor
        p.output_sigma_factor = rt.output_sigma_factor
        p.interpolation_method = "bicubic"
        p.interpolation_bicubic_a = rt.interp_bicubic_a
        p.interpolation_centering = True
        p.interpolation_windowing = False
        p.scale_factors = torch.ones(1)

        # torch>=2 compat: the trackers compute `window * extract(...)[0]`
        # where [0] of MultiResolutionExtractor's (TensorList, coords)
        # return is the TensorList — Tensor.__mul__(TensorList) no longer
        # falls back to the list __rmul__. Unwrap the single feature map
        # so the tracker sees a plain Tensor; no math change.
        class SingleMapFeatures:
            def __init__(self, inner):
                self.inner = inner

            def stride(self):
                return int(self.inner.stride()[0].item())

            def initialize(self):
                self.inner.initialize()

            def extract(self, im, pos, scales, sz):
                fm, coords = self.inner.extract(im, pos, scales, sz)
                return fm[0], coords

        p.features = SingleMapFeatures(extractor_mod.MultiResolutionExtractor(
            [color_mod.Grayscale()]))
        if tracker_name == "scsrdcf":
            p.use_reg_window = True
            p.reg_window_min = rt.reg_window_min
            p.reg_window_edge = rt.reg_window_edge
            p.reg_window_power = rt.reg_window_power
            p.reg_sparsity_threshold = rt.reg_sparsity_threshold
            p.num_GS_iter = rt.num_gs_iter
            p.SOR_weight = rt.sor_weight

        tracker = TrackerCls(p)

        patches = []
        orig_sp = extractor_mod.sample_patch

        def hook_sp(im, pos, sz, out_sz, *a, **kw):
            out = orig_sp(im, pos, sz, out_sz, *a, **kw)
            patch = out[0] if isinstance(out, tuple) else out
            patches.append(patch.detach().numpy().copy())
            return out

        scores = []
        orig_fs = fourier_mod.sample_fs.op if hasattr(
            fourier_mod.sample_fs, "op") else fourier_mod.sample_fs

        def hook_fs(a, grid_sz=None, rescale=True):
            out = orig_fs(a, grid_sz, rescale)
            scores.append(np.asarray(out.detach()).copy())
            return out

        extractor_mod.sample_patch = hook_sp
        fourier_mod.sample_fs = hook_fs
        trk_mod.fourier.sample_fs = hook_fs

        def c2np(t):
            """torch legacy complex (..., 2) -> numpy complex."""
            a = t.detach().numpy()
            return (a[..., 0] + 1j * a[..., 1]).astype(np.complex64)

        try:
            tracker.initialize(frames[0],
                               {"init_bbox": [float(v) for v in gt[0]]})
            init = {
                "sample_sz": int(tracker.img_sample_sz[0].item()),
                "target_scale": float(tracker.target_scale),
                # label_function is a REAL separable product (dcf.py:53-54)
                "yf": np.asarray(tracker.yf).copy(),
                "n_patches": len(patches),
            }
            if tracker_name == "mosse":
                init["num"] = c2np(tracker.filter_num)
                init["den"] = np.asarray(tracker.filter_den).copy()
            else:
                init["rhs"] = c2np(tracker.rhs)
                init["lhs_data"] = np.asarray(tracker.lhs_data).copy()
                init["f"] = c2np(tracker.f)
                init["reg_filter"] = np.asarray(
                    tracker.reg_filter[0, 0]).copy()
                init["reg_factor"] = float(tracker.reg_factor)

            per_frame = []
            for t in range(1, len(frames)):
                if not freerun:
                    x, y, w, h = [np.float32(v) for v in gt[t - 1]]
                    tracker.pos = torch.Tensor([y + (h - 1) / 2,
                                                x + (w - 1) / 2])
                n_sc = len(scores)
                out = tracker.track(frames[t])
                rec = {"box": [float(v) for v in out["target_bbox"]],
                       "score_map": scores[n_sc][0, 0],
                       "pos": np.asarray(tracker.pos).copy()}
                if tracker_name == "mosse":
                    rec["num"] = c2np(tracker.filter_num)
                    rec["den"] = np.asarray(tracker.filter_den).copy()
                else:
                    rec["rhs"] = c2np(tracker.rhs)
                    rec["lhs_data"] = np.asarray(tracker.lhs_data).copy()
                    rec["f"] = c2np(tracker.f)
                per_frame.append(rec)
        finally:
            extractor_mod.sample_patch = orig_sp
            fourier_mod.sample_fs = orig_fs
            trk_mod.fourier.sample_fs = orig_fs

        return init, per_frame, patches


def run_ours(tracker_name: str, rt, init, per_frame, patches, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    if tracker_name == "mosse":
        from mmtrack_tpu.trackers.mosse_tracker import (
            _gray_window_spectrum, mosse_geometry, mosse_step_from_patches)
        geom, consts = mosse_geometry(rt, (gt[0][3], gt[0][2]))
        step = jax.jit(partial(mosse_step_from_patches, rt, geom, consts))
    else:
        from mmtrack_tpu.trackers.mosse_tracker import _gray_window_spectrum
        from mmtrack_tpu.trackers.scsrdcf_tracker import (
            _run_opt, scsrdcf_geometry, scsrdcf_step_from_patches)
        geom, consts = scsrdcf_geometry(rt, (gt[0][3], gt[0][2]))
        step = jax.jit(partial(scsrdcf_step_from_patches, rt, geom, consts))

    assert geom.sample_sz == init["sample_sz"], \
        (geom.sample_sz, init["sample_sz"])
    F = geom.sample_sz
    K = F // 2  # our full centered spectrum's kx=0 column index
    yf_ref = np.squeeze(init["yf"])
    yf_dev = float(np.abs(np.asarray(consts["yf"])[:, K:] - yf_ref).max())

    def to_hwc(p):
        return jnp.asarray(p[0].transpose(1, 2, 0))

    # init from the reference's own init crop
    x, y, w, h = [float(v) for v in gt[0]]
    pos = jnp.asarray([y + (h - 1) / 2, x + (w - 1) / 2])
    xf = _gray_window_spectrum(consts, to_hwc(patches[0]))
    diag = {"yf_dev": yf_dev}
    if tracker_name == "mosse":
        num = consts["yf"][None, None] * jnp.conj(xf)
        den = jnp.sum(jnp.abs(xf) ** 2, axis=1)
        state = {"pos": pos,
                 "target_scale": jnp.asarray(init["target_scale"]),
                 "num": num, "den": den,
                 "frame_num": jnp.asarray(1, jnp.int32)}
        rn = np.squeeze(init["num"])
        diag["init_num_dev"] = float(np.abs(
            np.squeeze(np.asarray(num))[:, K:] - rn).max()
            / max(np.abs(rn).max(), 1e-12))
    else:
        xf1 = xf[0]
        rhs = consts["yf"][None] * jnp.conj(xf1)
        lhs_data = jnp.abs(xf1) ** 2
        f = _run_opt(rt, consts, jnp.zeros_like(rhs), rhs, lhs_data,
                     first=True)
        state = {"pos": pos,
                 "target_scale": jnp.asarray(init["target_scale"]),
                 "rhs": rhs, "lhs_data": lhs_data, "f": f,
                 "frame_num": jnp.asarray(1, jnp.int32)}
        rf = np.squeeze(init["f"])
        diag["init_f_dev"] = float(np.abs(
            np.squeeze(np.asarray(f))[:, K:] - rf).max()
            / max(np.abs(rf).max(), 1e-12))
        diag["reg_factor_dev"] = abs(float(consts["reg_factor"])
                                     - init["reg_factor"])

    n_init = init["n_patches"]
    out = []
    for t in range(1, len(frames)):
        x, y, w, h = [np.float32(v) for v in gt[t - 1]]
        state = {**state,
                 "pos": jnp.asarray([np.float32(y + (h - 1) / 2),
                                     np.float32(x + (w - 1) / 2)])}
        p_loc = to_hwc(patches[n_init + 2 * (t - 1)])
        p_upd = to_hwc(patches[n_init + 2 * (t - 1) + 1])
        state, box, score = step(state, p_loc, p_upd)
        rec = {"box": np.asarray(box, np.float64)}
        ref = per_frame[t - 1]
        if tracker_name == "mosse":
            rec["num"] = np.squeeze(np.asarray(state["num"]))[:, K:]
            rec["den"] = np.squeeze(np.asarray(state["den"]))[:, K:]
            # resync filters from the reference's post-frame state
            state = {
                **state,
                "num": jnp.asarray(half_to_full(
                    np.squeeze(ref["num"]))[None, None]),
                "den": jnp.asarray(half_to_full(
                    np.squeeze(ref["den"]).astype(np.complex64)).real[None]),
            }
        else:
            rec["f"] = np.squeeze(np.asarray(state["f"]))[:, K:]
            state = {
                **state,
                "rhs": jnp.asarray(half_to_full(
                    np.squeeze(ref["rhs"]))[None]),
                "lhs_data": jnp.asarray(half_to_full(
                    np.squeeze(ref["lhs_data"]).astype(
                        np.complex64)).real[None]),
                "f": jnp.asarray(half_to_full(np.squeeze(ref["f"]))[None]),
            }
        out.append(rec)
    return diag, out


def run_ours_free(tracker_name: str, rt, frames, gt):
    """OUR full tracker class free-running from frame 0: own crop path
    (_crop's sample_patch twin), own localization, own filter updates."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    if tracker_name == "mosse":
        from mmtrack_tpu.trackers.mosse_tracker import MOSSETracker
        trk = MOSSETracker(rt)
    else:
        from mmtrack_tpu.trackers.scsrdcf_tracker import SCSRDCFTracker
        trk = SCSRDCFTracker(rt)
    trk.initialize(frames[0], {"init_bbox": [float(v) for v in gt[0]]})
    return np.asarray([trk.track(frames[t])["target_bbox"]
                       for t in range(1, len(frames))], np.float64)


TOL_PX_FREE = 0.01  # free-running per-frame box lockstep tolerance


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracker", choices=("mosse", "scsrdcf"),
                    default="mosse")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--freerun", action="store_true",
                    help="run BOTH loops uninterrupted from frame 0 (no "
                         "teacher forcing, no resync) and compare the "
                         "emitted boxes over the full horizon")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    # interp_f32_parity replicates the reference's float32
    # cubic_spline_fourier (catastrophically cancelling at F~200's small
    # frequencies); the serving default keeps the correct float64 kernel
    if args.tracker == "mosse":
        from mmtrack_tpu.trackers.mosse_tracker import MOSSERuntime
        rt = MOSSERuntime(interp_f32_parity=True)
    else:
        from mmtrack_tpu.trackers.scsrdcf_tracker import SCSRDCFRuntime
        rt = SCSRDCFRuntime(interp_f32_parity=True)

    frames, gt = make_sequence(args.frames, args.seed)

    if args.freerun:
        from tools.parity.freerun import compare_freerun

        _, per_frame, _ = run_reference(args.tracker, frames, gt, rt,
                                        freerun=True)
        ref_boxes = np.asarray([r["box"] for r in per_frame], np.float64)
        our_boxes = run_ours_free(args.tracker, rt, frames, gt)
        n = len(ref_boxes)
        res = {"family": f"{args.tracker}-freerun",
               **compare_freerun(ref_boxes, our_boxes, tol_px=TOL_PX_FREE,
                                 min_horizon=min(n, 40))}
        if res["lockstep_horizon"] < n:
            # attribute the break: the wraparound score maps of real
            # spectra carry EXACT duplicate maxima (conjugate-symmetric
            # twins) plus near-ties; if the reference's own top-2 gap at
            # the break frame is inside the tie margin, the divergence is
            # an argmax tie-break artifact, not a semantics difference —
            # same excusal rule as the per-transition check.
            s = np.asarray(per_frame[res["break_frame"]]["score_map"],
                           np.float64).reshape(-1)
            top2 = np.sort(s)[-2:]
            res["break_top2_gap"] = float(top2[1] - top2[0])
            res["break_is_tie"] = bool(res["break_top2_gap"] < EPS_TIE)
            res["pass"] = bool(res["pass"] and res["break_is_tie"]
                               and not res["event_mismatches"])
        print(json.dumps(res))
        return 0 if res["pass"] else 1

    init, per_frame, patches = run_reference(args.tracker, frames, gt, rt)
    diag, ours = run_ours(args.tracker, rt, init, per_frame, patches,
                          frames, gt)

    n = len(per_frame)
    excused = set()
    box_dev, filt_dev = [], []
    for t in range(n):
        ref = per_frame[t]
        bd = np.abs(np.asarray(ref["box"]) - ours[t]["box"]).max()
        s = np.asarray(ref["score_map"], np.float64).reshape(-1)
        top2 = np.sort(s)[-2:]
        # wraparound score maps of real spectra carry exact duplicate
        # maxima (conjugate-symmetric twins); a near-tie only matters if
        # the two sides actually broke it differently
        if top2[1] - top2[0] < EPS_TIE and bd > TOL_PX:
            excused.add(t)
        box_dev.append(bd)
        if args.tracker == "mosse":
            rn, rd = np.squeeze(ref["num"]), np.squeeze(ref["den"])
            d1 = np.abs(ours[t]["num"] - rn).max() / max(np.abs(rn).max(),
                                                         1e-12)
            d2 = np.abs(ours[t]["den"] - rd).max() / max(np.abs(rd).max(),
                                                         1e-12)
            filt_dev.append(max(float(d1), float(d2)))
        else:
            rf = np.squeeze(ref["f"])
            filt_dev.append(float(np.abs(ours[t]["f"] - rf).max()
                                  / max(np.abs(rf).max(), 1e-12)))
    box_dev = np.asarray(box_dev)
    filt_dev = np.asarray(filt_dev)
    clean = [t for t in range(n) if t not in excused] or [0]

    ok = (float(box_dev[clean].max()) <= TOL_PX
          and float(filt_dev[clean].max()) <= TOL_FILTER
          and all(v <= 1e-4 for v in diag.values())
          and len(clean) >= max(3, n // 2))
    print(json.dumps({
        "ok": ok,
        "tracker": args.tracker,
        "frames": n,
        **diag,
        "max_box_dev_clean": float(box_dev[clean].max()),
        "max_filter_dev_clean": float(filt_dev[clean].max()),
        "excused_frames": sorted(excused),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
