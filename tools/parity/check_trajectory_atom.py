"""Trajectory-level A/B: the reference's own ATOM online loop vs ours.

Runs the reference's ACTUAL tracker — RGBD/models/DeT/pytracking/tracker/
atom/atom.py::ATOM at the published pytracking/parameter/atom/default.py
constants — side by side with mmtrack_tpu's functional ATOM step
(trackers/atom_tracker.py) on the same synthetic sequence and the same
converted weights (ltr/models/bbreg/atom.py::atom_resnet18 donor),
covering the full online state machine:

  - init: 23 augmented samples (identity + 4 relativeshifts + fliplr +
    5 blurs + 12 rotations) -> power-normalized layer3 features ->
    JOINT (filter, projection) Gauss-Newton CG optimization of the
    FactorizedConvProblem (6 GN x 10 CG, M1-preconditioned by
    diag([filter_reg, projection_reg]), optim.py:18,67-68) from the
    reference's OWN randn filter/P inits (captured via a GaussNewtonCG
    wrapper), memory seeded with all samples at weight 1/N, IoU
    modulation from the identity sample;
  - per frame: project -> conv (operation.conv2d 'same', trailing
    row/col dropped for the even 4-kernel) -> Fourier interpolation of
    the raw 18x18 response to the 288x288 output grid (localize_target,
    atom.py:375-388) -> ATOM advanced localization (ABSOLUTE displacement
    norms — no previous-position subtraction, atom.py:427-484) -> IoUNet
    gradient-ascent refinement -> state clamp -> memory update of
    (projected sample, Gaussian label) pairs with the sub-cell +
    even-kernel label offsets -> ConjugateGradient filter re-optimization
    (Polak-Ribiere beta, default.py:31; hard-negative 5 iters / every
    10th frame 5 iters / else 0).

The sequence carries an injected distractor (a dimmed copy of the target
pasted 70 px down-right in frames 8-14) so the run provably covers
hard-negative events, and >=21 tracked frames cover at least two
train_skipping re-optimizations (frame_num 11, 21).

Both loops are teacher-forced from ground truth and both consume the
SAME crops (the reference's sample_patch outputs captured via an
ATOMResNet18.extract hook and fed to atom_step_from_patch /
atom_assemble_init_state). ATOM maps every coordinate through
(pos.round(), target_scale), ignoring sample_patch's internal rounding
(atom.py:309-311) — both sides use those forcing values directly.
RNG-dependent reference features are disabled identically on both
sides: random_shift_factor=0, no dropout augmentation,
num_init_random_boxes=0; the randn (filter, P) inits are captured from
the reference and fed to our joint optimization.

The comparison is per-TRANSITION (state resynchronized to the
reference's recorded post-frame state after every frame), like
check_trajectory_dimp.py — see its docstring for the rationale.

Run: python tools/parity/check_trajectory_atom.py [--frames 26]
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import json
import math
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

TOL_SCORES = 2e-5     # raw 18x18 conv response per transition
TOL_INTERP = 2e-5     # Fourier-interpolated 288x288 map
TOL_PX = 0.01         # output box agreement per transition
# CG-solve tolerances are set by the f64 arbitration probe
# (check_atom_cg.py): replaying the SAME solves, the reference's OWN f32
# arithmetic deviates from its own f64 run by up to 3.4e-4 (online 5-iter
# CG) / 3.7e-2 (init response after 6 GN x 10 CG), while the two
# implementations agree to 5e-14 / 2.3e-6 in f64 — i.e. everything above
# float-noise level is conditioning, not semantics. Tolerances sit a
# small factor above those measured floors (the trajectory run adds
# backbone-feature deviation upstream of the solves).
TOL_FILTER = 1.5e-3   # post-frame filter per transition (floor 3.4e-4)
TOL_WEIGHTS = 1e-6    # memory sample weights (pure arithmetic given flags)
TOL_LABEL = 1e-5      # memory Gaussian labels (pins the center offsets)
TOL_INIT = 1e-3       # init filter, point-wise (observed 2.1e-4)
TOL_INIT_RESPONSE = 5e-2  # init response (probe floor 3.7e-2)

S_IM = 288            # image_sample_size (default.py:20-21, (18*16)^2 area)
SAS = 5.0             # search_area_scale (default.py:22)
# the donor is RANDOM-weight (no checkpoints exist in this environment),
# but unlike DiMP's meta-learned optimizer, ATOM's online solver actually
# fits the Gaussian labels (peak 1.0) — raw response maxima sit well
# above the published 0.25 threshold, which therefore stays usable as-is
NF_TH = 0.25


def make_sequence(n_frames: int, seed: int):
    """Synthetic RGB sequence with a dimmed distractor copy of the target
    pasted 70 px down-right during frames 8-14 (inside the 5x search
    area, beyond the displacement threshold -> 'hard_negative')."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    frames = frames.copy()
    for t in range(8, min(15, n_frames)):
        x, y, w, h = [int(round(v)) for v in gt[t]]
        patch = frames[t, y:y + h, x:x + w].copy()
        dy, dx = 70, 70
        y2, x2 = y + dy, x + dx
        if y2 + h <= 240 and x2 + w <= 320:
            frames[t, y2:y2 + h, x2:x2 + w] = (
                patch.astype(np.float32) * 0.8).astype(np.uint8)
    return np.ascontiguousarray(frames[..., :3]), gt


def forcing_values(gt_box):
    """Teacher-forcing state exactly as atom.py:52-67 computes it (f32
    torch arithmetic mirrored in numpy) — fed verbatim to BOTH loops."""
    x, y, w, h = [np.float32(v) for v in gt_box]
    pos = np.asarray([y + (h - 1) / 2, x + (w - 1) / 2], np.float32)
    target_sz = np.asarray([h, w], np.float32)
    search_area = np.float32(np.float32(h * np.float32(SAS))
                             * np.float32(w * np.float32(SAS)))
    target_scale = np.float32(math.sqrt(float(search_area)) / S_IM)
    base_target_sz = (target_sz / target_scale).astype(np.float32)
    return pos, target_sz, target_scale, base_target_sz


EPS_SCORE = 1e-5  # decision-margin excusal epsilon (score units)


def is_borderline(score_map, target_sz, target_scale, not_found_th) -> bool:
    """True when the reference's localize_advanced decision
    (atom.py:427-484, mirrored in numpy on the interpolated 288x288 map)
    sits within float noise of one of its thresholds or the top-2 peaks
    near-tie. Such frames are excused; the per-transition resync keeps
    every later frame testing from identical state."""
    G = score_map.shape[-1]
    sm = np.asarray(score_map, np.float64).reshape(G, G)
    max1 = float(sm.max())
    if abs(max1 - not_found_th) < EPS_SCORE:
        return True
    if max1 < not_found_th:
        return False
    iy, ix = np.unravel_index(int(sm.argmax()), sm.shape)
    neigh = 2.2 * np.asarray(target_sz, np.float64) / float(target_scale)
    top = max(round(float(iy) - neigh[0] / 2), 0)
    bottom = min(round(float(iy) + neigh[0] / 2 + 1), G)
    left = max(round(float(ix) - neigh[1] / 2), 0)
    right = min(round(float(ix) + neigh[1] / 2 + 1), G)
    masked = sm.copy()
    masked[top:bottom, left:right] = 0
    max2 = float(masked.max())
    if max1 - max2 < EPS_SCORE:
        return True
    if abs(max2 - 0.8 * max1) < EPS_SCORE:
        return True
    if max2 > 0.8 * max1:
        return False  # displacement branches: integer argmax, no margin
    if abs(max2 - 0.5 * max1) < EPS_SCORE:
        return True
    if max2 > 0.5 * max1 and abs(max2 - not_found_th) < EPS_SCORE:
        return True
    return False


def run_reference(frames, gt, seed: int = 0):
    import torch

    patch_cuda_to_cpu()
    patch_legacy_fft()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/DeT"):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        atomnet_mod = importlib.import_module("ltr.models.bbreg.atom")
        atom_mod = importlib.import_module("pytracking.tracker.atom.atom")
        deep_mod = importlib.import_module("pytracking.features.deep")
        extractor_mod = importlib.import_module(
            "pytracking.features.extractor")
        params_mod = importlib.import_module("pytracking.utils.params")

        torch.manual_seed(seed)
        donor = atomnet_mod.atom_resnet18(backbone_pretrained=False)
        donor.eval()

        # in-memory donor: ATOMResNet18.initialize() resolves the net via
        # deep.load_network (deep.py:172) — point it at ours
        deep_mod.load_network = lambda *a, **k: donor

        # pytracking/parameter/atom/default.py verbatim, minus the
        # RNG-dependent pieces (dropout augmentation, random shifts,
        # random iounet init boxes)
        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.max_image_sample_size = (18 * 16) ** 2
        p.min_image_sample_size = (18 * 16) ** 2
        p.search_area_scale = SAS
        p.feature_size_odd = False
        p.CG_iter = 5
        p.init_CG_iter = 60
        p.init_GN_iter = 6
        p.post_init_CG_iter = 0
        p.fletcher_reeves = False
        p.standard_alpha = True
        p.CG_forgetting_rate = None
        p.sample_memory_size = 250
        p.train_skipping = 10
        p.feature_window = False
        p.window_output = False
        p.scale_factors = torch.ones(1)
        p.score_upsample_factor = 1
        p.augmentation = {"fliplr": True,
                          "rotate": [5, -5, 10, -10, 20, -20, 30, -30,
                                     45, -45, -60, 60],
                          "blur": [(2, 0.2), (0.2, 2), (3, 1), (1, 3),
                                   (2, 2)],
                          "relativeshift": [(0.6, 0.6), (-0.6, 0.6),
                                            (0.6, -0.6), (-0.6, -0.6)]}
        p.augmentation_expansion_factor = 2
        p.random_shift_factor = 0
        p.update_projection_matrix = True
        p.proj_init_method = "randn"
        p.filter_init_method = "randn"
        p.projection_activation = "none"
        p.response_activation = ("mlu", 0.05)
        p.advanced_localization = True
        p.target_not_found_threshold = NF_TH
        p.distractor_threshold = 0.8
        p.hard_negative_threshold = 0.5
        p.target_neighborhood_scale = 2.2
        p.dispalcement_scale = 0.8
        p.hard_negative_learning_rate = 0.02
        p.hard_negative_CG_iter = 5
        p.update_scale_when_uncertain = True
        p.use_iou_net = True
        p.iounet_augmentation = False
        p.iounet_k = 3
        p.num_init_random_boxes = 0
        p.box_jitter_pos = 0.1
        p.box_jitter_sz = 0.5
        p.maximal_aspect_ratio = 6
        p.box_refinement_iter = 5
        p.box_refinement_step_length = 1
        p.box_refinement_step_decay = 1

        deep_params = params_mod.TrackerParams()
        deep_params.learning_rate = 0.01
        deep_params.init_samples_minimum_weight = 0.25
        deep_params.output_sigma_factor = 1 / 4
        deep_params.kernel_size = (4, 4)
        deep_params.compressed_dim = 64
        deep_params.filter_reg = 1e-1
        deep_params.projection_reg = 1e-4
        deep_params.use_augmentation = True
        deep_fparams = params_mod.FeatureParams(
            feature_params=[deep_params])
        deep_feat = deep_mod.ATOMResNet18(
            net_path="<in-memory>", output_layers=["layer3"],
            fparams=deep_fparams, normalize_power=2)
        p.features = extractor_mod.MultiResolutionExtractor([deep_feat])

        cap = {"patches": [], "smaps": [], "raws": [],
               "f0": None, "P0": None}

        orig_extract = deep_feat.extract

        def hook_extract(im):
            cap["patches"].append(im.detach().numpy().copy())
            return orig_extract(im)

        deep_feat.extract = hook_extract

        # capture the randn (filter, P) inits at the first joint-optimizer
        # run (init_optimization creates them just before, atom.py:148-159)
        orig_gnc = atom_mod.GaussNewtonCG

        class CapturingGNC(orig_gnc):
            def run(self, *a, **k):
                if cap["f0"] is None:
                    cap["f0"] = self.x[0].detach().numpy().copy()
                    cap["P0"] = self.x[1].detach().numpy().copy()
                    # the exact tensors the joint problem optimizes on —
                    # the f64 arbitration probe (check_atom_cg.py) feeds
                    # these SAME inputs to both CG implementations
                    pr = self.problem
                    cap["init_feats"] = \
                        pr.training_samples[0].detach().numpy().copy()
                    cap["init_y"] = pr.y[0].detach().numpy().copy()
                    cap["init_sw"] = \
                        pr.sample_weights[0].detach().numpy().copy()
                return super().run(*a, **k)

        atom_mod.GaussNewtonCG = CapturingGNC

        # torch>=2 rejects the fork's list-subclass TensorList in
        # autograd.grad's __torch_function__ dispatch (optimization.py:395
        # et al. worked on torch 1.x, where plain sequences passed
        # through). Zero-math bridge: coerce to plain tuples.
        orig_grad = torch.autograd.grad

        def grad_compat(outputs, inputs, grad_outputs=None, **kw):
            def plain(v):
                return tuple(v) if isinstance(v, (list, tuple)) else v
            go = None if grad_outputs is None else plain(grad_outputs)
            return orig_grad(plain(outputs), plain(inputs), go, **kw)

        torch.autograd.grad = grad_compat
        try:
            tracker = atom_mod.ATOM(p)
            tracker.initialize(
                frames[0], {"init_bbox": [float(v) for v in gt[0]]})
        finally:
            atom_mod.GaussNewtonCG = orig_gnc

        assert int(tracker.img_sample_sz[0].item()) == S_IM, \
            tracker.img_sample_sz

        orig_af = tracker.apply_filter

        def hook_af(x):
            s = orig_af(x)
            cap["raws"].append(s[0].detach().numpy().copy())
            return s

        tracker.apply_filter = hook_af

        orig_loc = tracker.localize_target

        def hook_loc(scores_raw):
            out = orig_loc(scores_raw)
            cap["smaps"].append(out[2].detach().numpy().copy())
            return out

        tracker.localize_target = hook_loc

        n_init = cap["patches"][0].shape[0]
        init = {
            "patches": cap["patches"][0],
            "shifts": [list(T.shift) for T in tracker.transforms],
            "f0": cap["f0"], "P0": cap["P0"],
            "feats": cap["init_feats"], "feats_y": cap["init_y"],
            "feats_sw": cap["init_sw"],
            "filter": tracker.filter[0].detach().numpy().copy(),
            "projection":
                tracker.projection_matrix[0].detach().numpy().copy(),
            "labels": tracker.y[0][:n_init, 0].detach().numpy().copy(),
            "weights": tracker.sample_weights[0].numpy().copy(),
            "samples": tracker.training_samples[0].numpy().copy(),
            "y": tracker.y[0].numpy().copy(),
            "num_stored": int(tracker.num_stored_samples[0]),
        }

        boxes, flags, filters, weights, repl, maxsc = [], [], [], [], [], []
        excused, resync = [], {}
        for t in range(1, len(frames)):
            pos, tsz, ts, bts = forcing_values(gt[t - 1])
            tracker.pos = torch.from_numpy(pos.copy())
            tracker.target_sz = torch.from_numpy(tsz.copy())
            tracker.target_scale = torch.tensor(float(ts))
            tracker.base_target_sz = torch.from_numpy(bts.copy())
            out = tracker.track(frames[t])
            boxes.append(out["target_bbox"])
            flags.append(tracker.debug_info["flag"] or "normal")
            maxsc.append(float(tracker.debug_info["max_score"]))
            filters.append(tracker.filter[0].detach().numpy().copy())
            weights.append(tracker.sample_weights[0].numpy().copy())
            repl.append(tracker.previous_replace_ind[0])

            excused.append(is_borderline(
                cap["smaps"][-1], tsz, ts, NF_TH))
            if tracker.debug_info["flag"] in (None, "normal",
                                              "hard_negative"):
                r = int(tracker.previous_replace_ind[0])
                resync[t - 1] = {
                    "slot": r,
                    "sample": tracker.training_samples[0][r]
                                     .numpy().copy(),
                    "label": tracker.y[0][r, 0].numpy().copy(),
                    "num_stored": int(tracker.num_stored_samples[0]),
                }

        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in donor.state_dict().items()}
        return sd_np, init, {
            "patches": cap["patches"][1:],
            "raws": cap["raws"],
            "smaps": cap["smaps"],
            "boxes": np.asarray(boxes, np.float64),
            "flags": flags, "filters": filters,
            "weights": np.asarray(weights), "repl": repl,
            "max_scores": np.asarray(maxsc),
            "excused": excused, "resync": resync,
        }


def run_ours(sd_np, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.atom import ATOMNet
    from mmtrack_tpu.models.convert import (convert_atom_checkpoint,
                                            load_into)
    from mmtrack_tpu.trackers.atom_tracker import (
        ATOMRuntime,
        _apply_filter_same,
        _interpolate_scores,
        _localize_atom,
        _normalize_feat,
        atom_assemble_init_state,
        atom_step_from_patch,
    )
    from mmtrack_tpu.trackers.dimp_tracker import (
        FLAG_HARD_NEG,
        FLAG_NORMAL,
        FLAG_NOT_FOUND,
        FLAG_UNCERTAIN,
        _normalize,
    )

    rt = ATOMRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                     num_init_random_boxes=0,
                     target_not_found_threshold=NF_TH)
    net = ATOMNet()

    n_init = init["patches"].shape[0]
    assert rt.num_init_samples == n_init, (rt.num_init_samples, n_init)

    tr = jnp.zeros((1, S_IM, S_IM, 3), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr,
                            jnp.zeros((1, 4)), jnp.zeros((1, 1, 4)))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_atom_checkpoint(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    # ---- init from the reference's own augmented patches + randn inits
    patches = jnp.asarray(init["patches"].transpose(0, 2, 3, 1))
    norm = _normalize(patches)
    bfeat = net.apply(P, norm, method=ATOMNet.extract_backbone)
    clf = _normalize_feat(rt, bfeat["layer3"])
    shifts = jnp.asarray(np.asarray(init["shifts"], np.float32))  # (N,2) yx

    pos0, tsz0, ts0, bts0 = forcing_values(gt[0])
    f0 = jnp.asarray(init["f0"][0].transpose(1, 2, 0))       # (4,4,64)
    P0 = jnp.asarray(init["P0"][:, :, 0, 0].T)               # (256,64)
    state = atom_assemble_init_state(
        rt, net, P, clf, {k: v[:1] for k, v in bfeat.items()}, shifts,
        jnp.asarray(pos0), jnp.asarray(tsz0), jnp.asarray(ts0),
        jnp.asarray(bts0), jax.random.PRNGKey(0), f0=f0, P0=P0)

    init_filter_dev = float(np.abs(
        np.asarray(state["filter"]).transpose(2, 0, 1)
        - init["filter"][0]).max())
    init_proj_dev = float(np.abs(
        np.asarray(state["projection"]).T
        - init["projection"][:, :, 0, 0]).max())
    # the factorized problem is invariant under (f, P) -> (f/c, cP) up to
    # the (tiny) regularizers, so 60 f32 CG iterations drift point-wise
    # along that flat manifold; the FUNCTIONAL init metric is the response
    # the jointly-optimized pair produces on the init samples
    f_ref = jnp.asarray(init["filter"][0].transpose(1, 2, 0))
    P_ref = jnp.asarray(init["projection"][:, :, 0, 0].T)
    resp_ours = _apply_filter_same(rt, clf @ state["projection"],
                                   state["filter"])
    resp_ref = _apply_filter_same(rt, clf @ P_ref, f_ref)
    init_response_dev = float(jnp.abs(resp_ours - resp_ref).max())
    init_label_dev = float(np.abs(
        np.asarray(state["memory_y"])[:n_init] - init["labels"]).max())
    init_weights_dev = float(np.abs(
        np.asarray(state["sample_weights"]) - init["weights"]).max())

    # mirror of the reference's online memory (for the resync); note the
    # reference stores PROJECTED samples — re-projection with ITS post-init
    # P happens inside init_optimization (atom.py:234-237)
    mem_comp = init["samples"].transpose(0, 2, 3, 1).copy()  # (250,18,18,64)
    mem_y = init["y"][:, 0].copy()                           # (250,18,18)
    num_stored = init["num_stored"]

    state = {**state,
             "filter": jnp.asarray(init["filter"][0].transpose(1, 2, 0)),
             "projection": jnp.asarray(init["projection"][:, :, 0, 0].T),
             "memory_comp": jnp.asarray(mem_comp),
             "memory_y": jnp.asarray(mem_y),
             "sample_weights": jnp.asarray(init["weights"]),
             "num_stored": jnp.asarray(num_stored, jnp.int32)}

    step = jax.jit(partial(atom_step_from_patch, rt, net))

    @jax.jit
    def probe(p, state, patch, sample_scale):
        bf = net.apply(p, patch[None], method=ATOMNet.extract_backbone)
        comp = _normalize_feat(rt, bf["layer3"]) @ state["projection"]
        raw = _apply_filter_same(rt, comp, state["filter"])
        interp = _interpolate_scores(rt, raw[0])
        _, flag, _ = _localize_atom(rt, interp, state, sample_scale)
        return raw[0], interp, flag

    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_UNCERTAIN: "uncertain", FLAG_HARD_NEG: "hard_negative"}

    out = {"boxes": [], "flags": [], "raws": [], "smaps": [],
           "filters": [], "weights": [], "repl": [], "labels": {}}
    for t in range(1, len(frames)):
        pos, tsz, ts, bts = forcing_values(gt[t - 1])
        state = {**state,
                 "pos": jnp.asarray(pos), "target_sz": jnp.asarray(tsz),
                 "target_scale": jnp.asarray(ts),
                 "base_target_sz": jnp.asarray(bts)}
        # ATOM maps through (round(pos), target_scale), atom.py:309-311
        sample_pos = np.round(pos).astype(np.float32)
        sample_scale = ts
        patch = jnp.asarray(
            ref["patches"][t - 1][0].transpose(1, 2, 0))  # raw 0..255
        patch = _normalize(patch)

        raw, interp, flag = probe(P, state, patch,
                                  jnp.asarray(sample_scale))
        out["raws"].append(np.asarray(raw))
        out["smaps"].append(np.asarray(interp))
        out["flags"].append(flag_names[int(flag)])

        state, box, _score = step(
            P, state, patch, jnp.asarray(sample_pos),
            jnp.asarray(sample_scale),
            (float(frames.shape[1]), float(frames.shape[2])))
        out["boxes"].append(np.asarray(box, np.float64))
        out["filters"].append(np.asarray(state["filter"]).transpose(2, 0, 1))
        out["weights"].append(np.asarray(state["sample_weights"]))
        out["repl"].append(int(state["prev_replace_ind"]))
        r = int(state["prev_replace_ind"])
        if r >= 0:
            out["labels"][t - 1] = np.asarray(state["memory_y"][r])

        # per-transition resync to the reference's post-frame state
        rs = ref["resync"].get(t - 1)
        if rs is not None:
            mem_comp[rs["slot"]] = rs["sample"].transpose(1, 2, 0)
            mem_y[rs["slot"]] = rs["label"]
            num_stored = rs["num_stored"]
        pr = ref["repl"][t - 1]
        state = {
            **state,
            "filter": jnp.asarray(
                ref["filters"][t - 1][0].transpose(1, 2, 0)),
            "memory_comp": jnp.asarray(mem_comp),
            "memory_y": jnp.asarray(mem_y),
            "sample_weights": jnp.asarray(ref["weights"][t - 1]),
            "num_stored": jnp.asarray(num_stored, jnp.int32),
            "prev_replace_ind": jnp.asarray(
                -1 if pr is None else int(pr), jnp.int32),
        }

    out["init_filter_dev"] = init_filter_dev
    out["init_response_dev"] = init_response_dev
    out["init_proj_dev"] = init_proj_dev
    out["init_label_dev"] = init_label_dev
    out["init_weights_dev"] = init_weights_dev
    out["boxes"] = np.asarray(out["boxes"])
    out["weights"] = np.asarray(out["weights"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=26)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt = make_sequence(args.frames, args.seed)
    sd, init, ref = run_reference(frames, gt, args.seed)
    ours = run_ours(sd, init, ref, frames, gt)

    n = len(ref["boxes"])
    excused = {t for t, b in enumerate(ref["excused"]) if b}
    clean = [t for t in range(n) if t not in excused]
    raw_dev = np.asarray([np.abs(ref["raws"][t].reshape(-1)
                                 - ours["raws"][t].reshape(-1)).max()
                          for t in range(n)])
    smap_dev = np.asarray([np.abs(ref["smaps"][t].reshape(-1)
                                  - ours["smaps"][t].reshape(-1)).max()
                           for t in range(n)])
    box_dev = np.abs(ref["boxes"] - ours["boxes"]).max(axis=1)
    flag_mismatch = [t for t in clean
                     if ref["flags"][t] != ours["flags"][t]]
    ref_repl = [-1 if r is None else int(r) for r in ref["repl"]]
    repl_mismatch = [t for t in clean
                     if ref_repl[t] != ours["repl"][t]]
    filt_dev = max(float(np.abs(ref["filters"][t][0]
                                - ours["filters"][t]).max())
                   for t in clean)
    w_dev = max(float(np.abs(ref["weights"][t] - ours["weights"][t]).max())
                for t in clean)
    label_dev = 0.0
    for t in clean:
        rs = ref["resync"].get(t)
        if rs is not None and t in ours["labels"]:
            label_dev = max(label_dev, float(
                np.abs(rs["label"] - ours["labels"][t]).max()))

    hn_events = sum(1 for t in clean if ref["flags"][t] == "hard_negative")
    reopt_events = sum(1 for t in clean if (t + 1) % 10 == 0)

    if os.environ.get("MMTRACK_TRAJ_DEBUG"):
        for t in range(n):
            print(f"t={t:2d} flag_ref={ref['flags'][t]:13s} "
                  f"flag_ours={ours['flags'][t]:13s} "
                  f"raw_dev={raw_dev[t]:.2e} smap_dev={smap_dev[t]:.2e} "
                  f"box_dev={box_dev[t]:.4f} max_sc={ref['max_scores'][t]:.3f} "
                  f"filt_dev={np.abs(ref['filters'][t][0] - ours['filters'][t]).max():.2e}",
                  file=sys.stderr)

    res = {
        "family": "atom-trajectory",
        "frames_tracked": n,
        "excused_frames": sorted(excused),
        "init_filter_dev": ours["init_filter_dev"],
        "init_proj_dev": ours["init_proj_dev"],
        "init_response_dev": ours["init_response_dev"],
        "init_label_dev": ours["init_label_dev"],
        "init_weights_dev": ours["init_weights_dev"],
        "max_raw_score_dev": float(raw_dev[clean].max()),
        "max_interp_score_dev": float(smap_dev[clean].max()),
        "max_box_dev_px": float(box_dev[clean].max()),
        "mean_box_dev_px": float(box_dev[clean].mean()),
        "flag_mismatches": flag_mismatch,
        "replace_ind_mismatches": repl_mismatch,
        "max_filter_dev": filt_dev,
        "max_weights_dev": w_dev,
        "max_label_dev": label_dev,
        "hard_negative_events": hn_events,
        "filter_reopt_events": reopt_events,
        "ref_flags": ref["flags"],
        "ref_max_scores": [round(float(v), 4) for v in ref["max_scores"]],
        "pass": bool(len(excused) <= 0.3 * n
                     and ours["init_filter_dev"] <= TOL_INIT
                     and ours["init_response_dev"] <= TOL_INIT_RESPONSE
                     and ours["init_proj_dev"] <= 0.05 * abs(
                         init["P0"]).max()  # point-wise diagnostic only
                     and ours["init_label_dev"] <= TOL_LABEL
                     and raw_dev[clean].max() <= TOL_SCORES
                     and smap_dev[clean].max() <= TOL_INTERP
                     and box_dev[clean].max() <= TOL_PX
                     and not flag_mismatch and not repl_mismatch
                     and filt_dev <= TOL_FILTER and w_dev <= TOL_WEIGHTS
                     and label_dev <= TOL_LABEL
                     and hn_events >= 1 and reopt_events >= 1),
        "tol": {"raw": TOL_SCORES, "interp": TOL_INTERP, "px": TOL_PX,
                "filter": TOL_FILTER, "weights": TOL_WEIGHTS,
                "label": TOL_LABEL, "init": TOL_INIT,
                "init_response": TOL_INIT_RESPONSE},
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
