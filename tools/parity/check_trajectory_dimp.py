"""Trajectory-level A/B: the reference's own DiMP online loop vs ours.

check_dimp.py proves per-module forward parity of the converted weights.
This check closes the L3-runtime channel for the DiMP family: it runs the
reference's ACTUAL tracker — RGBD/models/DeT/pytracking/tracker/dimp/
dimp.py::DiMP at the DeT_DiMP50_Max parameters (parameter/dimp/
DeT_DiMP50_Max.py:12-63) — side by side with mmtrack_tpu's functional
DiMP step on the same synthetic sequence and the same converted weights,
covering the full online state machine:

  - init: augmented sample set -> filter init + 10 steepest-descent
    iterations, memory seeded with all samples at weight 1/N, IoU
    modulation from the identity sample;
  - per frame: classify -> ATOM advanced localization (flag lattice) ->
    IoUNet gradient-ascent refinement -> state clamp -> memory update
    (min-weight replacement, hard-negative learning rate) -> filter
    re-optimization (hn: 1 iter / every-20th frame: 2 iters / else 0).

The sequence carries an injected distractor (a dimmed copy of the target
pasted ~100 px away in frames 8-14) so the run provably covers at least
one hard-negative event (flag lattice branch dimp.py:286-302) and, via
>=21 tracked frames, at least one train_skipping filter re-optimization
(dimp.py:624-641). Per frame we compare: the raw 19x19 score map, the
localization flag, the output box, the replaced memory slot + sample
weights, and the online filter itself (so a single divergent update
anywhere would compound and be caught at the end).

Both loops are teacher-forced from ground truth (pos/target_sz/
target_scale reset to identical float32 values before every frame) and
both consume the SAME crops: the reference's sample_patch outputs are
captured via hooks and fed to our dimp_step_from_patch /
dimp_assemble_init_state, so the check isolates loop semantics. Our own
crop geometry is reference-exact by construction (trackers/
dimp_tracker.py::_sample_geometry mirrors preprocessing.py:57-150) and
is covered by unit tests. RNG-dependent reference features are disabled
identically on both sides: random_shift_factor=0, no dropout
augmentation, num_init_random_boxes=0 (torch RNG streams cannot be
reproduced in jax; everything else is deterministic).

The comparison is per-TRANSITION: after every frame our online state
(filter, memory, weights) is resynchronized to the reference's recorded
post-frame state, so frame t+1 on both sides starts from an identical
state and the full step function is compared at f32 forward-noise
precision (~1e-7 observed) with no compounding. Without resync the same
loops stay in lockstep for 15+ frames, but the donor's RANDOM weights
make the response a noise field whose localize_advanced ratios sit near
the 0.5x/0.8x thresholds, so accumulated 1e-3-scale drift eventually
flips a borderline branch — an artifact of the untrained model, not a
runtime difference (verified: with identical states, flags match on all
frames including the previously-flipping ones). Init parity (the
13-sample filter optimization) is reported separately as
init_filter_dev before the first resync.

Run: python tools/parity/check_trajectory_dimp.py [--frames 26]
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
    reference_available,
    reference_path,
)

TOL_SCORES = 1e-5     # raw 19x19 map per transition (observed ~1.6e-7)
TOL_PX = 0.01         # output box agreement per transition
TOL_FILTER = 1e-4     # post-frame filter per transition (observed ~3e-6
                      # on the 2-iter re-optimization frame)
TOL_WEIGHTS = 1e-6    # memory sample weights (pure arithmetic given flags)
TOL_INIT_FILTER = 1e-3  # 13-sample init: filter init + 10 SD iterations

S_IM = 288   # image_sample_size (DeT_DiMP50_Max.py:12, 18*16)
SAS = 5.0    # search_area_scale
# --config prdimp switches the harness to the AR fork's PrDiMP-50: the
# SAME pytracking dimp.py tracker class at the published
# pytracking/parameter/dimp/prdimp50.py constants (352px inside_major
# geometry, softmax score preprocessing, relative-space box refinement,
# KL-divergence Newton filter optimizer) on a klcedimpnet50 donor.
CONFIGS = {
    "det": dict(subdir="RGBD/models/DeT", s_im=288, sas=5.0, channels=6,
                nf_th=0.02),
    # the keep_track fork ships BOTH klcedimpnet50 and a RUNNABLE
    # dimp.py with the softmax path (the AR fork's pytracking/__init__
    # does not re-export dcf, so its dimp tracker cannot import)
    "prdimp": dict(subdir="RGBD/models/keep_track_vot2021", s_im=352,
                   sas=6.0, channels=3, nf_th=0.004),
}
CFG = CONFIGS["det"]


def make_sequence(n_frames: int, seed: int):
    """Synthetic sequence with a dimmed distractor copy of the target
    pasted 70 px down-right during frames 8-14 (inside the 5x search
    area, beyond the displacement threshold -> 'hard_negative').
    Also returns the distractor's own xywh rows (NaN when absent) for
    the freerun donor's secondary-peak supervision."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    frames = frames.copy()
    dgt = np.full((n_frames, 4), np.nan)
    for t in range(8, min(15, n_frames)):
        x, y, w, h = [int(round(v)) for v in gt[t]]
        patch = frames[t, y:y + h, x:x + w].copy()
        dy, dx = 70, 70
        y2, x2 = y + dy, x + dx
        if y2 + h <= 240 and x2 + w <= 320:
            frames[t, y2:y2 + h, x2:x2 + w] = (
                patch.astype(np.float32) * 0.8).astype(np.uint8)
            dgt[t] = (x2, y2, w, h)
    return np.ascontiguousarray(frames[..., :CFG["channels"]]), gt, dgt


def forcing_values(gt_box):
    """Teacher-forcing state exactly as dimp.py:44-68 computes it (float32
    torch arithmetic mirrored in numpy) — fed verbatim to BOTH loops."""
    x, y, w, h = [np.float32(v) for v in gt_box]
    pos = np.asarray([y + (h - 1) / 2, x + (w - 1) / 2], np.float32)
    target_sz = np.asarray([h, w], np.float32)
    search_area = np.float32(np.float32(h * np.float32(SAS))
                             * np.float32(w * np.float32(SAS)))
    target_scale = np.float32(math.sqrt(float(search_area)) / S_IM)
    base_target_sz = (target_sz / target_scale).astype(np.float32)
    return pos, target_sz, target_scale, base_target_sz


EPS_SCORE = 1e-5  # decision-margin excusal epsilon (score units; ~60x the
                  # observed per-transition forward noise)
EPS_DISP = 1e-3   # displacement-threshold margin epsilon (score-map cells)


def is_borderline(score_map, pos, target_sz, sample_pos, sample_scale,
                  not_found_th) -> bool:
    """True when the reference's OWN localize_advanced decision
    (dimp.py:239-304, mirrored in numpy) sits within float noise of one of
    its thresholds, or the top-2 peaks are near-tied (argmax stability).
    With a random-weight donor the response is noise-scale, so a handful
    of frames land exactly on the 0.5x/0.8x ratio boundaries — on those
    frames the two implementations may legitimately branch differently
    from sub-1e-3 forward noise. Such frames are excused and our state is
    resynchronized from the reference's so every later frame still tests
    the full transition from identical state."""
    S = score_map.shape[0]
    output_sz = float(S - 1)  # kernel 4 -> (ksz+1)%2 == 1
    center = (S - 1) / 2.0
    max1 = float(score_map.max())
    if abs(max1 - not_found_th) < EPS_SCORE:
        return True
    if max1 < not_found_th:
        return False  # robust not_found on both sides
    iy, ix = np.unravel_index(int(score_map.argmax()), score_map.shape)
    neigh = 2.2 * (np.asarray(target_sz, np.float64) / sample_scale) \
        * (output_sz / S_IM)
    top = max(round(float(iy) - neigh[0] / 2), 0)
    bottom = min(round(float(iy) + neigh[0] / 2 + 1), S)
    left = max(round(float(ix) - neigh[1] / 2), 0)
    right = min(round(float(ix) + neigh[1] / 2 + 1), S)
    masked = np.array(score_map, np.float64, copy=True)
    masked[top:bottom, left:right] = 0
    max2 = float(masked.max())
    if max1 - max2 < EPS_SCORE:
        return True  # argmax could flip between the two peaks
    if abs(max2 - 0.8 * max1) < EPS_SCORE:
        return True  # distractor_threshold boundary
    jy, jx = np.unravel_index(int(masked.argmax()), masked.shape)
    scale_fac = (S_IM / output_sz) * float(sample_scale)
    prev_vec = (np.asarray(pos, np.float64) - np.asarray(sample_pos,
                                                         np.float64)) \
        / scale_fac
    d1 = np.asarray([iy, ix], np.float64) - center
    d2 = np.asarray([jy, jx], np.float64) - center
    disp_norm1 = float(np.sqrt(((d1 - prev_vec) ** 2).sum()))
    disp_norm2 = float(np.sqrt(((d2 - prev_vec) ** 2).sum()))
    disp_th = 0.8 * math.sqrt(S * S) / 2
    if max2 > 0.8 * max1:
        if (abs(disp_norm1 - disp_th) < EPS_DISP
                or abs(disp_norm2 - disp_th) < EPS_DISP):
            return True  # displacement-threshold boundary
        return False
    if abs(max2 - 0.5 * max1) < EPS_SCORE:
        return True  # hard_negative_threshold boundary
    if max2 > 0.5 * max1 and abs(max2 - not_found_th) < EPS_SCORE:
        return True
    return False


def run_reference(frames, gt, seed: int = 0, freerun: bool = False,
                  overfit_steps: int = 0, distractor_gt=None):
    """freerun=True: overfit the donor's classifier (decisive response),
    switch to the published absolute not-found threshold and the
    published classifier-only mode (use_iou_net=False, dimp.py:87/125-131
    — random IoUNet weights would random-walk the scale), and run the
    loop UNINTERRUPTED from frame 0 (no pos/scale forcing)."""
    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path(CFG["subdir"]):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        dimpnet = importlib.import_module("ltr.models.tracking.dimpnet")
        dimp_mod = importlib.import_module("pytracking.tracker.dimp.dimp")
        params_mod = importlib.import_module("pytracking.utils.params")
        nw_mod = importlib.import_module("pytracking.features.net_wrappers")

        torch.manual_seed(seed)
        if CFG is CONFIGS["det"]:
            donor = dimpnet.dimp50_DeT(
                merge_type="max", filter_size=4, optim_iter=5,
                backbone_pretrained=False, out_feature_dim=512,
                init_gauss_sigma=0.9, num_dist_bins=100,
                bin_displacement=0.1, mask_init_factor=3.0,
                score_act="relu")
        else:
            # klcedimpnet50 at the prdimp50 train settings (like
            # check_prdimp.py's model-level donor)
            donor = dimpnet.klcedimpnet50(
                filter_size=4, optim_iter=5, backbone_pretrained=False,
                clf_feat_norm=True, clf_feat_blocks=0, final_conv=True,
                out_feature_dim=512, optim_init_step=1.0,
                optim_init_reg=0.05, optim_min_reg=0.05, gauss_sigma=0.9,
                alpha_eps=0.05, normalize_label=True,
                init_initializer="zero")
        donor.eval()
        if overfit_steps:
            from tools.parity.overfit_donors import overfit_det_dimp_classifier
            assert CFG is CONFIGS["det"], "freerun donor overfit is DeT-only"
            mse = overfit_det_dimp_classifier(donor, frames, gt,
                                              steps=overfit_steps, seed=seed,
                                              S=S_IM,
                                              search_area_scale=SAS,
                                              distractor_gt=distractor_gt)
            print(f"donor classifier overfit: final mse {mse:.5f}",
                  file=sys.stderr)

        class InMemoryNet(nw_mod.NetWithBackbone):
            def __init__(self, net):
                super().__init__(net_path="<in-memory>", use_gpu=False)
                self.net = net

            def initialize(self):
                self.net.eval()

        # DeT_DiMP50_Max.py:12-63 verbatim, minus the RNG-dependent pieces
        # (dropout augmentation, random shifts, random iounet init boxes)
        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.image_sample_size = S_IM
        p.search_area_scale = SAS
        p.sample_memory_size = 50
        p.learning_rate = 0.01
        p.init_samples_minimum_weight = 0.25
        p.train_skipping = 20
        p.update_classifier = True
        p.net_opt_iter = 10
        p.net_opt_update_iter = 2
        p.net_opt_hn_iter = 1
        p.window_output = False
        p.use_augmentation = True
        p.augmentation = {"fliplr": True,
                          "rotate": [10, -10, 45, -45],
                          "blur": [(3, 1), (1, 3), (2, 2)],
                          "relativeshift": [(0.6, 0.6), (-0.6, 0.6),
                                            (0.6, -0.6), (-0.6, -0.6)]}
        p.augmentation_expansion_factor = 2
        p.random_shift_factor = 0
        p.advanced_localization = True
        # the donor has RANDOM weights (no checkpoints exist in this
        # environment): its filter peaks at ~0.05-0.2 rather than a trained
        # model's ~1.0, so the published 0.25 absolute not-found threshold
        # would gate every frame into 'not_found' and no update machinery
        # would run. Scale it down IDENTICALLY on both sides (the rest of
        # the lattice is ratio-based and keeps its published constants) so
        # memory updates, hard negatives and re-optimization are exercised.
        # the scaled not-found threshold (module constant rationale above)
        # applies to the freerun too: the overfit donor's SD-optimized
        # response peaks at ~0.09 (the augmented init samples hold the
        # joint solve below the initializer-proxy amplitude), DECISIVELY
        # above 0.02 — the ratio gates are scale-free either way
        p.target_not_found_threshold = CFG["nf_th"]
        if freerun:
            p.use_iou_net = False
        p.distractor_threshold = 0.8
        p.hard_negative_threshold = 0.5
        p.target_neighborhood_scale = 2.2
        p.dispalcement_scale = 0.8
        p.hard_negative_learning_rate = 0.02
        p.update_scale_when_uncertain = True
        p.iounet_augmentation = False
        p.iounet_use_log_scale = True
        p.iounet_k = 3
        p.num_init_random_boxes = 0
        p.box_jitter_pos = 0.1
        p.box_jitter_sz = 0.5
        p.maximal_aspect_ratio = 6
        if CFG is CONFIGS["det"]:
            p.box_refinement_iter = 5
            p.box_refinement_step_length = 1
        else:
            # prdimp50.py:14-15 + 43-66
            p.border_mode = "inside_major"
            p.patch_max_scale_change = 1.5
            p.score_preprocess = "softmax"
            p.box_refinement_space = "relative"
            p.box_refinement_iter = 10
            p.box_refinement_step_length = 2.5e-3
        p.box_refinement_step_decay = 1
        p.net = InMemoryNet(donor)

        tracker = dimp_mod.DiMP(p)

        cap = {"init_patches": None, "patches": [], "coords": [],
               "scores": []}

        orig_spt = dimp_mod.sample_patch_transformed

        def hook_spt(im, pos, scale, image_sz, transforms, is_mask=False):
            out = orig_spt(im, pos, scale, image_sz, transforms,
                           is_mask=is_mask)
            cap["init_patches"] = out.detach().numpy().copy()
            return out

        orig_spm = dimp_mod.sample_patch_multiscale

        def hook_spm(im, pos, scales, sz, mode="replicate",
                     max_scale_change=None):
            patches, coords = orig_spm(im, pos, scales, sz, mode=mode,
                                       max_scale_change=max_scale_change)
            cap["patches"].append(patches.detach().numpy().copy())
            cap["coords"].append(coords.detach().numpy().copy())
            return patches, coords

        dimp_mod.sample_patch_transformed = hook_spt
        dimp_mod.sample_patch_multiscale = hook_spm
        try:
            tracker.initialize(
                frames[0], {"init_bbox": [float(v) for v in gt[0]]})

            orig_cls = tracker.classify_target

            def hook_cls(x):
                s = orig_cls(x)
                cap["scores"].append(s.detach().numpy().copy())
                return s

            tracker.classify_target = hook_cls

            init = {
                "patches": cap["init_patches"],
                "shifts": [list(T.shift) for T in tracker.transforms],
                "ctb": tracker.classifier_target_box.numpy().copy(),
                "filter": tracker.target_filter.detach().numpy().copy(),
                "weights": tracker.sample_weights[0].numpy().copy(),
                # full post-init online state for the first resync
                "samples": tracker.training_samples[0].numpy().copy(),
                "boxes": tracker.target_boxes.numpy().copy(),
                "num_stored": int(tracker.num_stored_samples[0]),
            }

            # NB: no torch.no_grad() wrapper — the reference's own loop
            # runs track() with grad enabled (the IoUNet ascent needs
            # autograd; everything else is guarded internally)
            boxes, flags, filters, weights, repl, confs = [], [], [], [], [], []
            excused, resync = [], {}
            for t in range(1, len(frames)):
                pos, tsz, ts, bts = forcing_values(gt[t - 1])
                if not freerun:
                    tracker.pos = torch.from_numpy(pos.copy())
                    tracker.target_sz = torch.from_numpy(tsz.copy())
                    tracker.target_scale = torch.tensor(ts)
                    tracker.base_target_sz = torch.from_numpy(bts.copy())
                else:
                    # the borderline probe below must see the state the
                    # tracker ACTUALLY localized from
                    pos = tracker.pos.numpy().copy()
                    tsz = tracker.target_sz.numpy().copy()
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])
                confs.append(out.get("confidence", float("nan")))
                flags.append(tracker.debug_info["flag"])
                filters.append(
                    tracker.target_filter.detach().numpy().copy())
                weights.append(tracker.sample_weights[0].numpy().copy())
                repl.append(tracker.previous_replace_ind[0])

                c = cap["coords"][-1][0].astype(np.float64)
                smap = cap["scores"][-1].reshape(
                    cap["scores"][-1].shape[-2:])
                if CFG is CONFIGS["prdimp"]:
                    e = np.exp(smap - smap.max())
                    smap = e / e.sum()
                excused.append(is_borderline(
                    smap, pos, tsz,
                    0.5 * (c[:2] + c[2:] - 1),
                    math.sqrt((c[2] - c[0]) * (c[3] - c[1])
                              / (S_IM * S_IM)),
                    p.target_not_found_threshold))
                # per-frame resync delta: memory updates touch exactly one
                # slot (update_memory, dimp.py:432-445) on update frames
                if tracker.debug_info["flag"] in ("normal",
                                                  "hard_negative"):
                    r = int(tracker.previous_replace_ind[0])
                    resync[t - 1] = {
                        "slot": r,
                        "sample": tracker.training_samples[0][r]
                                         .numpy().copy(),
                        "box": tracker.target_boxes[r].numpy().copy(),
                        "num_stored": int(tracker.num_stored_samples[0]),
                    }
        finally:
            dimp_mod.sample_patch_transformed = orig_spt
            dimp_mod.sample_patch_multiscale = orig_spm

        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in donor.state_dict().items()}
        return sd_np, init, {
            "patches": cap["patches"], "coords": cap["coords"],
            "scores": np.concatenate(cap["scores"], 0),
            "boxes": np.asarray(boxes, np.float64),
            "flags": flags, "filters": filters,
            "weights": np.asarray(weights), "repl": repl,
            "confs": np.asarray(confs),
            "excused": excused, "resync": resync,
        }


def run_ours(sd_np, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_dimp_checkpoint,
                                            convert_prdimp_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.dimp_tracker import (
        FLAG_HARD_NEG,
        FLAG_NORMAL,
        FLAG_NOT_FOUND,
        FLAG_UNCERTAIN,
        DiMPRuntime,
        _localize_advanced,
        _normalize,
        dimp_assemble_init_state,
        dimp_step_from_patch,
    )

    if CFG is CONFIGS["det"]:
        rt = DiMPRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                         num_init_random_boxes=0,
                         target_not_found_threshold=CFG["nf_th"])
        net = DiMPNet(merge_type="max")
        convert = convert_dimp_checkpoint
    else:
        from mmtrack_tpu.models.dimp import build_prdimp50
        from mmtrack_tpu.trackers.dimp_tracker import prdimp50_runtime
        rt = prdimp50_runtime(aug_dropout_num=0, random_shift_factor=0.0,
                              num_init_random_boxes=0,
                              target_not_found_threshold=CFG["nf_th"])
        net = build_prdimp50()
        convert = convert_prdimp_checkpoint

    n_init = init["patches"].shape[0]
    assert rt.num_init_samples == n_init, (rt.num_init_samples, n_init)

    tr = jnp.zeros((1, S_IM, S_IM, CFG["channels"]), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, tr,
                            jnp.zeros((1, 4)), jnp.zeros((1, 1, 4)))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    # ---- init from the reference's own augmented patches
    patches = jnp.asarray(init["patches"].transpose(0, 2, 3, 1))
    norm = _normalize(patches)
    bfeat = net.apply(P, norm, method=DiMPNet.extract_backbone)
    clf_feat = net.apply(P, bfeat, method=DiMPNet.extract_classification_feat)
    ctb = jnp.asarray(init["ctb"], jnp.float32)
    shifts = np.asarray(init["shifts"], np.float32)  # (N, 2) as (y, x)
    boxes = ctb[None] + jnp.asarray(
        np.concatenate([shifts[:, ::-1], np.zeros_like(shifts)], axis=1))
    bfeat0 = {k: v[:1] for k, v in bfeat.items()}

    pos0, tsz0, ts0, bts0 = forcing_values(gt[0])
    state = dimp_assemble_init_state(
        rt, net, P, clf_feat, boxes, bfeat0, ctb,
        jnp.asarray(pos0), jnp.asarray(tsz0), jnp.asarray(ts0),
        jnp.asarray(bts0), jax.random.PRNGKey(0))

    init_filter_dev = float(np.abs(
        np.asarray(state["filter"]).transpose(2, 0, 1)
        - init["filter"][0]).max())
    init_weights_dev = float(np.abs(
        np.asarray(state["sample_weights"]) - init["weights"]).max())

    # mirror of the reference's online memory, updated from its recorded
    # per-frame slot writes (used for the per-transition resync)
    mem_feat = init["samples"].transpose(0, 2, 3, 1).copy()  # (50,18,18,512)
    mem_boxes = init["boxes"].copy()
    num_stored = init["num_stored"]

    # first resync: start frame 0 from the reference's exact post-init state
    state = {**state,
             "filter": jnp.asarray(init["filter"][0].transpose(1, 2, 0)),
             "memory_feat": jnp.asarray(mem_feat),
             "memory_boxes": jnp.asarray(mem_boxes),
             "sample_weights": jnp.asarray(init["weights"]),
             "num_stored": jnp.asarray(num_stored, jnp.int32)}

    step = jax.jit(partial(dimp_step_from_patch, rt, net))
    classify = jax.jit(lambda p, f, cf: net.apply(
        p, f, cf, method=DiMPNet.classify))
    localize = jax.jit(partial(_localize_advanced, rt))

    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_UNCERTAIN: "uncertain", FLAG_HARD_NEG: "hard_negative"}

    out_boxes, out_flags, out_scores = [], [], []
    out_filters, out_weights, out_repl = [], [], []
    for t in range(1, len(frames)):
        pos, tsz, ts, bts = forcing_values(gt[t - 1])
        state = {**state,
                 "pos": jnp.asarray(pos), "target_sz": jnp.asarray(tsz),
                 "target_scale": jnp.asarray(ts),
                 "base_target_sz": jnp.asarray(bts)}
        # geometry exactly as the reference reports it (get_sample_location,
        # dimp.py:179-184) from its own captured patch_coords
        c = ref["coords"][t - 1][0].astype(np.float64)
        sample_pos = (0.5 * (c[:2] + c[2:] - 1)).astype(np.float32)
        sample_scale = np.float32(
            math.sqrt((c[2] - c[0]) * (c[3] - c[1]) / (S_IM * S_IM)))
        patch = jnp.asarray(
            ref["patches"][t - 1][0].transpose(1, 2, 0))  # raw 0..255

        # our production classify + localize on the pre-step filter (the
        # quantities the reference's hooks capture)
        cf = net.apply(P, net.apply(P, _normalize(patch)[None],
                                    method=DiMPNet.extract_backbone),
                       method=DiMPNet.extract_classification_feat)
        smap = classify(P, state["filter"], cf)[0]
        out_scores.append(np.asarray(smap).reshape(-1))
        # the flag probe mirrors the step's preprocessing (PrDiMP
        # localizes on the softmax predictive distribution)
        lmap = smap
        if rt.score_preprocess == "softmax":
            lmap = jax.nn.softmax(smap.reshape(-1)).reshape(smap.shape)
        _, flag, _ = localize(lmap, state, jnp.asarray(sample_pos),
                              jnp.asarray(sample_scale))
        out_flags.append(flag_names[int(flag)])

        state, box, _score = step(
            P, state, patch, jnp.asarray(sample_pos),
            jnp.asarray(sample_scale),
            (float(frames.shape[1]), float(frames.shape[2])))
        out_boxes.append(np.asarray(box, np.float64))
        out_filters.append(np.asarray(state["filter"]).transpose(2, 0, 1))
        out_weights.append(np.asarray(state["sample_weights"]))
        out_repl.append(int(state["prev_replace_ind"]))

        # per-transition resync: adopt the reference's recorded post-frame
        # online state verbatim so the next frame again tests our full
        # step function from an identical starting point
        rs = ref["resync"].get(t - 1)
        if rs is not None:
            mem_feat[rs["slot"]] = rs["sample"].transpose(1, 2, 0)
            mem_boxes[rs["slot"]] = rs["box"]
            num_stored = rs["num_stored"]
        pr = ref["repl"][t - 1]
        state = {
            **state,
            "filter": jnp.asarray(
                ref["filters"][t - 1][0].transpose(1, 2, 0)),
            "memory_feat": jnp.asarray(mem_feat),
            "memory_boxes": jnp.asarray(mem_boxes),
            "sample_weights": jnp.asarray(ref["weights"][t - 1]),
            "num_stored": jnp.asarray(num_stored, jnp.int32),
            "prev_replace_ind": jnp.asarray(
                -1 if pr is None else int(pr), jnp.int32),
        }

    return {
        "init_filter_dev": init_filter_dev,
        "init_weights_dev": init_weights_dev,
        "boxes": np.asarray(out_boxes),
        "flags": out_flags,
        "scores": np.asarray(out_scores),
        "filters": out_filters,
        "weights": np.asarray(out_weights),
        "repl": out_repl,
    }


def run_ours_free(sd_np, frames, gt):
    """Our full DiMPTracker free-running from frame 0: own augmented init
    (ops/augment.py, validated by check_augmentation.py), own sample_patch
    -twin crops, own localization/memory/filter loop — no resync."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmtrack_tpu.models.convert import convert_dimp_checkpoint, load_into
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.dimp_tracker import (
        FLAG_HARD_NEG,
        FLAG_NORMAL,
        FLAG_NOT_FOUND,
        FLAG_UNCERTAIN,
        DiMPRuntime,
        DiMPTracker,
    )

    # classifier-only mode mirrors the reference's p.use_iou_net=False;
    # not-found threshold scaled identically to the reference side
    rt = DiMPRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                     num_init_random_boxes=0, use_iou_net=False,
                     target_not_found_threshold=CFG["nf_th"])
    net = DiMPNet(merge_type="max")

    tr = jnp.zeros((1, S_IM, S_IM, CFG["channels"]), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, tr,
                            jnp.zeros((1, 4)), jnp.zeros((1, 1, 4)))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_dimp_checkpoint(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")

    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_UNCERTAIN: "uncertain", FLAG_HARD_NEG: "hard_negative"}
    tracker = DiMPTracker(net, {"params": params}, rt)
    tracker.initialize(frames[0], {"init_bbox": [float(v) for v in gt[0]]})
    boxes, flags = [], []
    for t in range(1, len(frames)):
        out = tracker.track(frames[t])
        boxes.append(out["target_bbox"])
        flags.append(flag_names[int(tracker.state["last_flag"])])
    return {"boxes": np.asarray(boxes, np.float64), "flags": flags}


TOL_PX_FREE = 1.0  # free-running lockstep tolerance: our init-augmentation
                   # pipeline is numerically (not bit) equal to torch's
                   # (init_filter_dev <= 1e-3 in the forced check), so the
                   # two loops start ~1e-3 apart and drift compounds
                   # through the crop feedback


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=26)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--config", choices=tuple(CONFIGS), default="det")
    ap.add_argument("--freerun", action="store_true",
                    help="overfit the donor classifier, then run BOTH "
                         "loops uninterrupted from frame 0 (no forcing, "
                         "no resync; classifier-only published mode)")
    ap.add_argument("--overfit", type=int, default=300,
                    help="classifier overfit steps for --freerun")
    args = ap.parse_args(argv)

    global CFG, S_IM, SAS
    CFG = CONFIGS[args.config]
    S_IM = CFG["s_im"]
    SAS = CFG["sas"]

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt, dgt = make_sequence(args.frames, args.seed)

    if args.freerun:
        from tools.parity.freerun import box_iou_xywh, compare_freerun

        sd, init, ref = run_reference(frames, gt, args.seed, freerun=True,
                                      overfit_steps=args.overfit,
                                      distractor_gt=dgt)
        ours = run_ours_free(sd, frames, gt)
        n = len(ref["boxes"])
        res = {"family": "det_dimp50_max-freerun",
               **compare_freerun(ref["boxes"], ours["boxes"],
                                 tol_px=TOL_PX_FREE,
                                 ref_events=[(f,) for f in ref["flags"]],
                                 our_events=[(f,) for f in ours["flags"]],
                                 min_horizon=min(n, 40))}
        res["ref_flag_counts"] = {
            f: ref["flags"].count(f) for f in set(ref["flags"])}
        res["mean_gt_iou_ref"] = float(np.mean([
            box_iou_xywh(ref["boxes"][t], gt[t + 1]) for t in range(n)]))
        res["pass"] = bool(res["pass"] and res["mean_gt_iou_ref"] >= 0.5)
        print(json.dumps(res))
        return 0 if res["pass"] else 1

    sd, init, ref = run_reference(frames, gt, args.seed)
    ours = run_ours(sd, init, ref, frames, gt)

    n = len(ref["boxes"])
    excused = {t for t, b in enumerate(ref["excused"]) if b}
    clean = [t for t in range(n) if t not in excused]
    ref_scores = ref["scores"].reshape(n, -1)
    score_dev = np.abs(ref_scores - ours["scores"]).max(axis=1)
    box_dev = np.abs(ref["boxes"] - ours["boxes"]).max(axis=1)
    flag_mismatch = [t for t in clean
                     if ref["flags"][t] != ours["flags"][t]]
    # reference previous_replace_ind is None until the first memory
    # update; ours uses a -1 sentinel for the same state
    ref_repl = [-1 if r is None else int(r) for r in ref["repl"]]
    repl_mismatch = [t for t in clean
                     if ref_repl[t] != ours["repl"][t]]
    filt_dev = max(float(np.abs(ref["filters"][t][0]
                                - ours["filters"][t]).max())
                   for t in clean)
    w_dev = max(float(np.abs(ref["weights"][t] - ours["weights"][t]).max())
                for t in clean)

    hn_events = sum(1 for t in clean if ref["flags"][t] == "hard_negative")
    # train_skipping re-opt fires when (frame_num-1) % 20 == 0 on an
    # update frame; frame_num = t+2 for track index t
    reopt_events = sum(1 for t in clean
                       if (t + 1) % 20 == 0
                       and ref["flags"][t] in ("normal", "hard_negative"))

    if os.environ.get("MMTRACK_TRAJ_DEBUG"):
        for t in range(n):
            print(f"t={t:2d} flag_ref={ref['flags'][t]:13s} "
                  f"flag_ours={ours['flags'][t]:13s} "
                  f"score_dev={score_dev[t]:.2e} box_dev={box_dev[t]:.3f} "
                  f"filt_dev={np.abs(ref['filters'][t][0] - ours['filters'][t]).max():.2e}",
                  file=sys.stderr)

    res = {
        "family": ("det_dimp50_max-trajectory" if CFG is CONFIGS["det"]
                   else "prdimp50-trajectory"),
        "frames_tracked": n,
        "excused_frames": sorted(excused),
        "init_filter_dev": ours["init_filter_dev"],
        "init_weights_dev": ours["init_weights_dev"],
        "max_score_dev": float(score_dev[clean].max()),
        "max_box_dev_px": float(box_dev[clean].max()),
        "mean_box_dev_px": float(box_dev[clean].mean()),
        "flag_mismatches": flag_mismatch,
        "replace_ind_mismatches": repl_mismatch,
        "max_filter_dev": filt_dev,
        "max_weights_dev": w_dev,
        "hard_negative_events": hn_events,
        "filter_reopt_events": reopt_events,
        "conf_range": [float(ref["confs"].min()), float(ref["confs"].max())],
        "ref_flags": ref["flags"],
        "pass": bool(len(excused) <= 0.3 * n
                     and ours["init_filter_dev"] <= TOL_INIT_FILTER
                     and score_dev[clean].max() <= TOL_SCORES
                     and box_dev[clean].max() <= TOL_PX
                     and not flag_mismatch and not repl_mismatch
                     and filt_dev <= TOL_FILTER and w_dev <= TOL_WEIGHTS
                     and hn_events >= 1 and reopt_events >= 1),
        "tol": {"scores": TOL_SCORES, "px": TOL_PX, "filter": TOL_FILTER,
                "weights": TOL_WEIGHTS, "init_filter": TOL_INIT_FILTER},
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
