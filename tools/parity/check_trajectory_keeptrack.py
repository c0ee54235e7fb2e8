"""Trajectory-level A/B: the reference's own KeepTrack loop vs ours.

check_super_dimp.py proves forward parity of the base network and
check_peak_matching.py proves forward parity of the descriptor extractor +
SuperGlue matcher on converted weights. This check closes the L3-runtime
channel for the KeepTrack family: it runs the reference's ACTUAL tracker —
keep_track_vot2021/pytracking/tracker/keep_track/keep_track.py::KeepTrack
on a real dimpnet50_hinge + peak_matching_net donor pair at the release.py
configuration — side by side with mmtrack_tpu's keeptrack_step_from_patch
on the same synthetic sequence and the same converted weights, covering
the full per-frame machinery:

  - the three-way localization state machine (low-score fallback /
    match-memory gap re-init / peak matching, keep_track.py:946-1040),
  - peak extraction order + descriptor/keypoint computation in image
    coordinates (:1178-1203),
  - the learned matcher call with matches1 consumption and the 1-v-1
    single-peak skip (:971-997),
  - PeakCollection identity bookkeeping under the release flags
    (drop_low_assignment_prob, disable_chronological_...=True, :251-364),
  - flag-gated certainty-weighted memory updates incl. the permanent
    sub-threshold certainty zeroing (:1371-1496 + 1689-1697),
  - occlusion search-area regrowth (:538-548, compared through the
    post-frame target_scale on lost frames),
  - IoUNet refinement in the PrDiMP relative space (shared with the
    passing DiMP/super-dimp checks).

Like check_trajectory_dimp, both loops are teacher-forced from ground
truth and consume the SAME crops (the reference's sample_patch outputs,
captured by hooks); after every frame our online state — filter, memory,
certainties, weights, peak collection, match memory, scale ring — is
resynchronized from the reference's recorded post-frame state, so every
frame tests the complete step function from an identical starting point.
RNG-dependent pieces are disabled identically (no dropout augmentation,
no random shifts, no random IoUNet init boxes). Frames where the
reference's own decisions sit within float noise of a threshold (peak
extraction near the 0.05 gate or near-tied ordering, match probability
near the 0.2/0.6/0.85 gates, redetect near 0.25, certainty near
0.5/0.75, jump near-tie, advanced-localization margins on fallback
frames) are excused from the discrete comparisons only.

Run: python tools/parity/check_trajectory_keeptrack.py [--frames 16]
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

TOL_PX = 0.05         # output box agreement per transition
TOL_CERT = 1e-4       # post-frame certainty memory
TOL_SCALE = 1e-5      # post-frame target_scale (occlusion regrowth path)
TOL_PRESENCE = 1e-4   # object_presence_score
TOL_INIT_FILTER = 1e-3
EPS = 5e-4            # decision-margin excusal epsilon (matcher noise ~1e-4)

S_IM = 480
S_SCORE = 31
K = 8


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    # identical-appearance crossing distractor ENTERING at frame 4: unseen
    # by the init-time GN filter (which would otherwise train it away), it
    # pops mid-sequence as a fresh strong peak — the multi-peak identity
    # regime the peak matcher exists for
    # box0 moved off-center so the mirrored distractor start is ~230 px
    # away (the default box0 puts the two squares overlapping)
    frames, gt, dgt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                              width=320, seed=seed,
                                              box0=(40.0, 40.0, 48.0, 36.0),
                                              distractor=True,
                                              distractor_start_frame=4,
                                              return_distractor_gt=True)
    return np.ascontiguousarray(frames[..., :3]), gt, dgt


def forcing_values(gt_box):
    x, y, w, h = [np.float32(v) for v in gt_box]
    pos = np.asarray([y + (h - 1) / 2, x + (w - 1) / 2], np.float32)
    target_sz = np.asarray([h, w], np.float32)
    search_area = np.float32(np.float32(h * np.float32(8.0))
                             * np.float32(w * np.float32(8.0)))
    target_scale = np.float32(math.sqrt(float(search_area)) / S_IM)
    base_target_sz = (target_sz / target_scale).astype(np.float32)
    return pos, target_sz, target_scale, base_target_sz


def adv_borderline(score_map, pos, target_sz, sample_pos, sample_scale):
    """Advanced-localization decision margins (localize_advanced,
    keep_track.py analog of dimp.py:239-304) within float noise — only
    relevant on fallback frames."""
    S = score_map.shape[0]
    output_sz = float(S - 1)
    center = (S - 1) / 2.0
    f = np.asarray(score_map, np.float64)
    max1 = float(f.max())
    if abs(max1 - 0.25) < EPS:
        return True
    if max1 < 0.25:
        return False
    iy, ix = np.unravel_index(int(f.argmax()), f.shape)
    neigh = 2.2 * (np.asarray(target_sz, np.float64) / sample_scale) \
        * (output_sz / S_IM)
    top = max(round(float(iy) - neigh[0] / 2), 0)
    bottom = min(round(float(iy) + neigh[0] / 2 + 1), S)
    left = max(round(float(ix) - neigh[1] / 2), 0)
    right = min(round(float(ix) + neigh[1] / 2 + 1), S)
    masked = np.array(f, copy=True)
    masked[top:bottom, left:right] = 0
    max2 = float(masked.max())
    if max1 - max2 < EPS or abs(max2 - 0.8 * max1) < EPS \
            or abs(max2 - 0.5 * max1) < EPS or abs(max2 - 0.25) < EPS:
        return True
    jy, jx = np.unravel_index(int(masked.argmax()), masked.shape)
    scale_fac = (S_IM / output_sz) * float(sample_scale)
    prev_vec = (np.asarray(pos, np.float64)
                - np.asarray(sample_pos, np.float64)) / scale_fac
    d1 = np.asarray([iy, ix], np.float64) - center
    d2 = np.asarray([jy, jx], np.float64) - center
    disp_th = 0.8 * math.sqrt(S * S) / 2
    for dn in (float(np.sqrt(((d1 - prev_vec) ** 2).sum())),
               float(np.sqrt(((d2 - prev_vec) ** 2).sum()))):
        if abs(dn - disp_th) < 1e-3:
            return True
    return False


def match_borderline(cap_t):
    """Peak/matching decision margins on a matching-path frame."""
    sc = np.asarray(cap_t["peak_scores"], np.float64)
    if sc.size > K:
        return True
    srt = np.sort(sc)
    if sc.size > 1 and np.min(np.diff(srt)) < EPS:
        return True                       # peak ordering near-tie
    if np.any(np.abs(sc - 0.05) < EPS):
        return True                       # extraction gate
    if np.any(np.abs(sc - 0.25) < EPS):   # redetect gate
        return True
    if np.any(np.abs(sc - 0.5) < EPS):    # 1-v-1 speedup gate
        return True
    mp = cap_t.get("match_probs")
    if mp is not None:
        mp = np.asarray(mp, np.float64)
        for th in (0.2, 0.6, 0.85):
            if np.any(np.abs(mp - th) < EPS):
                return True
        if np.any(np.abs(sc - 0.2) < EPS):   # drop low-score clause
            return True
    return False


def run_reference(frames, gt, seed: int = 0, overfit: bool = True,
                  distractor_gt=None, freerun: bool = False):
    """freerun=True: published classifier-only mode (use_iou_net=False —
    random IoUNet weights would random-walk the scale) and NO per-frame
    forcing: the loop runs uninterrupted from frame 0."""
    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/keep_track_vot2021"):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        dimpnet = importlib.import_module("ltr.models.tracking.dimpnet")
        pm_mod = importlib.import_module(
            "ltr.models.memory_learning.peak_matching")
        kt_mod = importlib.import_module(
            "pytracking.tracker.keep_track.keep_track")
        params_mod = importlib.import_module("pytracking.utils.params")
        nw_mod = importlib.import_module("pytracking.features.net_wrappers")

        # torch>=2 rejects list subclasses (TensorList) in autograd.grad
        real_grad = torch.autograd.grad

        def compat_grad(outputs, inputs, grad_outputs=None, **kw):
            def fix(a):
                return list(a) if isinstance(a, list) else a
            return real_grad(fix(outputs), fix(inputs), fix(grad_outputs),
                             **kw)

        torch.autograd.grad = compat_grad

        torch.manual_seed(seed)
        donor = dimpnet.dimpnet50_hinge(
            filter_size=4, optim_iter=10, backbone_pretrained=False,
            out_feature_dim=512, hinge_threshold=0.05, score_act="relu")
        donor.eval()
        torch.manual_seed(seed + 1)
        pmnet = pm_mod.peak_matching_net(backbone_pretrained=False)
        pmnet.eval()

        if overfit:
            from tools.parity.overfit_donors import (
                overfit_super_dimp_classifier)
            mse = overfit_super_dimp_classifier(donor, frames, gt,
                                                seed=seed,
                                                distractor_gt=distractor_gt)
            print(f"donor classifier overfit: final mse {mse:.5f}",
                  file=sys.stderr)

        class InMemoryNet(nw_mod.NetWithBackbone):
            def __init__(self, net):
                super().__init__(net_path="<in-memory>", use_gpu=False)
                self.net = net

            def initialize(self):
                self.net.eval()

        class InMemoryWrapper(nw_mod.NetWrapper):
            def __init__(self, net):
                super().__init__(net_path="<in-memory>", use_gpu=False)
                self.net = net

            def initialize(self):
                self.net.eval()

        # release.py:12-88 with RNG-dependent pieces disabled identically
        # on both sides (no dropout augmentation, no random shifts, no
        # random IoUNet boxes)
        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.image_sample_size = S_IM
        p.search_area_scale = 8
        p.border_mode = "inside_major"
        p.patch_max_scale_change = 1.5
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
        p.target_not_found_threshold = 0.25
        p.distractor_threshold = 0.8
        p.hard_negative_threshold = 0.5
        p.target_neighborhood_scale = 2.2
        p.dispalcement_scale = 0.8
        p.hard_negative_learning_rate = 0.02
        p.update_scale_when_uncertain = True
        p.box_refinement_space = "relative"
        p.iounet_augmentation = False
        p.iounet_k = 3
        p.num_init_random_boxes = 0
        p.box_jitter_pos = 0.1
        p.box_jitter_sz = 0.5
        p.maximal_aspect_ratio = 6
        p.box_refinement_iter = 10
        p.box_refinement_step_length = 2.5e-3
        p.box_refinement_step_decay = 1
        p.use_gt_box = False
        p.target_label_certainty_type = "max_score_map"
        p.use_certainty_for_weight_computation = True
        p.enable_search_area_rescaling_at_occlusion = True
        p.enable_peak_localization_by_matching = True
        p.disable_chronological_occlusion_redetection_logic = True
        p.skip_running_matching_network_for_single_peak_cases = True
        p.id0_weight_increase = True
        if freerun:
            p.use_iou_net = False
        p.net = InMemoryNet(donor)
        p.peak_match_net = InMemoryWrapper(pmnet)

        tracker = kt_mod.KeepTrack(p)

        cap = {"init_patches": None, "patches": [], "coords": [], "ex": {}}

        orig_spt = kt_mod.sample_patch_transformed

        def hook_spt(im, pos, scale, image_sz, transforms, is_mask=False):
            out = orig_spt(im, pos, scale, image_sz, transforms,
                           is_mask=is_mask)
            cap["init_patches"] = out.detach().numpy().copy()
            return out

        orig_spm = kt_mod.sample_patch_multiscale

        def hook_spm(im, pos, scales, sz, mode="replicate",
                     max_scale_change=None):
            patches, coords = orig_spm(im, pos, scales, sz, mode=mode,
                                       max_scale_change=max_scale_change)
            cap["patches"].append(patches.detach().numpy().copy())
            cap["coords"].append(coords.detach().numpy().copy())
            return patches, coords

        orig_update = kt_mod.PeakCollection.update
        match_caps = []

        def hook_update(self, peak_scores, peak_ts_coords, matches,
                        match_scores, frame_num):
            match_caps.append({
                "matches": matches.view(-1).detach().numpy().copy(),
                "probs": match_scores.view(-1).detach().numpy().copy(),
            })
            return orig_update(self, peak_scores, peak_ts_coords, matches,
                               match_scores, frame_num)

        kt_mod.sample_patch_transformed = hook_spt
        kt_mod.sample_patch_multiscale = hook_spm
        kt_mod.PeakCollection.update = hook_update

        def coll_snapshot(tr):
            c = tr.peak_collection
            if c is None:
                return None
            return {
                "ids": {int(pid): int(pk.object_id)
                        for pid, pk in c.d.items()},
                "best": {int(pid): float(max(pk.peak_scores))
                         for pid, pk in c.d.items()},
                "selected": int(c.selected_object_id),
                "cntr": int(c.object_id_cntr),
                "occl": int(c.object_id_cntr_state_at_occlusion),
                "occl_certain":
                    int(c.object_id_cntr_state_when_certain_object_occlusion),
                "certain": bool(c.peak_selection_is_certain),
                "flag_nf": c.flag == "not_found",
                "sel_peak": (-1 if c.peak_id_of_selected_object is None
                             else int(c.peak_id_of_selected_object)),
            }

        try:
            tracker.initialize(
                frames[0], {"init_bbox": [float(v) for v in gt[0]]})

            orig_ex = tracker.extract_descriptors_and_keypoints

            def hook_ex(backbone_feat, score_map, search_area_box):
                d, kp, ks, pc = orig_ex(backbone_feat, score_map,
                                        search_area_box)
                cap["ex"][tracker.frame_num] = {
                    "desc": d.detach().numpy().copy(),
                    "kpts": kp.detach().numpy().copy(),
                    "peak_scores": ks.detach().numpy().copy(),
                    "coords": pc.detach().numpy().copy(),
                }
                return d, kp, ks, pc

            tracker.extract_descriptors_and_keypoints = hook_ex

            orig_xm = tracker.extract_matches
            xm_calls = [0]

            def hook_xm(*a, **kw):
                xm_calls[0] += 1
                return orig_xm(*a, **kw)

            tracker.extract_matches = hook_xm

            orig_cls = tracker.classify_target
            score_caps = []

            def hook_cls(x):
                out = orig_cls(x)
                score_caps.append(
                    out[0].detach().numpy().reshape(S_SCORE, S_SCORE).copy())
                return out

            tracker.classify_target = hook_cls

            n_init = cap["init_patches"].shape[0]
            init = {
                "patches": cap["init_patches"],
                "ctb": tracker.classifier_target_box.numpy().copy(),
                "labels": tracker.target_labels[0][:n_init, 0]
                                 .numpy().copy(),
                "filter": tracker.target_filter.detach().numpy().copy(),
                "weights": tracker.sample_weights[0].numpy().copy(),
                "certainties": tracker.target_label_certainties
                                      .view(-1).numpy().copy(),
                "boxes": tracker.target_boxes[:n_init].numpy().copy(),
                "num_stored": int(tracker.num_stored_samples[0]),
            }

            per_frame = []
            for t in range(1, len(frames)):
                if not freerun:
                    pos, tsz, ts, bts = forcing_values(gt[t - 1])
                    tracker.pos = torch.from_numpy(pos.copy())
                    tracker.target_sz = torch.from_numpy(tsz.copy())
                    tracker.target_scale = torch.tensor(ts)
                    tracker.base_target_sz = torch.from_numpy(bts.copy())
                n_match_before = len(match_caps)
                n_ex_before = len(cap["ex"])
                n_xm_before = xm_calls[0]
                out = tracker.track(frames[t])

                mm = tracker.match_mem
                mem_frame = (None if mm.is_empty
                             else int(mm.get_frameid(-1)))
                r = tracker.previous_replace_ind[0]
                rec = {
                    "box": [float(v) for v in out["target_bbox"]],
                    "presence": float(out["object_presence_score"]),
                    "flag": tracker.debug_info["flag"],
                    "filter": tracker.target_filter.detach().numpy().copy(),
                    "weights": tracker.sample_weights[0].numpy().copy(),
                    "certainties": tracker.target_label_certainties
                                          .view(-1).numpy().copy(),
                    "repl": None if r is None else int(r),
                    "num_stored": int(tracker.num_stored_samples[0]),
                    "target_scale": float(tracker.target_scale),
                    "nf_counter": int(tracker.target_not_found_counter),
                    "n_scales": len(tracker.target_scales),
                    "coll": coll_snapshot(tracker),
                    "mem_frame": mem_frame,
                    "frame_num": int(tracker.frame_num),
                    "coords": cap["coords"][-1][0].astype(np.float64).copy(),
                    "score_map": score_caps[-1],
                    "matched": len(match_caps) > n_match_before,
                    "extracted": len(cap["ex"]) > n_ex_before,
                    "matcher_ran": xm_calls[0] > n_xm_before,
                    "n_peaks": (cap["ex"][int(tracker.frame_num)]
                                ["peak_scores"].shape[0]
                                if len(cap["ex"]) > n_ex_before else 0),
                }
                if rec["matched"]:
                    rec["match"] = match_caps[-1]
                if rec["extracted"]:
                    rec["ex"] = cap["ex"][rec["frame_num"]]
                if rec["repl"] is not None and rec["flag"] not in (
                        "not_found", "uncertain"):
                    rr = rec["repl"]
                    rec["repl_data"] = {
                        "sample": tracker.training_samples[0][rr]
                                         .numpy().copy(),
                        "label": tracker.target_labels[0][rr, 0]
                                        .numpy().copy(),
                        "box": tracker.target_boxes[rr].numpy().copy(),
                    }
                per_frame.append(rec)
        finally:
            kt_mod.sample_patch_transformed = orig_spt
            kt_mod.sample_patch_multiscale = orig_spm
            kt_mod.PeakCollection.update = orig_update

        sd_main = {k: v.detach().cpu().numpy()
                   for k, v in donor.state_dict().items()}
        sd_pm = {}
        sd_pm.update({"descriptor_extractor." + k: v.detach().cpu().numpy()
                      for k, v in pmnet.descriptor_extractor.state_dict()
                      .items()})
        sd_pm.update({"matcher." + k: v.detach().cpu().numpy()
                      for k, v in pmnet.matcher.state_dict().items()})
        return sd_main, sd_pm, init, {
            "patches": cap["patches"], "coords": cap["coords"],
            "frames": per_frame,
        }


def excused_frame(rec, gt_prev):
    """Decision-margin excusal for transition t (reference-side data)."""
    pos, tsz, _, _ = forcing_values(gt_prev)
    f = rec["score_map"]
    if abs(float(f.max()) - 0.05) < EPS:
        return True          # low-gate margin
    if rec["extracted"]:
        ex = {"peak_scores": rec["ex"]["peak_scores"]}
        if rec["matched"]:
            ex["match_probs"] = rec["match"]["probs"]
        if match_borderline(ex):
            return True
        # certainty-raise and jump near-ties need the collection
        c = rec["coll"]
        if c is not None:
            best = np.asarray(list(c["best"].values()), np.float64)
            if best.size and np.any(np.abs(best - 0.75) < EPS):
                return True
            if best.size > 1 and np.min(np.diff(np.sort(best))) < EPS:
                return True
    if not rec["matched"]:
        # fallback frame: advanced-localization margins
        c = rec["coords"]
        sample_pos = 0.5 * (c[:2] + c[2:] - 1)
        sample_scale = math.sqrt((c[2] - c[0]) * (c[3] - c[1])
                                 / (S_IM * S_IM))
        if adv_borderline(f, pos, tsz, sample_pos, sample_scale):
            return True
    cert = float(f.max())
    if abs(cert - 0.5) < EPS:
        return True          # certainty zeroing / hn-gate margin
    return False


def run_ours(sd_main, sd_pm, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_peak_matching_checkpoint,
                                            convert_super_dimp_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.dimp import DiMPNet, build_super_dimp50
    from mmtrack_tpu.models.peak_matching import (DescriptorExtractor,
                                                  PeakMatcher)
    from mmtrack_tpu.trackers.dimp_tracker import (FLAG_HARD_NEG, FLAG_NORMAL,
                                                   FLAG_NOT_FOUND,
                                                   FLAG_UNCERTAIN, _normalize)
    from mmtrack_tpu.trackers.keep_track import init_peak_state
    from mmtrack_tpu.trackers.keeptrack_tracker import (
        KeepTrackRuntime, keeptrack_step_from_patch)

    rt = KeepTrackRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                          num_init_random_boxes=0)
    assert rt.peaks.num_peaks == K
    net = build_super_dimp50()

    n_init = init["patches"].shape[0]
    assert rt.num_init_samples == n_init, (rt.num_init_samples, n_init)

    tr = jnp.zeros((1, S_IM, S_IM, 3), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, tr,
                            jnp.zeros((1, 4)), jnp.zeros((1, 1, 4)))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_super_dimp_checkpoint(sd_main))
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))
    P = {"params": params}

    D = rt.descriptor_dim
    desc_mod = DescriptorExtractor(D)
    matcher = PeakMatcher(descriptor_dim=D, input_dim=D)
    conv = convert_peak_matching_checkpoint(sd_pm)
    dz = desc_mod.init(jax.random.PRNGKey(0),
                       jnp.zeros((rt.feat_sz, rt.feat_sz, rt.desc_feat_dim)),
                       jnp.zeros((K, 2)))
    dp, miss, unexp = load_into(dz["params"], conv["desc"]["params"])
    assert not miss and not unexp, (miss, unexp)
    d0 = jnp.zeros((1, K, D))
    k0 = jnp.zeros((1, K, 2))
    s0 = jnp.zeros((1, K))
    v0 = jnp.ones((1, K), bool)
    mz = matcher.init(jax.random.PRNGKey(0), d0, k0, s0, v0, d0, k0, s0, v0)
    mp_params = dict(mz)
    mp_loaded, miss, unexp = load_into(mz["params"],
                                       conv["matcher"]["params"])
    assert not miss and not unexp, (miss, unexp)
    mp_params["params"] = mp_loaded
    if "batch_stats" in conv["matcher"]:
        bs, miss, unexp = load_into(mz["batch_stats"],
                                    conv["matcher"]["batch_stats"])
        assert not miss and not unexp, (miss, unexp)
        mp_params["batch_stats"] = bs
    matcher_params = {"desc": {**dz, "params": dp}, "matcher": mp_params}
    bundle = (desc_mod, matcher)

    # ---- init from the reference's own augmented patches
    patches = jnp.asarray(init["patches"].transpose(0, 2, 3, 1))
    norm = _normalize(patches)
    bfeat = net.apply(P, norm, method="extract_backbone")
    clf_feat = net.apply(P, bfeat, method="extract_classification_feat")
    bfeat0 = {k: v[:1] for k, v in bfeat.items()}
    ctb = jnp.asarray(init["ctb"], jnp.float32)
    boxes = jnp.asarray(init["boxes"], jnp.float32)
    labels = jnp.asarray(init["labels"], jnp.float32)

    w0 = net.apply(P, clf_feat, boxes, method="get_filter")
    filt = net.apply(P, w0, clf_feat, labels, None, rt.net_opt_iter,
                     method="optimize_filter_hinge")
    init_filter_dev = float(np.abs(
        np.asarray(filt).transpose(2, 0, 1) - init["filter"][0]).max())

    mod3, mod4 = net.apply(
        P, [bfeat0["layer2"], bfeat0["layer3"]], ctb[None],
        method=lambda m, f, b: m.bb_regressor.get_modulation(f, b))

    pos0, tsz0, ts0, bts0 = forcing_values(gt[0])
    sigma_v = float(np.sqrt(np.prod(
        rt.feat_sz / rt.image_sample_size * np.asarray(bts0)))
        * rt.output_sigma_factor)
    M = rt.sample_memory_size
    Sf = rt.feat_sz
    C = clf_feat.shape[-1]
    state = {
        "pos": jnp.asarray(pos0), "target_sz": jnp.asarray(tsz0),
        "target_scale": jnp.asarray(ts0),
        "base_target_sz": jnp.asarray(bts0),
        "sigma": jnp.asarray([sigma_v, sigma_v], jnp.float32),
        "filter": jnp.asarray(init["filter"][0].transpose(1, 2, 0)),
        "memory_feat": jnp.zeros((M, Sf, Sf, C), jnp.float32)
                          .at[:n_init].set(clf_feat),
        "memory_boxes": jnp.zeros((M, 4), jnp.float32).at[:n_init].set(boxes),
        "memory_labels": jnp.zeros((M, S_SCORE, S_SCORE), jnp.float32)
                            .at[:n_init].set(labels),
        "certainties": jnp.asarray(init["certainties"], jnp.float32),
        "sample_weights": jnp.asarray(init["weights"], jnp.float32),
        "num_stored": jnp.asarray(init["num_stored"], jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "iou_mod3": mod3[0], "iou_mod4": mod4[0],
        "rng": jax.random.PRNGKey(0),
        "peaks": init_peak_state(
            rt.peaks, jnp.zeros((K,), jnp.float32),
            jnp.zeros((K, 2), jnp.float32), jnp.zeros((K, 2), jnp.float32),
            jnp.zeros((K,), bool), jnp.zeros((K, D), jnp.float32),
            certain=True),
        "mem_ok": jnp.asarray(False),
        "scale_ring": jnp.zeros((rt.scale_memory,), jnp.float32),
        "ring_count": jnp.asarray(0, jnp.int32),
        "nf_counter": jnp.asarray(0, jnp.int32),
        "last_flag": jnp.asarray(FLAG_NORMAL, jnp.int32),
        "last_use_match": jnp.asarray(False),
    }

    step = jax.jit(partial(keeptrack_step_from_patch, rt, net, bundle),
                   static_argnums=(8,))
    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_UNCERTAIN: "uncertain",
                  FLAG_HARD_NEG: "hard_negative"}

    mem_feat = np.asarray(state["memory_feat"]).copy()
    mem_boxes = np.asarray(state["memory_boxes"]).copy()
    mem_labels = np.asarray(state["memory_labels"]).copy()

    H_im, W_im = float(frames.shape[1]), float(frames.shape[2])
    out = []
    for t in range(1, len(frames)):
        rec = ref["frames"][t - 1]
        pos, tsz, ts, bts = forcing_values(gt[t - 1])
        state = {**state,
                 "pos": jnp.asarray(pos), "target_sz": jnp.asarray(tsz),
                 "target_scale": jnp.asarray(ts),
                 "base_target_sz": jnp.asarray(bts)}
        c = ref["coords"][t - 1][0].astype(np.float64)
        tl = jnp.asarray([np.float32(c[0]), np.float32(c[1])])
        side = jnp.asarray(np.float32(c[2] - c[0]))
        sample_pos = jnp.asarray(
            (0.5 * (c[:2] + c[2:] - 1)).astype(np.float32))
        sample_scale = jnp.asarray(np.float32(
            math.sqrt((c[2] - c[0]) * (c[3] - c[1]) / (S_IM * S_IM))))
        patch = _normalize(jnp.asarray(
            ref["patches"][t - 1][0].transpose(1, 2, 0)))

        state, box, presence = step(P, matcher_params, state, patch, tl,
                                    side, sample_pos, sample_scale,
                                    (H_im, W_im))
        pk = state["peaks"]
        out.append({
            "box": np.asarray(box, np.float64),
            "presence": float(presence),
            "flag": flag_names[int(state["last_flag"])],
            "certainties": np.asarray(state["certainties"]).copy(),
            "target_scale": float(state["target_scale"]),
            "nf_counter": int(state["nf_counter"]),
            "selected": int(pk["selected_object_id"]),
            "cntr": int(pk["object_id_cntr"]),
            "flag_nf": bool(pk["flag_not_found"]),
            "ids": np.asarray(pk["object_ids"]).copy(),
            "valid": np.asarray(pk["peak_valid"]).copy(),
        })

        # ---- resync from the reference's recorded post-frame state
        rd = rec.get("repl_data")
        if rd is not None:
            r = rec["repl"]
            mem_feat[r] = rd["sample"].transpose(1, 2, 0)
            mem_labels[r] = rd["label"]
            mem_boxes[r] = rd["box"]
        coll = rec["coll"]
        if coll is not None and rec["extracted"]:
            ex = rec["ex"]
            n = ex["peak_scores"].shape[0]
            nn = min(n, K)
            scores_r = np.zeros((K,), np.float32)
            scores_r[:nn] = ex["peak_scores"][:nn]
            coords_r = np.zeros((K, 2), np.float32)
            coords_r[:nn] = ex["coords"][:nn]
            kpts_r = np.zeros((K, 2), np.float32)
            kpts_r[:nn] = ex["kpts"][:nn]
            desc_r = np.zeros((K, D), np.float32)
            # torch descriptors are channel-major (1, D, K) — the SuperGlue
            # convention (get_descriptors returns desc.permute(0, 2, 1))
            desc_r[:nn] = ex["desc"][0].transpose(1, 0)[:nn]
            ids_r = np.full((K,), -1, np.int32)
            best_r = np.zeros((K,), np.float32)
            valid_r = np.zeros((K,), bool)
            for pid in range(nn):
                ids_r[pid] = coll["ids"].get(pid, -1)
                best_r[pid] = coll["best"].get(pid, 0.0)
                valid_r[pid] = True
            peaks_sync = {
                "peak_scores": jnp.asarray(scores_r),
                "peak_coords": jnp.asarray(coords_r),
                "peak_kpts": jnp.asarray(kpts_r),
                "peak_valid": jnp.asarray(valid_r),
                "peak_desc": jnp.asarray(desc_r),
                "object_ids": jnp.asarray(ids_r),
                "best_obj_score": jnp.asarray(best_r),
                "selected_object_id": jnp.asarray(coll["selected"],
                                                  jnp.int32),
                "object_id_cntr": jnp.asarray(coll["cntr"], jnp.int32),
                "occlusion_id_state": jnp.asarray(coll["occl"], jnp.int32),
                "occl_certain_state": jnp.asarray(coll["occl_certain"],
                                                  jnp.int32),
                "selection_certain": jnp.asarray(coll["certain"]),
                "flag_not_found": jnp.asarray(coll["flag_nf"]),
            }
        else:
            peaks_sync = state["peaks"]
        state = {
            **state,
            "filter": jnp.asarray(rec["filter"][0].transpose(1, 2, 0)),
            "memory_feat": jnp.asarray(mem_feat),
            "memory_boxes": jnp.asarray(mem_boxes),
            "memory_labels": jnp.asarray(mem_labels),
            "certainties": jnp.asarray(rec["certainties"], jnp.float32),
            "sample_weights": jnp.asarray(rec["weights"], jnp.float32),
            "num_stored": jnp.asarray(rec["num_stored"], jnp.int32),
            "prev_replace_ind": jnp.asarray(
                -1 if rec["repl"] is None else rec["repl"], jnp.int32),
            "peaks": peaks_sync,
            "mem_ok": jnp.asarray(rec["mem_frame"] == rec["frame_num"]),
            "target_scale": jnp.asarray(np.float32(rec["target_scale"])),
            "nf_counter": jnp.asarray(rec["nf_counter"], jnp.int32),
        }

    return init_filter_dev, out


def run_ours_free(sd_main, sd_pm, frames, gt):
    """Our full KeepTrackTracker free-running from frame 0: own augmented
    init, own inside_major crops, own peak extraction/matching/certainty
    machinery — no forcing, no resync. Published classifier-only mode
    (use_iou_net=False) mirroring the reference side."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmtrack_tpu.models.convert import (convert_peak_matching_checkpoint,
                                            convert_super_dimp_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.dimp import build_super_dimp50
    from mmtrack_tpu.models.peak_matching import (DescriptorExtractor,
                                                  PeakMatcher)
    from mmtrack_tpu.trackers.dimp_tracker import (FLAG_HARD_NEG, FLAG_NORMAL,
                                                   FLAG_NOT_FOUND,
                                                   FLAG_UNCERTAIN)
    from mmtrack_tpu.trackers.keeptrack_tracker import (KeepTrackRuntime,
                                                        KeepTrackTracker)

    rt = KeepTrackRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                          num_init_random_boxes=0, use_iou_net=False)
    net = build_super_dimp50()
    D = rt.descriptor_dim

    tr = jnp.zeros((1, S_IM, S_IM, 3), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, tr,
                            jnp.zeros((1, 4)), jnp.zeros((1, 1, 4)))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_super_dimp_checkpoint(sd_main))
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))

    desc_mod = DescriptorExtractor(D)
    matcher = PeakMatcher(descriptor_dim=D, input_dim=D)
    conv = convert_peak_matching_checkpoint(sd_pm)
    dz = desc_mod.init(jax.random.PRNGKey(0),
                       jnp.zeros((rt.feat_sz, rt.feat_sz, rt.desc_feat_dim)),
                       jnp.zeros((K, 2)))
    dp, miss, unexp = load_into(dz["params"], conv["desc"]["params"])
    assert not miss and not unexp, (miss, unexp)
    d0 = jnp.zeros((1, K, D))
    k0 = jnp.zeros((1, K, 2))
    s0 = jnp.zeros((1, K))
    v0 = jnp.ones((1, K), bool)
    mz = matcher.init(jax.random.PRNGKey(0), d0, k0, s0, v0, d0, k0, s0, v0)
    mp_params = dict(mz)
    mp_loaded, miss, unexp = load_into(mz["params"],
                                       conv["matcher"]["params"])
    assert not miss and not unexp, (miss, unexp)
    mp_params["params"] = mp_loaded
    if "batch_stats" in conv["matcher"]:
        bs, miss, unexp = load_into(mz["batch_stats"],
                                    conv["matcher"]["batch_stats"])
        assert not miss and not unexp, (miss, unexp)
        mp_params["batch_stats"] = bs
    matcher_params = {"desc": {**dz, "params": dp}, "matcher": mp_params}

    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_UNCERTAIN: "uncertain", FLAG_HARD_NEG: "hard_negative"}
    tracker = KeepTrackTracker(net, {"params": params}, rt,
                               matcher_params=matcher_params)
    tracker.initialize(frames[0], {"init_bbox": [float(v) for v in gt[0]]})
    boxes, flags, used_match = [], [], []
    for t in range(1, len(frames)):
        out = tracker.track(frames[t])
        boxes.append(out["target_bbox"])
        flags.append(flag_names[int(tracker.state["last_flag"])])
        used_match.append(bool(tracker.state["last_use_match"]))
    return {"boxes": np.asarray(boxes, np.float64), "flags": flags,
            "used_match": used_match}


TOL_PX_FREE = 1.0  # same rationale as check_trajectory_dimp.TOL_PX_FREE


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--freerun", action="store_true",
                    help="run BOTH loops uninterrupted from frame 0 "
                         "(classifier-only published mode, overfit donor)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--donor", choices=("overfit", "random"),
                    default="overfit",
                    help="overfit: classifier head trained so the peak-"
                         "matching path engages (multi-peak regime); "
                         "random: everything seeded random (exercises the "
                         "low-score fallback on every frame)")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt, dgt = make_sequence(args.frames, args.seed)

    if args.freerun:
        from tools.parity.freerun import box_iou_xywh, compare_freerun

        sd_main, sd_pm, init, ref = run_reference(
            frames, gt, args.seed, overfit=args.donor == "overfit",
            distractor_gt=dgt, freerun=True)
        ours = run_ours_free(sd_main, sd_pm, frames, gt)
        ref_boxes = np.asarray([r["box"] for r in ref["frames"]], np.float64)
        n = len(ref_boxes)
        res = {"family": "keeptrack-freerun",
               **compare_freerun(
                   ref_boxes, ours["boxes"], tol_px=TOL_PX_FREE,
                   ref_events=[(r["flag"], bool(r["matched"]))
                               for r in ref["frames"]],
                   our_events=list(zip(ours["flags"], ours["used_match"])),
                   min_horizon=min(n, 40))}
        res["ref_flag_counts"] = {}
        for r in ref["frames"]:
            res["ref_flag_counts"][r["flag"]] = \
                res["ref_flag_counts"].get(r["flag"], 0) + 1
        res["matcher_frames_ref"] = sum(bool(r["matcher_ran"])
                                        for r in ref["frames"])
        res["mean_gt_iou_ref"] = float(np.mean([
            box_iou_xywh(ref_boxes[t], gt[t + 1]) for t in range(n)]))
        if res["lockstep_horizon"] < n:
            res["break_excused"] = bool(excused_frame(
                ref["frames"][res["break_frame"]], gt[res["break_frame"]]))
            res["pass"] = bool(res["lockstep_horizon"] >= 40
                               and not res["event_mismatches"]
                               and res["break_excused"])
        res["pass"] = bool(res["pass"] and res["mean_gt_iou_ref"] >= 0.4)
        print(json.dumps(res))
        return 0 if res["pass"] else 1

    sd_main, sd_pm, init, ref = run_reference(frames, gt, args.seed,
                                              overfit=args.donor == "overfit",
                                              distractor_gt=dgt)
    init_filter_dev, ours = run_ours(sd_main, sd_pm, init, ref, frames, gt)

    n = len(ref["frames"])
    excused = {t for t in range(n)
               if excused_frame(ref["frames"][t], gt[t])}
    clean = [t for t in range(n) if t not in excused]

    box_dev = np.asarray([
        np.abs(np.asarray(ref["frames"][t]["box"]) - ours[t]["box"]).max()
        for t in range(n)])
    cert_dev = np.asarray([
        np.abs(ref["frames"][t]["certainties"]
               - ours[t]["certainties"]).max()
        for t in range(n)])
    scale_dev = np.asarray([
        abs(ref["frames"][t]["target_scale"] - ours[t]["target_scale"])
        for t in range(n)])
    presence_dev = np.asarray([
        0.0 if math.isnan(ref["frames"][t]["presence"])
        else abs(ref["frames"][t]["presence"] - ours[t]["presence"])
        for t in range(n)])
    flag_mismatch = [t for t in clean
                     if ref["frames"][t]["flag"] != ours[t]["flag"]]
    id_mismatch = []
    for t in clean:
        coll = ref["frames"][t]["coll"]
        if coll is None or not ref["frames"][t]["extracted"]:
            continue
        o = ours[t]
        nn = min(len(coll["ids"]), K)
        ids_ok = all(coll["ids"].get(i, -1) == int(o["ids"][i])
                     for i in range(nn))
        if (not ids_ok or coll["selected"] != o["selected"]
                or coll["cntr"] != o["cntr"]
                or coll["flag_nf"] != o["flag_nf"]):
            id_mismatch.append(t)

    cl = clean if clean else [0]
    ok = (init_filter_dev <= TOL_INIT_FILTER
          and float(box_dev[cl].max()) <= TOL_PX
          and float(cert_dev[cl].max()) <= TOL_CERT
          and float(scale_dev[cl].max()) <= TOL_SCALE
          and float(presence_dev[cl].max()) <= TOL_PRESENCE
          and not flag_mismatch and not id_mismatch
          and len(clean) >= max(3, n // 2))
    print(json.dumps({
        "ok": ok,
        "frames": n,
        "init_filter_dev": init_filter_dev,
        "max_box_dev_clean": float(box_dev[cl].max()),
        "max_cert_dev_clean": float(cert_dev[cl].max()),
        "max_scale_dev_clean": float(scale_dev[cl].max()),
        "max_presence_dev_clean": float(presence_dev[cl].max()),
        "flags_ref": [r["flag"] for r in ref["frames"]],
        "flags_ours": [o["flag"] for o in ours],
        "use_match_ref": [bool(r["matched"]) for r in ref["frames"]],
        "matcher_ran_ref": [bool(r.get("matcher_ran")) for r in ref["frames"]],
        "n_peaks_ref": [int(r.get("n_peaks", 0)) for r in ref["frames"]],
        "flag_mismatches": flag_mismatch,
        "id_mismatches": id_mismatch,
        "excused_frames": sorted(excused),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
