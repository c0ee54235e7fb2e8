"""Trajectory-level A/B: the reference's own KYS online loop vs ours.

check_kys.py proves forward parity of the ResponsePredictor on converted
weights. This check closes the L3-runtime channel for the KYS family: it
runs the reference's ACTUAL tracker — keep_track_vot2021/pytracking/
tracker/kys/dimp_motion.py::KYS on the real kysnet_res50 (cost volume
executing through the spatial_correlation_sampler shim, which is pinned
against our matmul cost volume to 4e-6) — side by side with
mmtrack_tpu's kys_step_from_patch on the same synthetic sequence and the
same converted weights, covering the full per-frame machinery:

  - DiMP classification trimmed to the 18x18 motion grid,
  - previous-frame alignment (center-shift / sub-pixel branches),
  - the half-pixel fix_coordinate_shift in/out of the predictor,
  - cost volume + scene propagation + ConvGRU state update,
  - fused-score localization with the DiMP-peak offset fallback and
    DiMP-score hard-negative mining,
  - IoUNet refinement + memory + filter re-optimization (shared with the
    already-passing DiMP trajectory check).

Like check_trajectory_dimp, both loops are teacher-forced from ground
truth and consume the SAME crops (the reference's sample_patch outputs,
captured by hooks); after every frame our online state — DiMP filter,
memory, weights AND the motion state (feature map, GRU state, label,
box_patch) — is resynchronized from the reference's recorded post-frame
state, so every frame tests the complete step function from an identical
starting point. RNG-dependent pieces are disabled identically (no
dropout augmentation, no random shifts, no random IoUNet init boxes).
Frames where the reference's own localization sits within float noise of
a decision boundary (fused peak near-tie, the |fused-dimp| == 1 offset
rule, hard-negative thresholds) are excused the FLAG comparison only.

The reference ships no KYS parameter file; the TrackerParams here are
KYSRuntime's documented constants.

Run: python tools/parity/check_trajectory_kys.py [--frames 16]
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

TOL_DIMP = 1e-5      # 18x18 dimp score map per transition
TOL_FUSED = 1e-4     # fused response (through cost volume + predictor)
TOL_GRU = 1e-4       # post-frame GRU state
TOL_PX = 0.05        # output box agreement per transition

S_IM = 288
S_F = 18
EPS = 1e-5


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    return np.ascontiguousarray(frames[..., :3]), gt


def forcing_values(gt_box):
    x, y, w, h = [np.float32(v) for v in gt_box]
    pos = np.asarray([y + (h - 1) / 2, x + (w - 1) / 2], np.float32)
    target_sz = np.asarray([h, w], np.float32)
    search_area = np.float32(np.float32(h * np.float32(5.0))
                             * np.float32(w * np.float32(5.0)))
    target_scale = np.float32(math.sqrt(float(search_area)) / S_IM)
    base_target_sz = (target_sz / target_scale).astype(np.float32)
    return pos, target_sz, target_scale, base_target_sz


def is_borderline(fused, dimp_win, dimp_raw, target_sz, sample_scale):
    """Reference-side decision margins (localize_target +
    perform_hn_mining_dimp, dimp_motion.py:323-409) within float noise."""
    f = np.asarray(fused, np.float64)
    mx = float(f.max())
    if abs(mx - 0.05) < EPS:            # target_not_found_threshold_fused
        return True
    flat = np.sort(f.reshape(-1))
    if flat[-1] - flat[-2] < EPS:       # fused argmax near-tie
        return True
    iy, ix = np.unravel_index(int(f.argmax()), f.shape)
    dy, dx = np.unravel_index(int(np.asarray(dimp_win).argmax()),
                              dimp_win.shape)
    # the |fused - dimp| peak-offset rule is exact integer equality on 1
    d = max(abs(iy - dy), abs(ix - dx))
    if d in (1, 2) and (np.sort(np.asarray(dimp_win).reshape(-1))[-1]
                        - np.sort(np.asarray(dimp_win).reshape(-1))[-2]
                        < EPS):
        return True
    # hard-negative margins on the raw dimp score
    neigh = 2.2 * (math.sqrt(float(np.prod(target_sz))) / sample_scale) \
        * (S_F / S_IM)
    use_iy, use_ix = (dy, dx) if d == 1 else (iy, ix)
    top = max(round(use_iy - neigh / 2), 0)
    bottom = min(round(use_iy + neigh / 2 + 1), S_F)
    left = max(round(use_ix - neigh / 2), 0)
    right = min(round(use_ix + neigh / 2 + 1), S_F)
    masked = np.asarray(dimp_raw, np.float64).copy()
    masked[top:bottom, left:right] = 0
    max2 = float(masked.max())
    at = float(np.asarray(dimp_raw)[use_iy, use_ix])
    if abs(max2 - 0.5 * at) < EPS or abs(max2 - 0.1) < EPS:
        return True
    return False


def run_reference(frames, gt, seed: int = 0):
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

        kysnet_mod = importlib.import_module("ltr.models.tracking.kysnet")
        kys_mod = importlib.import_module("pytracking.tracker.kys.dimp_motion")
        params_mod = importlib.import_module("pytracking.utils.params")
        nw_mod = importlib.import_module("pytracking.features.net_wrappers")

        torch.manual_seed(seed)
        donor = kysnet_mod.kysnet_res50(
            filter_size=4, optim_iter=10, backbone_pretrained=False,
            appearance_feature_dim=512, train_feature_extractor=False)
        donor.eval()

        class InMemoryNet(nw_mod.NetWithBackbone):
            def __init__(self, net):
                super().__init__(net_path="<in-memory>", use_gpu=False)
                self.net = net

            def initialize(self):
                self.net.eval()

        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.image_sample_size = S_IM
        p.search_area_scale = 5
        p.sample_memory_size = 50
        p.learning_rate = 0.01
        p.init_samples_minimum_weight = 0.25
        p.train_skipping = 20
        p.update_classifier = True
        p.net_opt_iter = 10
        p.net_opt_update_iter = 2
        p.net_opt_hn_iter = 1
        p.use_augmentation = True
        p.augmentation = {"fliplr": True,
                          "rotate": [10, -10, 45, -45],
                          "blur": [(3, 1), (1, 3), (2, 2)],
                          "relativeshift": [(0.6, 0.6), (-0.6, 0.6),
                                            (0.6, -0.6), (-0.6, -0.6)]}
        p.augmentation_expansion_factor = 2
        p.random_shift_factor = 0
        # KYS motion/localization constants == KYSRuntime defaults
        p.score_downsample_factor = 1
        p.output_sigma_factor = 0.25
        p.target_not_found_threshold_fused = 0.05
        p.dimp_threshold = 0.05
        p.remove_offset_in_fused_score = True
        p.perform_hn_mining_dimp = True
        p.target_neighborhood_scale_safe = 2.2
        p.hard_negative_threshold = 0.5
        p.move_feat_to_center = True
        p.prev_feat_remove_subpixel_shift = True
        p.reset_state_during_occlusion = True
        p.apply_window_to_dimp_score = True
        p.window_output = True
        p.hard_negative_learning_rate = 0.02
        p.update_scale_when_uncertain = True
        p.iounet_augmentation = False
        p.iounet_use_log_scale = True
        p.iounet_k = 3
        p.num_init_random_boxes = 0
        p.box_jitter_pos = 0.1
        p.box_jitter_sz = 0.5
        p.maximal_aspect_ratio = 6
        p.box_refinement_iter = 5
        p.box_refinement_step_length = 1
        p.box_refinement_step_decay = 1
        p.net = InMemoryNet(donor)

        tracker = kys_mod.KYS(p)

        cap = {"init_patches": None, "patches": [], "coords": [],
               "dimp": [], "fused": []}

        orig_spt = kys_mod.sample_patch_transformed

        def hook_spt(im, pos, scale, image_sz, transforms, is_mask=False):
            out = orig_spt(im, pos, scale, image_sz, transforms,
                           is_mask=is_mask)
            cap["init_patches"] = out.detach().numpy().copy()
            return out

        orig_spm = kys_mod.sample_patch_multiscale

        def hook_spm(im, pos, scales, sz, mode="replicate",
                     max_scale_change=None):
            patches, coords = orig_spm(im, pos, scales, sz, mode=mode,
                                       max_scale_change=max_scale_change)
            cap["patches"].append(patches.detach().numpy().copy())
            cap["coords"].append(coords.detach().numpy().copy())
            return patches, coords

        kys_mod.sample_patch_transformed = hook_spt
        kys_mod.sample_patch_multiscale = hook_spm
        try:
            tracker.initialize(
                frames[0], {"init_bbox": [float(v) for v in gt[0]]})

            orig_cls = tracker.classify_target

            def hook_cls(x):
                s = orig_cls(x)
                cap["dimp"].append(s.detach().numpy().copy())
                return s

            tracker.classify_target = hook_cls

            orig_grp = tracker.get_response_prediction

            def hook_grp(backbone_feat, scores_dimp):
                am, mf, st = orig_grp(backbone_feat, scores_dimp)
                cap["fused"].append(am.detach().numpy().copy())
                return am, mf, st

            tracker.get_response_prediction = hook_grp

            def motion_snapshot():
                d = tracker.prev_state_handler.info_dict
                st = d["state"]
                # state_cur is a plain (1, d, h, w) tensor for the
                # canonical ResponsePredictor (resp_predictor.py:563)
                return {
                    "feat": d["feat"].detach().numpy().copy(),
                    "gru": (None if st is None
                            else st.detach().numpy().copy()),
                    "label": d["label"].detach().numpy().copy(),
                    "bb_patch": d["bb_patch"].detach().numpy().copy(),
                }

            init = {
                "patches": cap["init_patches"],
                "shifts": [list(T.shift) for T in tracker.transforms],
                "ctb": tracker.classifier_target_box.numpy().copy(),
                "filter": tracker.target_filter.detach().numpy().copy(),
                "weights": tracker.sample_weights[0].numpy().copy(),
                "samples": tracker.training_samples[0].numpy().copy(),
                "boxes": tracker.target_boxes.numpy().copy(),
                "num_stored": int(tracker.num_stored_samples[0]),
                "motion": motion_snapshot(),
                # the motion-init crop geometry (init_motion_module's own
                # extraction is capture index 0 in patches/coords)
            }

            boxes, flags, gru_after, motion_after = [], [], [], []
            filters, weights, repl, resync = [], [], [], {}
            excused = []
            for t in range(1, len(frames)):
                pos, tsz, ts, bts = forcing_values(gt[t - 1])
                tracker.pos = torch.from_numpy(pos.copy())
                tracker.target_sz = torch.from_numpy(tsz.copy())
                tracker.target_scale = torch.tensor(ts)
                tracker.base_target_sz = torch.from_numpy(bts.copy())
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])
                flags.append(tracker.debug_info["flag"])
                filters.append(tracker.target_filter.detach().numpy().copy())
                weights.append(tracker.sample_weights[0].numpy().copy())
                repl.append(tracker.previous_replace_ind[0])
                motion_after.append(motion_snapshot())

                c = cap["coords"][-1][0].astype(np.float64)
                sample_scale = math.sqrt((c[2] - c[0]) * (c[3] - c[1])
                                         / (S_IM * S_IM))
                dimp_map = cap["dimp"][-1].reshape(S_F, S_F)
                win = tracker.output_window.numpy().reshape(S_F, S_F)
                excused.append(is_borderline(
                    cap["fused"][-1].reshape(S_F, S_F),
                    dimp_map * win, dimp_map, tsz, sample_scale))

                if tracker.debug_info["flag"] != "not_found" \
                        and tracker.previous_replace_ind[0] is not None:
                    r = int(tracker.previous_replace_ind[0])
                    resync[t - 1] = {
                        "slot": r,
                        "sample": tracker.training_samples[0][r]
                                         .numpy().copy(),
                        "box": tracker.target_boxes[r].numpy().copy(),
                        "num_stored": int(tracker.num_stored_samples[0]),
                    }
        finally:
            kys_mod.sample_patch_transformed = orig_spt
            kys_mod.sample_patch_multiscale = orig_spm

        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in donor.state_dict().items()}
        return sd_np, init, {
            "patches": cap["patches"], "coords": cap["coords"],
            "dimp": np.concatenate(cap["dimp"], 0),
            "fused": np.concatenate(cap["fused"], 0),
            "boxes": np.asarray(boxes, np.float64),
            "flags": flags, "filters": filters,
            "weights": np.asarray(weights), "repl": repl,
            "motion_after": motion_after,
            "excused": excused, "resync": resync,
        }


def run_ours(sd_np, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import convert_kys_checkpoint, load_into
    from mmtrack_tpu.models.kys import build_kysnet
    from mmtrack_tpu.trackers.dimp_tracker import (_normalize,
                                                   dimp_assemble_init_state)
    from mmtrack_tpu.trackers.kys_tracker import (FLAG_HARD_NEG, FLAG_NORMAL,
                                                  FLAG_NOT_FOUND, KYSRuntime,
                                                  kys_step_from_patch)

    rt = KYSRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                    num_init_random_boxes=0)
    net = build_kysnet()

    n_init = init["patches"].shape[0]
    assert rt.num_init_samples == n_init, (rt.num_init_samples, n_init)

    tr = jnp.zeros((1, S_IM, S_IM, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: net.init(k, tr, tr, jnp.zeros((1, 4)),
                           jnp.zeros((1, 1, 4)), method="init_forward"),
        jax.random.PRNGKey(0))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(zeros,
                                            convert_kys_checkpoint(sd_np))
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))
    P = {"params": params}

    # ---- init from the reference's own augmented patches
    patches = jnp.asarray(init["patches"].transpose(0, 2, 3, 1))
    norm = _normalize(patches)
    bfeat = net.apply(P, norm, method="extract_backbone")
    clf_feat = net.apply(P, bfeat, method="extract_classification_feat")
    ctb = jnp.asarray(init["ctb"], jnp.float32)
    shifts = np.asarray(init["shifts"], np.float32)
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

    # motion init from the reference's recorded post-init motion state
    m0 = init["motion"]
    init_label_dev = None
    state.update({
        "motion_feat": jnp.asarray(m0["feat"][0].transpose(1, 2, 0)),
        "gru_state": jnp.zeros((S_F, S_F, net.state_dim), jnp.float32),
        "gru_valid": jnp.asarray(False),
        "prev_label": jnp.asarray(m0["label"].reshape(S_F, S_F)),
        "prev_box_patch": jnp.asarray(m0["bb_patch"], jnp.float32),
        "last_fused": jnp.zeros((S_F, S_F), jnp.float32),
    })

    mem_feat = init["samples"].transpose(0, 2, 3, 1).copy()
    mem_boxes = init["boxes"].copy()
    num_stored = init["num_stored"]
    state = {**state,
             "filter": jnp.asarray(init["filter"][0].transpose(1, 2, 0)),
             "memory_feat": jnp.asarray(mem_feat),
             "memory_boxes": jnp.asarray(mem_boxes),
             "sample_weights": jnp.asarray(init["weights"]),
             "num_stored": jnp.asarray(num_stored, jnp.int32)}

    step = jax.jit(partial(kys_step_from_patch, rt, net))
    flag_names = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
                  FLAG_HARD_NEG: "hard_negative"}

    out = {"boxes": [], "flags": [], "dimp": [], "fused": [], "gru": []}
    for t in range(1, len(frames)):
        pos, tsz, ts, bts = forcing_values(gt[t - 1])
        state = {**state,
                 "pos": jnp.asarray(pos), "target_sz": jnp.asarray(tsz),
                 "target_scale": jnp.asarray(ts),
                 "base_target_sz": jnp.asarray(bts)}
        c = ref["coords"][t - 1 + 1][0].astype(np.float64)  # +1: motion-init
        sample_pos = (0.5 * (c[:2] + c[2:] - 1)).astype(np.float32)
        sample_scale = np.float32(
            math.sqrt((c[2] - c[0]) * (c[3] - c[1]) / (S_IM * S_IM)))
        patch = jnp.asarray(
            ref["patches"][t - 1 + 1][0].transpose(1, 2, 0))

        state, box, _score = step(
            P, state, patch, jnp.asarray(sample_pos),
            jnp.asarray(sample_scale),
            (float(frames.shape[1]), float(frames.shape[2])))
        out["boxes"].append(np.asarray(box, np.float64))
        out["flags"].append(flag_names[int(state["last_flag"])])
        out["dimp"].append(np.asarray(state["last_dimp"]))
        out["fused"].append(np.asarray(state["last_fused"]))
        out["gru"].append(np.asarray(state["gru_state"]))

        # ---- resync from the reference's recorded post-frame state
        rs = ref["resync"].get(t - 1)
        if rs is not None:
            mem_feat[rs["slot"]] = rs["sample"].transpose(1, 2, 0)
            mem_boxes[rs["slot"]] = rs["box"]
            num_stored = rs["num_stored"]
        pr = ref["repl"][t - 1]
        ma = ref["motion_after"][t - 1]
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
            "motion_feat": jnp.asarray(ma["feat"][0].transpose(1, 2, 0)),
            "gru_state": (state["gru_state"] if ma["gru"] is None else
                          jnp.asarray(ma["gru"][0].transpose(1, 2, 0))),
            "gru_valid": jnp.asarray(ma["gru"] is not None),
            "prev_label": jnp.asarray(ma["label"].reshape(S_F, S_F)),
            "prev_box_patch": jnp.asarray(ma["bb_patch"], jnp.float32),
        }

    return {"init_filter_dev": init_filter_dev, **{
        k: np.asarray(v) if k != "flags" else v for k, v in out.items()}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
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

    dimp_ref = ref["dimp"].reshape(n, -1)
    dimp_dev = np.abs(dimp_ref - ours["dimp"].reshape(n, -1)).max(axis=1)
    fused_ref = ref["fused"].reshape(n, -1)
    fused_dev = np.abs(fused_ref - ours["fused"].reshape(n, -1)).max(axis=1)
    box_dev = np.abs(ref["boxes"] - ours["boxes"]).max(axis=1)
    gru_dev = np.asarray([
        np.abs(ours["gru"][t]
               - ref["motion_after"][t]["gru"][0].transpose(1, 2, 0)).max()
        if ref["motion_after"][t]["gru"] is not None else 0.0
        for t in range(n)])
    flag_mismatch = [t for t in clean
                     if ref["flags"][t] != ours["flags"][t]]

    ok = (float(dimp_dev.max()) <= TOL_DIMP
          and float(fused_dev.max()) <= TOL_FUSED
          and float(gru_dev.max()) <= TOL_GRU
          and not flag_mismatch
          and float(box_dev[clean].max()) <= TOL_PX)
    print(json.dumps({
        "ok": ok,
        "frames": n,
        "init_filter_dev": ours["init_filter_dev"],
        "max_dimp_dev": float(dimp_dev.max()),
        "max_fused_dev": float(fused_dev.max()),
        "max_gru_dev": float(gru_dev.max()),
        "max_box_dev_clean": float(box_dev[clean].max()),
        "flags_ref": ref["flags"],
        "flags_ours": ours["flags"],
        "flag_mismatches": flag_mismatch,
        "excused_frames": sorted(excused),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
