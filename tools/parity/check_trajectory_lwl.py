"""Trajectory-level A/B: the reference's own LWL segmentation loop vs ours.

check_lwl.py proves full-network forward parity on converted weights.
This check closes the L3-runtime channel for LWL: it runs the reference's
ACTUAL tracker — keep_track_vot2021/pytracking/tracker/lwl/lwl.py::LWL on
a real steepest_descent_resnet50 — side by side with mmtrack_tpu's
lwl_track_step on the same synthetic sequence and the same converted
weights, covering the full per-frame machinery:

  - the previous-frame target-model update: mask crop of the previous
    full-image probabilities, memory write, GN re-optimization schedule,
  - seg->box 'var' estimation with the min_mask_area gate and clipped
    scale change,
  - crop -> backbone -> target-model features -> few-shot filter ->
    decoder,
  - convert_scores_crop_to_image (our inverse-map gather vs the
    reference's dynamic interpolate-then-paste),
  - masks_to_bboxes output box.

Both loops consume the SAME crops (the reference's sample_patch outputs,
captured by hooks) and our online state — filter, memory (features +
mask crops), weights, previous-frame wire (full-image probabilities,
features, search-region pos/scale) — is resynchronized from the
reference's recorded post-frame state after every frame, so each frame
tests the complete step from an identical starting point.

The reference ships no LWL parameter file; the TrackerParams here are
LWLRuntime's documented constants. Init uses the box->rectangle-mask
fallback on BOTH sides (the reference's box_label_encoder variant is a
separate net).

By default the donor's DECODER is first overfit on tracking-geometry
crops of the synthetic sequence (tools/parity/overfit_donors.py) so both
sides produce real (non-empty) masks: the seg->box 'var' estimation, the
min_mask_area gate, and the mask-driven memory update then run on a
SEGMENTING network instead of comparing the round-3 constant-fallback
boxes. Non-degeneracy of the reference's own output is asserted, and the
binary pasted masks are compared directly. --overfit 0 restores the
random-weight mode.

Run: python tools/parity/check_trajectory_lwl.py [--frames 10] [--overfit N]
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

TOL_SEG_CROP = 1e-4   # (S, S) decoder scores per transition
TOL_SEG_IM = 5e-3     # pasted full-image scores (bilinear-vs-gather at
                      # the paste border accumulates a few e-4; interior
                      # matches the crop tolerance)
TOL_PX = 1.0          # output box: integer mask bbox, so only threshold
                      # crossings can differ; require exact-ish agreement
TOL_FILTER = 1e-4

S_IM = 480
S_F = 30

CFG = dict(filter_size=3, num_filters=16, optim_iter=5, optim_init_reg=0.01,
           out_feature_dim=512, clf_feat_blocks=0, final_conv=True,
           label_encoder_dims=(16, 32, 64), use_bn_in_label_enc=True)


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    return np.ascontiguousarray(frames[..., :3]), gt


def rect_mask(gt_box, H, W):
    x, y, w, h = gt_box
    m = np.zeros((H, W), np.float32)
    iy, ix = np.mgrid[0:H, 0:W]
    m[((iy >= y) & (iy < y + h)) & ((ix >= x) & (ix < x + w))] = 1.0
    return m


def run_reference(frames, gt, seed: int = 0, overfit_steps: int = 0):
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

        lwl_net_mod = importlib.import_module("ltr.models.lwl.lwl_net")
        lwl_mod = importlib.import_module("pytracking.tracker.lwl.lwl")
        params_mod = importlib.import_module("pytracking.utils.params")
        nw_mod = importlib.import_module("pytracking.features.net_wrappers")

        torch.manual_seed(seed)
        donor = lwl_net_mod.steepest_descent_resnet50(
            backbone_pretrained=False, **CFG)
        donor.eval()

        # torch>=2 compat: F.pad rejects float pad amounts (the reference's
        # sample_patch passes integral tensor floats) — cast, no math change
        import torch.nn.functional as TF
        real_pad = TF.pad

        def compat_pad(input, pad, *a, **k):
            return real_pad(input, tuple(int(v) for v in pad), *a, **k)

        TF.pad = compat_pad

        # torch>=2 TensorList compat (GNSteepestDescent double-grad)
        real_grad = torch.autograd.grad

        def compat_grad(outputs, inputs, grad_outputs=None, **kw):
            def fix(a):
                return list(a) if isinstance(a, list) else a
            return real_grad(fix(outputs), fix(inputs), fix(grad_outputs),
                             **kw)

        torch.autograd.grad = compat_grad

        if overfit_steps:
            from tools.parity.overfit_donors import overfit_lwl_decoder

            bce = overfit_lwl_decoder(donor, frames, gt, steps=overfit_steps,
                                      S=S_IM, search_area_scale=6.0,
                                      net_opt_iter=20)
            print(f"overfit lwl decoder ({overfit_steps} steps): "
                  f"final bce {bce:.4f}", file=sys.stderr)

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
        p.search_area_scale = 6.0
        p.sample_memory_size = 32
        p.learning_rate = 0.1
        p.init_samples_minimum_weight = 0.25
        p.train_skipping = 1
        p.net_opt_iter = 20
        p.net_opt_update_iter = 3
        p.seg_to_bb_mode = "var"
        p.min_mask_area = 100
        p.seg_to_bb_sz_factor = 4
        p.max_scale_change = (0.95, 1.1)
        p.update_target_model = True
        p.patch_max_scale_change = None  # .get() without default (lwl.py:133)
        p.net = InMemoryNet(donor)

        tracker = lwl_mod.LWL(p)

        cap = {"patches": [], "coords": [], "seg_crop": []}

        orig_spm = lwl_mod.sample_patch_multiscale

        def hook_spm(im, pos, scales, sz, mode="replicate",
                     max_scale_change=None):
            patches, coords = orig_spm(im, pos, scales, sz, mode=mode,
                                       max_scale_change=max_scale_change)
            cap["patches"].append(patches.detach().numpy().copy())
            cap["coords"].append(coords.detach().numpy().copy())
            return patches, coords

        lwl_mod.sample_patch_multiscale = hook_spm
        try:
            H, W = frames.shape[1:3]
            init_mask = rect_mask(gt[0], H, W)
            out0 = tracker.initialize(
                frames[0], {"init_bbox": [float(v) for v in gt[0]],
                            "init_mask": init_mask})

            orig_seg = tracker.segment_target

            def hook_seg(tm_feat, bfeat):
                s = orig_seg(tm_feat, bfeat)
                cap["seg_crop"].append(s.detach().numpy().copy())
                return s

            tracker.segment_target = hook_seg

            init = {
                "filter": tracker.target_filter.detach().numpy().copy(),
                "samples": tracker.training_samples[0].numpy().copy(),
                "masks": tracker.target_masks.numpy().copy(),
                "weights": tracker.sample_weights[0].numpy().copy(),
                "num_stored": int(tracker.num_stored_samples[0]),
                "seg_raw": out0["segmentation_raw"].copy(),
                "pos": tracker.pos.numpy().copy(),
                "target_sz": tracker.target_sz.numpy().copy(),
                "target_scale": float(tracker.target_scale),
                "base_target_sz": tracker.base_target_sz.numpy().copy(),
            }

            prev_out = {"segmentation_raw": init["seg_raw"]}
            boxes, seg_im, masks, filters, weights = [], [], [], [], []
            num_stored, prev_wire, mem_after = [], [], []
            for t in range(1, len(frames)):
                out = tracker.track(frames[t],
                                    {"previous_output": prev_out})
                prev_out = {"segmentation_raw": out["segmentation_raw"]}
                boxes.append(out["target_bbox"])
                seg_im.append(out["segmentation_raw"].copy())
                masks.append(out["segmentation"].copy())
                filters.append(
                    tracker.target_filter.detach().numpy().copy())
                weights.append(tracker.sample_weights[0].numpy().copy())
                num_stored.append(int(tracker.num_stored_samples[0]))
                prev_wire.append({
                    "feat": tracker.prev_test_x.detach().numpy().copy(),
                    "pos": tracker.prev_pos.numpy().copy(),
                    "scale": float(tracker.prev_scale),
                    "pos_state": tracker.pos.numpy().copy(),
                    "sz_state": tracker.target_sz.numpy().copy(),
                    "scale_state": float(tracker.target_scale),
                })
                mem_after.append({
                    "samples": tracker.training_samples[0].numpy().copy(),
                    "masks": tracker.target_masks.numpy().copy(),
                })
        finally:
            lwl_mod.sample_patch_multiscale = orig_spm

        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in donor.state_dict().items()}
        return sd_np, init, {
            "patches": cap["patches"], "coords": cap["coords"],
            "seg_crop": np.concatenate(cap["seg_crop"], 0),
            "boxes": np.asarray(boxes, np.float64),
            "seg_im": seg_im, "masks": masks, "filters": filters,
            "weights": np.asarray(weights), "num_stored": num_stored,
            "prev_wire": prev_wire, "mem_after": mem_after,
        }


def run_ours(sd_np, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import convert_lwl_checkpoint, load_into
    from mmtrack_tpu.models.lwl import LWLNet
    from mmtrack_tpu.trackers.lwl_tracker import (LWLRuntime,
                                                  lwl_init_state,
                                                  lwl_track_step)

    rt = LWLRuntime()
    net = LWLNet(**CFG)

    tr = jnp.zeros((1, S_IM, S_IM, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: net.init(k, tr, tr, jnp.zeros((1, S_IM, S_IM))),
        jax.random.PRNGKey(0))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(zeros,
                                            convert_lwl_checkpoint(sd_np))
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))
    P = {"params": params}

    H, W = frames.shape[1:3]
    init_mask = rect_mask(gt[0], H, W)
    state = jax.jit(partial(lwl_init_state, rt, net))(
        P, jnp.asarray(frames[0]), jnp.asarray(np.asarray(gt[0], np.float32)),
        jnp.asarray(init_mask))

    init_filter_dev = float(np.abs(
        np.asarray(state["filter"])
        - init["filter"][0].transpose(0, 2, 3, 1)).max())

    # resync post-init: reference wire + memory verbatim
    state = {**state,
             "filter": jnp.asarray(init["filter"][0].transpose(0, 2, 3, 1)),
             "memory_feat": jnp.asarray(
                 init["samples"].transpose(0, 2, 3, 1)),
             "memory_masks": jnp.asarray(init["masks"][:, 0]),
             "sample_weights": jnp.asarray(init["weights"]),
             "num_stored": jnp.asarray(init["num_stored"], jnp.int32),
             "seg_prob_im": jnp.asarray(init["seg_raw"]),
             "pos": jnp.asarray(init["pos"]),
             "target_sz": jnp.asarray(init["target_sz"]),
             "target_scale": jnp.asarray(init["target_scale"], jnp.float32),
             "base_target_sz": jnp.asarray(init["base_target_sz"])}

    step = jax.jit(partial(lwl_track_step, rt, net))
    out = {"boxes": [], "seg_im": [], "masks": [], "filters": []}
    for t in range(1, len(frames)):
        state, box, mask_im, _ = step(P, state, jnp.asarray(frames[t]))
        out["boxes"].append(np.asarray(box, np.float64))
        out["seg_im"].append(np.asarray(state["seg_prob_im"]))
        out["masks"].append(np.asarray(mask_im))
        out["filters"].append(np.asarray(state["filter"]))

        # resync from the reference's post-frame state
        w = ref["prev_wire"][t - 1]
        m = ref["mem_after"][t - 1]
        # single-object wire carries PROBABILITIES (lwl.py:194-196);
        # our state stores the same quantity
        seg_raw = ref["seg_im"][t - 1]
        state = {
            **state,
            "filter": jnp.asarray(
                ref["filters"][t - 1][0].transpose(0, 2, 3, 1)),
            "memory_feat": jnp.asarray(m["samples"].transpose(0, 2, 3, 1)),
            "memory_masks": jnp.asarray(m["masks"][:, 0]),
            "sample_weights": jnp.asarray(ref["weights"][t - 1]),
            "num_stored": jnp.asarray(ref["num_stored"][t - 1], jnp.int32),
            "seg_prob_im": jnp.asarray(seg_raw),
            "prev_feat": jnp.asarray(w["feat"][0].transpose(1, 2, 0)),
            "prev_pos": jnp.asarray(w["pos"]),
            "prev_scale": jnp.asarray(w["scale"], jnp.float32),
            "pos": jnp.asarray(w["pos_state"]),
            "target_sz": jnp.asarray(w["sz_state"]),
            "target_scale": jnp.asarray(w["scale_state"], jnp.float32),
        }

    return {"init_filter_dev": init_filter_dev,
            "boxes": np.asarray(out["boxes"]),
            "seg_im": out["seg_im"], "masks": out["masks"],
            "filters": out["filters"]}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--overfit", type=int, default=150,
                    help="decoder overfit steps (0 = round-3 random-weight "
                         "degenerate-mask mode)")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt = make_sequence(args.frames, args.seed)
    sd, init, ref = run_reference(frames, gt, args.seed,
                                  overfit_steps=args.overfit)
    ours = run_ours(sd, init, ref, frames, gt)

    n = len(ref["boxes"])
    seg_dev = np.asarray([
        np.abs(ours["seg_im"][t] - ref["seg_im"][t]).max()
        for t in range(n)])
    # with a SEGMENTING donor the probability field saturates to 0/1 and
    # any sub-pixel sampling difference between our inverse-map gather and
    # the reference's interpolate-then-paste flips border pixels by O(1) —
    # max-abs is the wrong field metric there; the mean tracks the real
    # agreement and the binary-mismatch fraction counts exactly those
    # border pixels
    seg_dev_mean = np.asarray([
        np.abs(ours["seg_im"][t] - ref["seg_im"][t]).mean()
        for t in range(n)])
    box_dev = np.abs(ref["boxes"] - ours["boxes"]).max(axis=1)
    filt_dev = np.asarray([
        np.abs(ours["filters"][t]
               - ref["filters"][t][0].transpose(0, 2, 3, 1)).max()
        for t in range(n)])

    # binary pasted-mask agreement: with an overfit (segmenting) donor the
    # 0-threshold of the logit field sits far from ambiguity almost
    # everywhere; report the worst per-frame fraction of differing pixels
    mask_mismatch = np.asarray([
        float((np.asarray(ours["masks"][t]) != ref["masks"][t]).mean())
        for t in range(n)])

    # non-degeneracy: the reference's own masks must clear the
    # min_mask_area gate (100 px, params above) and its boxes must move —
    # otherwise box agreement is the round-3 constant-fallback comparison
    mask_areas = np.asarray([float(ref["masks"][t].sum()) for t in range(n)])
    boxes_move = bool(np.abs(np.diff(ref["boxes"], axis=0)).max() > 0.5)
    nondegenerate = bool(mask_areas.min() > 100.0 and boxes_move)

    if args.overfit == 0:
        seg_ok = float(seg_dev.max()) <= TOL_SEG_IM
        extra_ok = True
    else:
        # the mean field deviation IS the border-mismatch population in
        # disguise (mismatch_frac x O(1) saturated flips), so both gates
        # carry the same 2e-3 bound
        seg_ok = float(seg_dev_mean.max()) <= 2e-3
        extra_ok = (nondegenerate
                    and float(mask_mismatch.max()) <= 2e-3)
    ok = (seg_ok and extra_ok
          and float(box_dev.max()) <= TOL_PX
          and float(filt_dev.max()) <= TOL_FILTER)
    print(json.dumps({
        "ok": ok,
        "frames": n,
        "overfit_steps": args.overfit,
        "nondegenerate": nondegenerate,
        "ref_mask_area_min": float(mask_areas.min()),
        "ref_mask_area_mean": float(mask_areas.mean()),
        "max_mask_mismatch_frac": float(mask_mismatch.max()),
        "init_filter_dev": ours["init_filter_dev"],
        "max_seg_im_dev": float(seg_dev.max()),
        "mean_seg_im_dev": float(seg_dev_mean.max()),
        "max_box_dev": float(box_dev.max()),
        "max_filter_dev": float(filt_dev.max()),
        "boxes_ref_last": list(ref["boxes"][-1]),
        "boxes_ours_last": list(ours["boxes"][-1]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
