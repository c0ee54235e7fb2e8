"""Trajectory-level A/B: the reference's own STM loop vs ours.

check_stm.py proves module-level parity (encoders, memory read, decoder,
soft-aggregation). This closes STM's L3-runtime channel: it runs the
fork's ACTUAL tracker — keep_track_vot2021/pytracking/tracker/stm/
stm.py::STM on the vendored net (random weights; no checkpoint exists or
can be fetched here) — side by side with mmtrack_tpu's
stm_step_from_patch on the same crops, per-transition:

  - the attention bank actually used each frame (the reference's
    this_keys = cat(committed, prev) captured from its own model call)
    is loaded verbatim into our static ring + prev slot — attention is
    order-invariant over positions, so set-equality of the bank is the
    correct equivalence,
  - we compare the CROP-level object probability (pre-paste), the new
    prev key/value produced by memorizing the prediction, the pasted
    binary mask and the output box,
  - our pre-frame state (pos/target_sz/target_scale) resyncs from the
    reference's so both sides cut identical crops.

The fork ships no STM parameter file; the TrackerParams mirror
STMRuntime's documented constants.

By default the donor's DECODER is first overfit on tracking-geometry
crops of the synthetic sequence (tools/parity/overfit_donors.py) so both
sides produce real masks: the md_hack seg->box path and the pasted
binary mask are then exercised on a segmenting network and compared
directly (binary mask mismatch fraction), and box agreement is earned
rather than a comparison of constant fallbacks. Non-degeneracy of the
reference's own output is asserted. --overfit 0 restores the round-3
random-weight probability-field check.

Run: python tools/parity/check_trajectory_stm.py [--frames 8] [--overfit N]
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
    reference_available,
    reference_path,
)

TOL_PROB = 1e-4     # crop-level object probability per transition
TOL_KV = 1e-4       # memorized prev key/value
TOL_PX = 0.5        # output box (integer mask bbox edges)

S_IM = 384


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    return np.ascontiguousarray(frames[..., :3]), gt


def rect_mask(gt_box, H, W):
    x, y, w, h = [int(v) for v in gt_box]
    m = np.zeros((H, W), np.float32)
    m[y:y + h, x:x + w] = 1.0
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
        stm_model = importlib.import_module("pytracking.tracker.stm.model")
        stm_mod = importlib.import_module("pytracking.tracker.stm.stm")
        params_mod = importlib.import_module("pytracking.utils.params")

        # torch>=2 compat: F.pad rejects float pad amounts (sample_patch's
        # is_mask path passes integral tensor floats) — cast, no math change
        import torch.nn.functional as TF
        real_pad = TF.pad

        def compat_pad(input, pad, *a, **k):
            return real_pad(input, tuple(int(v) for v in pad), *a, **k)

        TF.pad = compat_pad

        torch.manual_seed(seed)
        net = stm_model.STM()
        net.eval()

        if overfit_steps:
            from tools.parity.overfit_donors import overfit_stm_decoder

            bce = overfit_stm_decoder(net, frames, gt, steps=overfit_steps,
                                      S=S_IM, search_area_scale=5.0)
            print(f"overfit stm decoder ({overfit_steps} steps): "
                  f"final bce {bce:.4f}", file=sys.stderr)

        cap = {"patches": [], "coords": [], "prob": [], "bank_k": [],
               "bank_v": [], "prev_k": [], "prev_v": []}

        class Recorder(torch.nn.Module):
            """Wraps the net like the tracker's self.model and records the
            per-frame segment/memorize traffic."""

            def __init__(self, inner):
                super().__init__()
                self.inner = inner

            def forward(self, *args):
                out = self.inner(*args)
                if args[1].dim() > 4:      # segment(frame, keys, values, n)
                    cap["bank_k"].append(args[1].detach().numpy().copy())
                    cap["bank_v"].append(args[2].detach().numpy().copy())
                    prob = torch.softmax(out, dim=1)[0, 1]
                    cap["prob"].append(prob.detach().numpy().copy())
                elif args[1].dim() == 4 and args[1].shape[1] == 2:
                    # memorize(frame, soft masks, n) during tracking
                    k, v = out
                    cap["prev_k"].append(k.detach().numpy().copy())
                    cap["prev_v"].append(v.detach().numpy().copy())
                return out

        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.device = "cpu"
        p.image_sample_size = S_IM
        p.search_area_scale = 5.0
        p.max_mem_sz = 20
        p.memory_skip_rate = 5
        p.seg_to_bb_mode = "md_hack"

        tracker = stm_mod.STM(p)
        tracker.model = Recorder(net)
        tracker.features_initialized = True

        orig_spt = stm_mod.sample_patch_transformed

        def hook_spt(im, pos, scale, image_sz, transforms, is_mask=False):
            out = orig_spt(im, pos, scale, image_sz, transforms,
                           is_mask=is_mask)
            cap.setdefault("init_crops", []).append(
                out.detach().numpy().copy())
            return out

        stm_mod.sample_patch_transformed = hook_spt

        orig_spm = stm_mod.sample_patch_multiscale

        def hook_spm(im, pos, scales, sz, mode="replicate",
                     max_scale_change=None):
            patches, coords = orig_spm(im, pos, scales, sz, mode=mode,
                                       max_scale_change=max_scale_change)
            cap["patches"].append(patches.detach().numpy().copy())
            cap["coords"].append(coords.detach().numpy().copy())
            return patches, coords

        stm_mod.sample_patch_multiscale = hook_spm
        try:
            H, W = frames.shape[1:3]
            init_mask = rect_mask(gt[0], H, W)
            tracker.initialize(frames[0],
                               {"init_bbox": [float(v) for v in gt[0]],
                                "init_mask": init_mask})
            init = {
                "prev_key": tracker.prev_key.detach().numpy().copy(),
                "prev_value": tracker.prev_value.detach().numpy().copy(),
                "pos": tracker.pos.numpy().copy(),
                "target_sz": tracker.target_sz.numpy().copy(),
                "target_scale": float(tracker.target_scale),
                "base_target_sz": tracker.base_target_sz.numpy().copy(),
            }

            pre, boxes, masks = [], [], []
            for t in range(1, len(frames)):
                pre.append({
                    "pos": tracker.pos.numpy().copy(),
                    "target_sz": tracker.target_sz.numpy().copy(),
                    "target_scale": float(tracker.target_scale),
                })
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])
                masks.append(out["segmentation"].copy())
        finally:
            stm_mod.sample_patch_multiscale = orig_spm
            stm_mod.sample_patch_transformed = orig_spt

        sd = {k: v.detach().cpu().numpy()
              for k, v in net.state_dict().items()}
        # the Recorder also saw the INIT memorize (inside initialize);
        # tracked-frame memorize entries start at index 1
        cap["prev_k"] = cap["prev_k"][1:]
        cap["prev_v"] = cap["prev_v"][1:]
        return sd, init, {
            "patches": cap["patches"], "coords": cap["coords"],
            "prob": cap["prob"], "bank_k": cap["bank_k"],
            "bank_v": cap["bank_v"], "prev_k": cap["prev_k"],
            "prev_v": cap["prev_v"],
            "boxes": np.asarray(boxes, np.float64),
            "masks": masks, "pre": pre,
            "init_frame_crop": cap["init_crops"][0],
            "init_mask_crop": cap["init_crops"][1],
        }


def run_ours(sd, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import convert_stm_checkpoint, load_into
    from mmtrack_tpu.models.stm import build_stm
    from mmtrack_tpu.trackers.stm_tracker import (STMRuntime, _paste_prob,
                                                  stm_init_state,
                                                  stm_step_from_patch)

    rt = STMRuntime()
    net = build_stm()

    zeros = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, S_IM, S_IM, 3)), jnp.zeros((1, S_IM, S_IM))))(
        jax.random.PRNGKey(0))
    converted = convert_stm_checkpoint(sd)
    params, missing, unexpected = load_into(zeros["params"], converted)
    bad = [k for k in missing if "layer4" not in ".".join(k)]
    if bad or unexpected:
        raise AssertionError((bad[:6], unexpected[:6]))
    P = {"params": params}

    H, W = frames.shape[1:3]
    init_mask = rect_mask(gt[0], H, W)
    state = jax.jit(partial(stm_init_state, rt, net))(
        P, jnp.asarray(frames[0]),
        jnp.asarray(np.asarray(gt[0], np.float32)), jnp.asarray(init_mask))

    # init metric on the reference's OWN init crops (frame already /255,
    # mask via its is_mask nearest path); Pad_memory layout
    # (1, K, C, 1, h, w): object slot 1
    ic = jnp.asarray(ref["init_frame_crop"].transpose(0, 2, 3, 1))
    im_crop = jnp.asarray(ref["init_mask_crop"][0])  # (1, S, S)
    ik, iv = net.apply(P, ic, im_crop, method="memorize")
    init_kv_dev = max(
        float(np.abs(np.asarray(ik[0])
                     - init["prev_key"][0, 1, :, 0].transpose(1, 2, 0)).max()),
        float(np.abs(np.asarray(iv[0])
                     - init["prev_value"][0, 1, :, 0].transpose(1, 2, 0)).max()))

    H_im, W_im = int(frames.shape[1]), int(frames.shape[2])
    step = jax.jit(lambda Pp, st, patch, sp, ss: stm_step_from_patch(
        rt, net, Pp, st, patch, sp, ss, (H_im, W_im)))
    T = rt.mem_slots
    hF = rt.feat_sz
    out = {"prob": [], "prob_im": [], "boxes": [], "masks": [],
           "prev_k": [], "prev_v": []}
    for t in range(1, len(frames)):
        pr = ref["pre"][t - 1]
        # reference bank actually used this frame: (1, K, C, Tb, h, w)
        bk = ref["bank_k"][t - 1][0, 1].transpose(1, 2, 3, 0)  # (Tb,h,w,kd)
        bv = ref["bank_v"][t - 1][0, 1].transpose(1, 2, 3, 0)
        Tb = bk.shape[0]
        mem_k = np.zeros((T, hF, hF, net.keydim), np.float32)
        mem_v = np.zeros((T, hF, hF, net.valdim), np.float32)
        valid = np.zeros((T,), np.float32)
        mem_k[:Tb - 1] = bk[:-1]
        mem_v[:Tb - 1] = bv[:-1]
        valid[:Tb - 1] = 1.0
        state = {
            **state,
            "pos": jnp.asarray(pr["pos"]),
            "target_sz": jnp.asarray(pr["target_sz"]),
            "target_scale": jnp.asarray(pr["target_scale"], jnp.float32),
            "base_target_sz": jnp.asarray(init["base_target_sz"]),
            "mem_keys": jnp.asarray(mem_k),
            "mem_vals": jnp.asarray(mem_v),
            "mem_valid": jnp.asarray(valid),
            "mem_ptr": jnp.asarray(max(Tb - 1, 1), jnp.int32),
            "prev_key": jnp.asarray(bk[-1]),
            "prev_val": jnp.asarray(bv[-1]),
        }
        c = ref["coords"][t - 1][0].astype(np.float64)
        sample_pos = (0.5 * (c[:2] + c[2:] - 1)).astype(np.float32)
        sample_scale = np.float32(np.sqrt(
            (c[2] - c[0]) * (c[3] - c[1]) / (S_IM * S_IM)))
        patch = jnp.asarray(
            ref["patches"][t - 1][0].transpose(1, 2, 0))  # already /255

        state, box, mask_im, _ = step(
            P, state, patch, jnp.asarray(sample_pos),
            jnp.asarray(sample_scale))
        # crop-level probability: recompute via the model on the same bank
        prob = net.apply(P, patch[None],
                         jnp.asarray(np.concatenate([mem_k[:Tb - 1],
                                                     bk[-1:]], 0)),
                         jnp.asarray(np.concatenate([mem_v[:Tb - 1],
                                                     bv[-1:]], 0)),
                         jnp.ones((Tb,)), method="segment")
        out["prob"].append(np.asarray(prob))
        out["prob_im"].append(np.asarray(_paste_prob(
            rt, prob, jnp.asarray(sample_pos), jnp.asarray(sample_scale),
            (frames.shape[1], frames.shape[2]))))
        out["boxes"].append(np.asarray(box, np.float64))
        out["masks"].append(np.asarray(mask_im))
        out["prev_k"].append(np.asarray(state["prev_key"]))
        out["prev_v"].append(np.asarray(state["prev_val"]))

    return {"init_kv_dev": init_kv_dev, **out}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--overfit", type=int, default=240,
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
    prob_dev = np.asarray([np.abs(ours["prob"][t] - ref["prob"][t]).max()
                           for t in range(n)])
    kv_dev = np.asarray([
        max(np.abs(ours["prev_k"][t]
                   - ref["prev_k"][t][0, 1, :, 0].transpose(1, 2, 0)).max(),
            np.abs(ours["prev_v"][t]
                   - ref["prev_v"][t][0, 1, :, 0].transpose(1, 2, 0)).max())
        for t in range(n)])
    box_dev = np.abs(ref["boxes"] - np.asarray(ours["boxes"])).max(axis=1)
    # paste comparison: recompute the reference's pasted probability with
    # its exact algorithm (F.interpolate(scale_factor) + int() paste,
    # convert_mask_crop_to_im) from ITS captured crop prob, and compare
    # the fields; the binary mask is a pure 0.5-threshold of this (with
    # random weights broad regions sit at p ~ 0.5, so comparing binaries
    # is noise)
    import torch
    import torch.nn.functional as F

    paste_dev = []
    H, W = frames.shape[1:3]
    for t in range(n):
        c = ref["coords"][t][0].astype(np.float64)
        sp = 0.5 * (c[:2] + c[2:] - 1)
        sc = float(np.sqrt((c[2] - c[0]) * (c[3] - c[1]) / (S_IM * S_IM)))
        re = F.interpolate(torch.tensor(ref["prob"][t])[None, None],
                           scale_factor=sc, mode="bilinear")[0, 0].numpy()
        pim = np.zeros((H, W), np.float32)
        r1 = int(sp[0] - 0.5 * re.shape[0])
        c1 = int(sp[1] - 0.5 * re.shape[1])
        r2, c2 = r1 + re.shape[0], c1 + re.shape[1]
        r1p, c1p = max(0, -r1), max(0, -c1)
        r2p, c2p = max(r2 - H, 0), max(c2 - W, 0)
        pim[r1 + r1p:r2 - r2p, c1 + c1p:c2 - c2p] =             re[r1p:re.shape[0] - r2p, c1p:re.shape[1] - c2p]
        paste_dev.append(np.abs(ours["prob_im"][t] - pim).max())
    paste_dev = np.asarray(paste_dev)

    # binary pasted-mask agreement: with an overfit (segmenting) donor the
    # 0.5-threshold masks are far from the threshold almost everywhere, so
    # comparing binaries is meaningful; report the worst per-frame fraction
    # of differing pixels
    mask_mismatch = np.asarray([
        float((np.asarray(ours["masks"][t]) != ref["masks"][t]).mean())
        for t in range(n)])

    # non-degeneracy: the reference's own masks must be real (non-empty)
    # and its boxes must move — otherwise box agreement is the round-3
    # constant-fallback comparison
    mask_areas = np.asarray([float(ref["masks"][t].sum()) for t in range(n)])
    boxes_move = bool(np.abs(np.diff(ref["boxes"], axis=0)).max() > 0.5)
    nondegenerate = bool(mask_areas.min() > 100.0 and boxes_move)

    ok = (float(prob_dev.max()) <= TOL_PROB
          and float(kv_dev.max()) <= TOL_KV
          and float(box_dev.max()) <= TOL_PX
          and float(paste_dev.max()) <= 1e-3
          and (args.overfit == 0
               or (nondegenerate and float(mask_mismatch.max()) <= 2e-3)))
    print(json.dumps({
        "ok": ok, "frames": n,
        "overfit_steps": args.overfit,
        "nondegenerate": nondegenerate,
        "ref_mask_area_min": float(mask_areas.min()),
        "ref_mask_area_mean": float(mask_areas.mean()),
        "max_mask_mismatch_frac": float(mask_mismatch.max()),
        "init_kv_dev": ours["init_kv_dev"],
        "max_prob_dev": float(prob_dev.max()),
        "max_prev_kv_dev": float(kv_dev.max()),
        "max_box_dev": float(box_dev.max()),
        "max_pasted_prob_dev": float(paste_dev.max()),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
