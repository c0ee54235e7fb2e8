"""Trajectory-level A/B: the reference's own ViPT tracker loop vs ours.

Forward parity (check_vipt.py) proves the converted weights compute the
same function per call. This check closes the remaining channel: it runs
the reference's ACTUAL L3 runtime — ViPT/lib/test/tracker/vipt.py
ViPTTrack.initialize/track (cv2 sample_target geometry, PreprocessorMM,
hann window, cal_bbox, map_box_back, clip_box) — against mmtrack_tpu's
ViPTTracker on the same synthetic sequence and the same converted
weights, comparing per tracked frame:

  1. the full Hann-windowed response map (the quantity argmax'ed for the
     box) — must agree within forward float tolerance;
  2. the decoded, mapped-back, clipped box — must agree to centipixel.

Both loops are teacher-forced from the ground-truth trajectory: each
frame starts from gt[t-1], so every frame tests the complete step
function (crop geometry, normalize, forward, window, decode, map-back,
clip) from an identical, realistic state. Free-running the RANDOM-weight
model (no checkpoints exist in this environment) walks the box off
target within ~2 frames; the crop then degenerates to near-all padding,
where 200+ of 256 candidate-elimination attention scores become
bit-identical and torch's unstable sort vs our stable argsort keep
different (equally-ranked) token subsets — a tie-break artifact of the
untrained model, not a runtime difference (verified: 221-way exact score
ties at the CE cut on such crops; zero deviation on textured crops).
Frames where the reference's own CE cut falls inside an exact tie group
are therefore detected via a hook on its candidate_elimination and
excluded from the response/box gates; their count is reported and
bounded. Our tracker runs host_preproc=True — the bit-exact cv2 twin of
sample_target (ops/crop.py::sample_target_np) — so crops are
byte-identical; the fused device-crop mode differs from cv2's
fixed-point uint8 resize by <=1 intensity level and is covered by
crop-parity tests instead.

Run: python tools/parity/check_trajectory_vipt.py [--frames 24]
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (  # noqa: E402
    patch_cuda_to_cpu,
    reference_available,
    reference_path,
)

TOL_RESPONSE = 1e-5  # windowed response map on tie-free frames
TOL_PX = 0.02        # box agreement on tie-free frames (f32 map-back)


def run_reference(variant: str, frames: np.ndarray, force_boxes: np.ndarray,
                  seed: int = 0, freerun: bool = False,
                  overfit_steps: int = 0, gt=None):
    """Drive ViPT/lib/test/tracker/vipt.py::ViPTTrack teacher-forced.

    Before each track(frames[t]) the tracker state is reset to
    force_boxes[t-1]. Captures the windowed response map per frame (via
    its own cal_bbox) and flags frames whose candidate-elimination cut
    lands inside an exact attention-score tie group.

    The model is the reference's own build at published scale with seeded
    random weights; ViPTTrack.__init__'s torch.load is routed to the
    in-memory state_dict so the real constructor path (strict load) runs.
    """
    import torch

    patch_cuda_to_cpu()
    with reference_path("ViPT") as root:
        cfg_mod = importlib.import_module("lib.config.vipt.config")
        importlib.reload(cfg_mod)
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", "vipt", f"{variant}.yaml"))
        ostrack_prompt = importlib.import_module(
            "lib.models.vipt.ostrack_prompt")
        params_mod = importlib.import_module("lib.test.utils.params")
        vipt_mod = importlib.import_module("lib.test.tracker.vipt")
        ab = importlib.import_module("lib.models.layers.attn_blocks")

        torch.manual_seed(seed)
        donor = ostrack_prompt.build_viptrack(cfg_mod.cfg, training=False)
        # non-trivial BN running stats in the box head, so the
        # running_mean/var -> FrozenBatchNorm conversion is exercised
        donor.train()
        with torch.no_grad():
            for i in range(2):
                rs = np.random.RandomState(100 + i)
                donor(torch.from_numpy(
                          rs.uniform(-2, 2, (1, 6, 128, 128)).astype(np.float32)),
                      torch.from_numpy(
                          rs.uniform(-2, 2, (1, 6, 256, 256)).astype(np.float32)))
        donor.eval()
        if overfit_steps:
            from tools.parity.overfit_donors import overfit_vipt_head
            loss = overfit_vipt_head(donor, cfg_mod.cfg, frames, gt,
                                     steps=overfit_steps, seed=seed)
            print(f"donor head overfit ({overfit_steps} steps): final "
                  f"loss {loss:.5f}", file=sys.stderr)
        state_dict = donor.state_dict()

        params = params_mod.TrackerParams()
        params.cfg = cfg_mod.cfg
        params.template_factor = cfg_mod.cfg.TEST.TEMPLATE_FACTOR
        params.template_size = cfg_mod.cfg.TEST.TEMPLATE_SIZE
        params.search_factor = cfg_mod.cfg.TEST.SEARCH_FACTOR
        params.search_size = cfg_mod.cfg.TEST.SEARCH_SIZE
        params.checkpoint = "<in-memory>"
        params.save_all_boxes = False
        params.debug = 0

        real_load = torch.load
        torch.load = lambda *a, **k: {"net": state_dict}
        try:
            tracker = vipt_mod.ViPTTrack(params)
        finally:
            torch.load = real_load

        responses = []
        orig_cal_bbox = tracker.network.box_head.cal_bbox

        def capturing_cal_bbox(response, size_map, offset_map,
                               return_score=False):
            # CenterPredictor.forward also calls cal_bbox internally
            # (head.py:136, unwindowed); only the tracker's own call
            # (vipt.py:82, return_score=True) sees the windowed response
            if return_score:
                responses.append(
                    response.detach().cpu().numpy().copy().reshape(1, -1))
            return orig_cal_bbox(response, size_map, offset_map,
                                 return_score=return_score)

        tracker.network.box_head.cal_bbox = capturing_cal_bbox

        # flag CE cuts that land inside an exact tie group: torch's
        # unstable sort then keeps an arbitrary member subset that a
        # stable sort cannot be required to reproduce
        tie_flags = []
        orig_ce = ab.candidate_elimination

        def tie_aware_ce(attn, tokens, lens_t, keep_ratio, global_index,
                         box_mask_z):
            lens_s = attn.shape[-1] - lens_t
            lens_keep = math.ceil(keep_ratio * lens_s)
            if lens_keep < lens_s:
                at = attn[:, :, :lens_t, lens_t:]
                if box_mask_z is not None:
                    bm = box_mask_z.unsqueeze(1).unsqueeze(-1).expand(
                        -1, at.shape[1], -1, at.shape[-1])
                    at = at[bm].view(attn.shape[0], attn.shape[1], -1,
                                     lens_s).mean(dim=2).mean(dim=1)
                else:
                    at = at.mean(dim=2).mean(dim=1)
                sa, _ = at.sort(dim=1, descending=True)
                tie_flags[-1] |= bool(
                    (sa[0, lens_keep - 1] == sa[0, lens_keep]).item())
            return orig_ce(attn, tokens, lens_t, keep_ratio, global_index,
                           box_mask_z)

        ab.candidate_elimination = tie_aware_ce
        try:
            tracker.initialize(frames[0],
                               {"init_bbox": [float(v)
                                              for v in force_boxes[0]]})
            boxes, scores = [], []
            with torch.no_grad():
                for t in range(1, len(frames)):
                    if not freerun:
                        tracker.state = [float(v) for v in force_boxes[t - 1]]
                    tie_flags.append(False)
                    out = tracker.track(frames[t])
                    boxes.append(out["target_bbox"])
                    scores.append(out["best_score"])
        finally:
            ab.candidate_elimination = orig_ce
        sd_np = {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
        return (np.asarray(boxes, np.float64), np.asarray(scores),
                np.concatenate(responses, axis=0), np.asarray(tie_flags),
                sd_np)


def run_ours_forced(variant: str, state_dict: dict, frames: np.ndarray,
                    force_boxes: np.ndarray):
    """Our ViPTTracker, teacher-forced from the same trajectory.

    Returns (boxes, windowed response maps) — one step per tracked frame,
    each started from force_boxes[t-1].
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.convert import convert_vipt_checkpoint, load_into
    from mmtrack_tpu.models.vipt import build_viptrack, generate_ctr_mask
    from mmtrack_tpu.ops.window import hann2d
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker

    cfg = vipt_experiment_config(variant)
    model = build_viptrack(cfg)
    rt = ViPTRuntime.from_config(cfg)

    z = np.zeros((1, rt.template_size, rt.template_size, 6), np.float32)
    x = np.zeros((1, rt.search_size, rt.search_size, 6), np.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z, x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    converted = convert_vipt_checkpoint(state_dict)
    params, missing, _ = load_into(zeros, converted)
    if missing:
        raise AssertionError(f"unconverted flax params: {missing[:8]}")
    params = {"params": params}

    tracker = ViPTTracker(model, params, rt, host_preproc=True)
    tracker.initialize(frames[0],
                       {"init_bbox": [float(v) for v in force_boxes[0]]})
    template = tracker.state["template"]

    mask = generate_ctr_mask(rt.template_size // rt.stride,
                             rt.ce_template_range)
    window = hann2d(rt.feat_sz, rt.feat_sz)

    @jax.jit
    def response_of(search):
        out = model.apply(params, template[None], search[None], mask,
                          rt.ce_keep_lens)
        return window[None] * out["score_map"]

    boxes, responses = [], []
    for t in range(1, len(frames)):
        prev = np.asarray(force_boxes[t - 1], np.float64)
        tracker.state = {"box": jnp.asarray(prev.astype(np.float32)),
                         "template": template}
        search, _rf = tracker._host_crop(frames[t], prev, rt.search_factor,
                                         rt.search_size)
        responses.append(np.asarray(response_of(search)).reshape(1, -1))
        out = tracker.track(frames[t])
        boxes.append(out["target_bbox"])
    return np.asarray(boxes, np.float64), np.concatenate(responses, axis=0)


def run_ours_free(variant: str, state_dict: dict, frames: np.ndarray, gt):
    """Our ViPTTracker FREE-RUNNING from frame 0: own cv2-twin crops
    (host_preproc), own forward/window/decode/map-back/clip, state fed
    back into the next frame's crop — no forcing, no resync."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.convert import convert_vipt_checkpoint, load_into
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker

    cfg = vipt_experiment_config(variant)
    model = build_viptrack(cfg)
    rt = ViPTRuntime.from_config(cfg)

    z = np.zeros((1, rt.template_size, rt.template_size, 6), np.float32)
    x = np.zeros((1, rt.search_size, rt.search_size, 6), np.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z, x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_vipt_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax params: {missing[:8]}")
    tracker = ViPTTracker(model, {"params": params}, rt, host_preproc=True)
    tracker.initialize(frames[0], {"init_bbox": [float(v) for v in gt[0]]})
    boxes, scores = [], []
    for t in range(1, len(frames)):
        out = tracker.track(frames[t])
        boxes.append(out["target_bbox"])
        scores.append(out["best_score"])
    return np.asarray(boxes, np.float64), np.asarray(scores)


TOL_PX_FREE = 0.05  # free-running per-frame lockstep tolerance


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="deep_rgbd")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--freerun", action="store_true",
                    help="overfit the donor's center head (decisive peaks)"
                         " then run BOTH loops uninterrupted from frame 0")
    ap.add_argument("--overfit", type=int, default=500,
                    help="head overfit steps for --freerun")
    ap.add_argument("--save-donor", default="",
                    help="with --freerun: pickle the CONVERTED flax params "
                         "of the overfit (tracking) donor to this path — "
                         "consumed by tools/wire_metric_ab.py, whose "
                         "metric-delta measurement needs a model whose "
                         "decisions are not argmax ties")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(
        n_frames=args.frames, height=240, width=320, seed=args.seed)

    if args.freerun:
        from tools.parity.freerun import box_iou_xywh, compare_freerun

        # free-run sequence: larger canvas + central trajectory so the
        # 4x search crop NEVER touches the image border — constant-padding
        # regions produce exact attention-score tie groups at the CE cut
        # (torch's unstable sort vs our stable argsort then legitimately
        # keep different subsets), which is the one known
        # non-reproducible channel (module docstring)
        frames, gt = make_synthetic_sequence(
            n_frames=args.frames, height=320, width=480,
            box0=(200.0, 130.0, 48.0, 36.0), velocity=(2.0, 1.2),
            seed=args.seed)

        ref_boxes, ref_scores, _resp, ties, sd = run_reference(
            args.variant, frames, gt, args.seed, freerun=True,
            overfit_steps=args.overfit, gt=gt)
        if args.save_donor:
            import pickle

            from mmtrack_tpu.models.convert import convert_vipt_checkpoint
            with open(args.save_donor, "wb") as f:
                pickle.dump({"variant": args.variant,
                             "params": convert_vipt_checkpoint(sd)}, f)
            print(f"tracking donor saved to {args.save_donor}",
                  file=sys.stderr)
        our_boxes, our_scores = run_ours_free(args.variant, sd, frames, gt)
        n = len(ref_boxes)
        res = {"family": "vipt-freerun", "variant": args.variant,
               **compare_freerun(ref_boxes, our_boxes, tol_px=TOL_PX_FREE,
                                 min_horizon=min(n, 40))}
        res["tie_frames"] = int(ties.sum())
        res["max_score_dev"] = float(np.abs(ref_scores - our_scores).max())
        # the donor must actually TRACK over the certified horizon
        # (otherwise the free-run would compare degenerate padding crops):
        # reference trajectory vs ground truth, over the locked frames
        hz = max(res["lockstep_horizon"], 1)
        res["mean_gt_iou_ref"] = float(np.mean([
            box_iou_xywh(ref_boxes[t], gt[t + 1]) for t in range(n)]))
        res["mean_gt_iou_ref_locked"] = float(np.mean([
            box_iou_xywh(ref_boxes[t], gt[t + 1]) for t in range(hz)]))
        res["pass"] = bool(res["pass"]
                           and res["mean_gt_iou_ref_locked"] >= 0.5)
        print(json.dumps(res))
        return 0 if res["pass"] else 1

    ref_boxes, _ref_scores, ref_resp, ties, sd = run_reference(
        args.variant, frames, gt, args.seed)
    our_boxes, our_resp = run_ours_forced(args.variant, sd, frames, gt)

    n = len(ref_boxes)
    clean = ~ties
    resp_dev = np.abs(ref_resp - our_resp).max(axis=1)
    box_dev = np.abs(ref_boxes - our_boxes).max(axis=1)

    res = {
        "family": "vipt-trajectory",
        "variant": args.variant,
        "frames_tracked": n,
        "tie_frames_excluded": int(ties.sum()),
        "max_response_dev": float(resp_dev[clean].max()),
        "max_box_dev_px": float(box_dev[clean].max()),
        "mean_box_dev_px": float(box_dev[clean].mean()),
        "pass": bool(clean.sum() >= 0.8 * n
                     and resp_dev[clean].max() <= TOL_RESPONSE
                     and box_dev[clean].max() <= TOL_PX),
        "tol_response": TOL_RESPONSE,
        "tol_px": TOL_PX,
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
