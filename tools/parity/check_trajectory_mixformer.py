"""Trajectory-level A/B: the reference's own MixFormer-RGBD online loop vs ours.

Runs the reference's ACTUAL tracker — RGBD/models/MixFormer_RGBD/lib/test/
tracker/mixformerrgbd_online.py::MixFormerRGBDOnline — side by side with
mmtrack_tpu's functional step (trackers/mixformer_tracker.py) on the same
synthetic 6-channel sequence and the same converted weights, covering the
full online state machine per frame:

  - 6-ch crop -> dual-CVT forward_test against the set_online-cached
    template/online-template features (our joint forward with the ot_mask
    validity ring is numerically the same computation — the template
    queries attend over [t, all ots] in both, set_online:324-388);
  - corner-head decode -> map-back -> clip(margin=10);
  - SPM ScoreDecoder confidence at the predicted box;
  - re-constraint ('simple' displacement gate, tracker_utils.py:131-143,
    or 'complex' displacement+confidence+scale gates against the his_w/
    his_h AverageMeters, :146-166);
  - nomination (pred_score > 0.5 and > 0.98-decayed running max,
    tracker:157-166) with the candidate template cropped at the
    POST-constraint state;
  - the ring update at update_interval: CONCAT while len < ONLINE_SIZES
    (grow-from-1), then replace at the forget pointer (tracker:167-183),
    followed by set_online re-caching.

Both loops are teacher-forced from ground truth (state := gt of the
previous frame before every track call) and crop with bit-identical cv2
geometry (sample_target vs ops/crop.sample_target_np — asserted byte-equal
every frame). Our ring/meters/max-score state is resynced to the
reference's post-frame state each transition so every frame tests the
complete step from an identical state.

The donor is the reference's own random-init model at the check_mixformer
--small structural scale (full-scale conversion parity is covered by
check_mixformer.py at 371.8M) with +0.8 on the final score-head bias so
the sigmoid confidence clears the hardcoded 0.5 nomination threshold and
the nominated-template path actually runs. Runtime constants are the
published VOT2022RGBD deployment (update_interval 10, online_size 5,
max_score_decay 0.98, re_constrain 'simple') in phase A; phase B forces
ring growth + wraparound and the 'complex' re-constraint through the
tracker's own params surface (params.update_interval/online_sizes,
tracker:46-50); phase C pins the online_size==1 scalar-replace branch.

Excused comparisons: gate decisions within float noise of their
thresholds (nomination |score-0.5| or |score-decayed max|; a re-constraint
gate margin) excuse only the affected comparison, never the float ones.

Run: python tools/parity/check_trajectory_mixformer.py [--frames 24]
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import json
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

TOL_PX = 0.05        # post-map-back box agreement (px)
TOL_SCORE = 5e-5     # SPM sigmoid confidence
TOL_HIS = 1e-3       # his_w/his_h meter sums (px)
EPS_GATE = 1e-4      # threshold-margin excusal for binary decisions
SCORE_BIAS = 0.8     # added to score_head.layers.2.bias (both sides)


def _small_cfg(cfg_mod, root):
    """The check_mixformer.py --small structural scale on top of the
    published baseline_large.yaml (same code paths, CPU-feasible)."""
    cfg_mod.update_config_from_file(os.path.join(
        root, "experiments", "mixformerrgbd_online", "baseline_large.yaml"))
    c = cfg_mod.cfg
    c.MODEL.BACKBONE.DIM_EMBED = [48, 96, 128]
    c.MODEL.BACKBONE.NUM_HEADS = [1, 2, 4]
    c.MODEL.BACKBONE.DEPTH = [1, 1, 2]
    c.MODEL.BACKBONE.DROP_PATH_RATE = [0.0, 0.0, 0.0]
    c.MODEL.BACKBONE.FREEZE_BN = True
    c.MODEL.HIDDEN_DIM = 128
    c.MODEL.HEAD_DIM = 64
    c.MODEL.HEAD_FREEZE_BN = True
    return c


def run_reference(frames, gt, seed=0, update_interval=None,
                  online_size=None, re_constrain=None, overfit_steps=0,
                  freerun=False):
    """overfit_steps > 0 trains the donor's corner head at tracking
    geometry (decisive, consistent boxes — the 'complex' scale gate can
    then ACCEPT); freerun=True drops the per-frame state forcing so the
    loop runs uninterrupted from frame 0."""
    import torch

    patch_cuda_to_cpu()
    with reference_path("RGBD/models/MixFormer_RGBD") as root:
        cfg_mod = importlib.import_module(
            "lib.config.mixformerrgbd_online.config")
        importlib.reload(cfg_mod)
        c = _small_cfg(cfg_mod, root)
        if re_constrain is not None:
            c.TEST.RE_CONSTRAIN_TYPE = re_constrain

        model_mod = importlib.import_module(
            "lib.models.mixformer.mixformerrgbd_online")
        torch.manual_seed(seed)
        donor = model_mod.build_mixformer_rgbd_online_score(c, train=False)
        donor.eval()
        if overfit_steps:
            from tools.parity.overfit_donors import overfit_mixformer_head
            l1 = overfit_mixformer_head(donor, c, frames, gt,
                                        steps=overfit_steps, seed=seed)
            print(f"donor head overfit ({overfit_steps} steps): final "
                  f"l1 {l1:.5f}", file=sys.stderr)
        sd = donor.state_dict()
        sd["score_branch.score_head.layers.2.bias"] = (
            sd["score_branch.score_head.layers.2.bias"] + SCORE_BIAS)

        utils_mod = importlib.import_module("lib.test.utils")
        tracker_mod = importlib.import_module(
            "lib.test.tracker.mixformerrgbd_online")

        p = utils_mod.TrackerParams()
        p.cfg = c
        p.template_factor = c.TEST.TEMPLATE_FACTOR
        p.template_size = c.TEST.TEMPLATE_SIZE
        p.search_factor = c.TEST.SEARCH_FACTOR
        p.search_size = c.TEST.SEARCH_SIZE
        p.max_score_decay = c.TEST.MAX_SCORE_DECAY
        p.checkpoint = "<in-memory>"
        p.save_all_boxes = False
        p.debug = 0
        if update_interval is not None:
            p.update_interval = update_interval
        if online_size is not None:
            p.online_sizes = online_size

        real_load = torch.load
        torch.load = lambda *a, **k: {"net": sd}
        try:
            tracker = tracker_mod.MixFormerRGBDOnline(
                p, dataset_name="vot2022rgbd")
        finally:
            torch.load = real_load

        cap = {"x_crops": [], "z_crops": [], "raw": []}

        orig_proc = tracker.preprocessor.process

        def hook_proc(img_arr):
            (cap["x_crops"] if img_arr.shape[0] == p.search_size
             else cap["z_crops"]).append(img_arr.copy())
            return orig_proc(img_arr)

        tracker.preprocessor.process = hook_proc

        # pre-constraint box + gate margins via the module-level functions
        # the tracker calls by imported name
        orig_simple = tracker_mod.re_constraint_simple
        orig_complex = tracker_mod.re_constraint_complex

        def hook_simple(prev_state, curr_state):
            cap["raw"].append(("simple", list(prev_state), list(curr_state),
                               None, None, None))
            return orig_simple(prev_state, curr_state)

        def hook_complex(prev_state, curr_state, curr_score, his_w, his_h):
            cap["raw"].append(("complex", list(prev_state), list(curr_state),
                               float(curr_score), float(his_w),
                               float(his_h)))
            return orig_complex(prev_state, curr_state, curr_score,
                                his_w, his_h)

        tracker_mod.re_constraint_simple = hook_simple
        tracker_mod.re_constraint_complex = hook_complex

        out = {"boxes": [], "scores": [], "nominated": [], "rings": [],
               "forget": [], "n_online": [], "max_pred": [], "omt": [],
               "his": [], "pre": [], "raw": cap["raw"],
               "x_crops": cap["x_crops"], "z_crops": cap["z_crops"],
               "nom_crop": []}
        try:
            with torch.no_grad():
                tracker.initialize(frames[0],
                                   {"init_bbox": [float(v) for v in gt[0]]})
                out["init_template"] = (
                    tracker.template.numpy().copy(),
                    cap["z_crops"][0].copy())
                for t in range(1, len(frames)):
                    if not freerun:
                        tracker.state = [float(v) for v in gt[t - 1]]
                    ring = (tracker.online_template
                            if tracker.online_size > 1
                            else tracker.online_template)
                    out["pre"].append({
                        "ring": ring.numpy().copy(),
                        "forget": int(tracker.online_forget_id),
                        "max_pred": float(tracker.max_pred_score),
                        "omt": tracker.online_max_template.numpy().copy(),
                        "his": (float(tracker.his_w.sum),
                                float(tracker.his_h.sum),
                                float(tracker.his_w.count)),
                    })
                    n_z = len(cap["z_crops"])
                    r = tracker.track(frames[t])
                    out["boxes"].append([float(v) for v in r["target_bbox"]])
                    out["scores"].append(float(r["target_score"]))
                    nominated = len(cap["z_crops"]) > n_z
                    out["nominated"].append(nominated)
                    out["nom_crop"].append(
                        cap["z_crops"][-1].copy() if nominated else None)
                    out["rings"].append(
                        tracker.online_template.numpy().copy())
                    out["forget"].append(int(tracker.online_forget_id))
                    out["n_online"].append(
                        int(tracker.online_template.shape[0]))
                    out["max_pred"].append(float(tracker.max_pred_score))
                    out["omt"].append(
                        tracker.online_max_template.numpy().copy())
                    out["his"].append((float(tracker.his_w.sum),
                                       float(tracker.his_h.sum),
                                       float(tracker.his_w.count)))
        finally:
            tracker_mod.re_constraint_simple = orig_simple
            tracker_mod.re_constraint_complex = orig_complex

        sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        out["online_size"] = int(tracker.online_size)
        out["update_interval"] = int(tracker.update_interval)
        out["decay"] = float(tracker.max_score_decay)
        out["re_constrain"] = str(c.TEST.RE_CONSTRAIN_TYPE)
        out["spec"] = {
            "stage_dims": tuple(c.MODEL.BACKBONE.DIM_EMBED),
            "stage_depths": tuple(c.MODEL.BACKBONE.DEPTH),
            "stage_heads": tuple(c.MODEL.BACKBONE.NUM_HEADS),
            "head_channel": int(c.MODEL.HEAD_DIM),
        }
        return sd_np, out


def run_ours(sd_np, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_mixformer_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.mixformer import MixFormer
    from mmtrack_tpu.ops.crop import sample_target_np
    from mmtrack_tpu.trackers.mixformer_tracker import (
        MixFormerRuntime, mixformer_step_from_patch)
    from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

    rt = MixFormerRuntime(update_interval=ref["update_interval"],
                          online_size=ref["online_size"],
                          max_score_decay=ref["decay"],
                          re_constrain=ref["re_constrain"])
    model = MixFormer(in_channels=6, **ref["spec"])
    K = rt.online_size

    z = jnp.zeros((1, 128, 128, 6))
    x = jnp.zeros((1, 320, 320, 6))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z,
                            jnp.zeros((1, K, 128, 128, 6)), x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros,
                                   convert_mixformer_checkpoint(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    mean = np.asarray(MEAN_6CH, np.float32)
    std = np.asarray(STD_6CH, np.float32)

    def host_norm(crop):
        return jnp.asarray((crop.astype(np.float32) / 255.0 - mean) / std)

    step = jax.jit(partial(mixformer_step_from_patch, rt, model, P),
                   static_argnames=("im_hw",))

    # init template: byte-identical crop
    z_crop, _, _ = sample_target_np(frames[0], gt[0].astype(np.float64),
                                    rt.template_factor, rt.template_size)
    ref_t0, ref_z0 = ref["init_template"]
    init_crop_equal = bool(np.array_equal(z_crop, ref_z0))
    template = host_norm(z_crop)
    init_t_dev = float(np.abs(np.asarray(template).transpose(2, 0, 1)[None]
                              - ref_t0).max())

    H, W = frames.shape[1], frames.shape[2]
    out = {"boxes": [], "boxes_raw": [], "scores": [], "nominated": [],
           "n_online": [], "forget": [], "his": [],
           "crop_mismatch": 0, "nom_crop_mismatch": [],
           "init_crop_equal": init_crop_equal,
           "init_template_dev": init_t_dev}
    for t in range(1, len(frames)):
        crop, rf, _ = sample_target_np(frames[t], gt[t - 1].astype(np.float64),
                                       rt.search_factor, rt.search_size)
        if not np.array_equal(crop, ref["x_crops"][t - 1]):
            out["crop_mismatch"] += 1
        pre = ref["pre"][t - 1]
        ring = pre["ring"].transpose(0, 2, 3, 1)        # (n, 128, 128, 6)
        n = ring.shape[0]
        ring_full = np.concatenate(
            [ring, np.tile(np.asarray(template)[None], (K - n, 1, 1, 1))], 0)
        state = {
            "box": jnp.asarray(gt[t - 1], jnp.float32),
            "template": template,
            "online_templates": jnp.asarray(ring_full),
            "n_online": jnp.asarray(n, jnp.int32),
            "online_max_template": jnp.asarray(
                pre["omt"][0].transpose(1, 2, 0)),
            "max_pred_score": jnp.asarray(pre["max_pred"], jnp.float32),
            "forget_id": jnp.asarray(pre["forget"], jnp.int32),
            "frame_num": jnp.asarray(t - 1, jnp.int32),
            "his_sum": jnp.asarray([pre["his"][0], pre["his"][1]],
                                   jnp.float32),
            "his_count": jnp.asarray(pre["his"][2], jnp.float32),
        }
        # nomination candidate: host crop at the REFERENCE's post-frame
        # state, isolating the crop path from box float noise; the raw
        # bytes are compared against the reference's own candidate below
        cand_crop, _, _ = sample_target_np(
            frames[t], np.asarray(ref["boxes"][t - 1], np.float64),
            rt.template_factor, rt.template_size)
        state2, box, score, aux = step(
            state=state, search=host_norm(crop),
            resize_factor=jnp.float32(rf), cand=host_norm(cand_crop),
            im_hw=(float(H), float(W)))
        out["boxes"].append(np.asarray(box, np.float64))
        out["boxes_raw"].append(np.asarray(aux["box_raw"], np.float64))
        out["scores"].append(float(score))
        out["nominated"].append(bool(aux["nominate"]))
        out["n_online"].append(int(state2["n_online"]))
        out["forget"].append(int(state2["forget_id"]))
        out["his"].append(np.asarray(state2["his_sum"], np.float64))
        if ref["nom_crop"][t - 1] is not None:
            if not np.array_equal(cand_crop, ref["nom_crop"][t - 1]):
                out["nom_crop_mismatch"].append(t - 1)
    out["boxes"] = np.asarray(out["boxes"])
    out["boxes_raw"] = np.asarray(out["boxes_raw"])
    return out


def run_ours_free(sd_np, ref, frames, gt):
    """OUR MixFormer loop FREE-RUNNING from frame 0: own state feedback,
    own bit-exact cv2-twin crops (sample_target_np) at OUR OWN boxes, own
    ring/meter updates — no forcing, no resync. The nomination candidate
    needs the post-constraint box before it can be cropped on the host, so
    each frame runs the pure step twice: once with a dummy candidate to
    obtain the box, then with the candidate cropped at that box (the step
    is a pure function; the second call is the adopted transition)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_mixformer_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.mixformer import MixFormer
    from mmtrack_tpu.ops.crop import sample_target_np
    from mmtrack_tpu.trackers.mixformer_tracker import (
        MixFormerRuntime, mixformer_step_from_patch)
    from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

    rt = MixFormerRuntime(update_interval=ref["update_interval"],
                          online_size=ref["online_size"],
                          max_score_decay=ref["decay"],
                          re_constrain=ref["re_constrain"])
    model = MixFormer(in_channels=6, **ref["spec"])
    K = rt.online_size

    z = jnp.zeros((1, 128, 128, 6))
    x = jnp.zeros((1, 320, 320, 6))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z,
                            jnp.zeros((1, K, 128, 128, 6)), x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros,
                                   convert_mixformer_checkpoint(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    mean = np.asarray(MEAN_6CH, np.float32)
    std = np.asarray(STD_6CH, np.float32)

    def host_norm(crop):
        return jnp.asarray((crop.astype(np.float32) / 255.0 - mean) / std)

    step = jax.jit(partial(mixformer_step_from_patch, rt, model, P),
                   static_argnames=("im_hw",))

    H, W = frames.shape[1], frames.shape[2]
    z_crop, _, _ = sample_target_np(frames[0], gt[0].astype(np.float64),
                                    rt.template_factor, rt.template_size)
    template = host_norm(z_crop)
    box0 = np.asarray(gt[0], np.float32)
    state = {
        "box": jnp.asarray(box0),
        "template": template,
        "online_templates": jnp.tile(np.asarray(template)[None],
                                     (K, 1, 1, 1)),
        "n_online": jnp.asarray(1, jnp.int32),
        "online_max_template": template,
        "max_pred_score": jnp.asarray(-1.0),
        "forget_id": jnp.asarray(0, jnp.int32),
        "frame_num": jnp.asarray(0, jnp.int32),
        "his_sum": jnp.stack([jnp.asarray(box0[2]), jnp.asarray(box0[3])]),
        "his_count": jnp.asarray(1.0),
    }
    dummy = jnp.zeros((rt.template_size, rt.template_size, 6), jnp.float32)

    out = {"boxes": [], "scores": [], "nominated": [], "n_online": [],
           "forget": []}
    for t in range(1, len(frames)):
        prev = np.asarray(state["box"], np.float64)
        crop, rf, _ = sample_target_np(frames[t], prev,
                                       rt.search_factor, rt.search_size)
        search = host_norm(crop)
        _s, box, _sc, _aux = step(state=state, search=search,
                                  resize_factor=jnp.float32(rf), cand=dummy,
                                  im_hw=(float(H), float(W)))
        cand_crop, _, _ = sample_target_np(
            frames[t], np.asarray(box, np.float64),
            rt.template_factor, rt.template_size)
        state, box, score, aux = step(state=state, search=search,
                                      resize_factor=jnp.float32(rf),
                                      cand=host_norm(cand_crop),
                                      im_hw=(float(H), float(W)))
        out["boxes"].append(np.asarray(box, np.float64))
        out["scores"].append(float(score))
        out["nominated"].append(bool(aux["nominate"]))
        out["n_online"].append(int(state["n_online"]))
        out["forget"].append(int(state["forget_id"]))
    out["boxes"] = np.asarray(out["boxes"])
    return out


def _gate_margins(raw, decay_pre_max, score):
    """Distance of each binary decision from its threshold, for excusals."""
    kind, prev, curr, cscore, his_w, his_h = raw
    prev = np.asarray(prev, np.float64)
    curr = np.asarray(curr, np.float64)
    avg_wh = (prev[2] + prev[3]) / 2
    dis = (abs(curr[0] + curr[2] / 2 - prev[0] - prev[2] / 2)
           + abs(curr[1] + curr[3] / 2 - prev[1] - prev[3] / 2))
    margins = [abs(dis - 2 * avg_wh) / max(avg_wh, 1e-9)]
    if kind == "complex":
        margins.append(min(abs(dis - 1.5 * avg_wh) / max(avg_wh, 1e-9),
                           abs(cscore - 0.5)))
        sc = max(max(curr[2] / his_w, his_w / curr[2]),
                 max(curr[3] / his_h, his_h / curr[3]))
        margins.append(abs(sc - 1.35))
    nom = [abs(score - 0.5), abs(score - decay_pre_max)]
    return min(margins), min(nom)


def run_phase(frames, gt, seed, **kw):
    sd, ref = run_reference(frames, gt, seed, **kw)
    ours = run_ours(sd, ref, frames, gt)
    n = len(ref["boxes"])

    ref_boxes = np.asarray(ref["boxes"])
    box_dev = np.abs(ref_boxes - ours["boxes"]).max(axis=1)
    raw_dev = np.asarray(
        [np.abs(np.asarray(ref["raw"][t][2]) - ours["boxes_raw"][t]).max()
         for t in range(n)])
    score_dev = np.abs(np.asarray(ref["scores"]) - np.asarray(ours["scores"]))
    his_dev = np.asarray(
        [np.abs(np.asarray(ref["his"][t][:2]) - ours["his"][t]).max()
         for t in range(n)])

    gate_excused, nom_excused, box_cmp = [], [], []
    nom_mismatch, ring_mismatch = [], []
    for t in range(n):
        decayed = ref["pre"][t]["max_pred"] * ref["decay"]
        g_margin, n_margin = _gate_margins(ref["raw"][t], decayed,
                                           ref["scores"][t])
        if g_margin < EPS_GATE:
            gate_excused.append(t)
        else:
            box_cmp.append(t)
        if n_margin < EPS_GATE:
            nom_excused.append(t)
        elif ref["nominated"][t] != ours["nominated"][t]:
            nom_mismatch.append(t)
        if (ref["n_online"][t] != ours["n_online"][t]
                or ref["forget"][t] != ours["forget"][t]):
            ring_mismatch.append(t)

    n_nom = int(sum(ref["nominated"]))
    growth = [int(v) for v in ref["n_online"]]
    return {
        "constants": {"update_interval": ref["update_interval"],
                      "online_size": ref["online_size"],
                      "decay": ref["decay"],
                      "re_constrain": ref["re_constrain"]},
        "frames_tracked": n,
        "crop_mismatch_frames": ours["crop_mismatch"],
        "init_crop_equal": ours["init_crop_equal"],
        "init_template_dev": ours["init_template_dev"],
        "max_box_dev_px": float(box_dev[box_cmp].max()) if box_cmp else -1.0,
        "max_raw_box_dev_px": float(raw_dev.max()),
        "max_score_dev": float(score_dev.max()),
        "max_his_dev": float(his_dev[box_cmp].max()) if box_cmp else -1.0,
        "gate_excused": gate_excused,
        "nom_excused": nom_excused,
        "nominations": n_nom,
        "nom_mismatches": nom_mismatch,
        "nom_crop_mismatches": ours["nom_crop_mismatch"],
        "ring_mismatches": ring_mismatch,
        "ring_growth": growth,
        "rejections": int(sum(
            1 for t in range(n)
            if not np.allclose(ref["raw"][t][2], ref_boxes[t], atol=1e-9))),
        # frames where the 'complex' 3-gate chain ACCEPTED the new state
        # (final box == the pre-constraint box through all three gates)
        "complex_accepts": int(sum(
            1 for t in range(n)
            if ref["raw"][t][0] == "complex"
            and np.allclose(ref["raw"][t][2], ref_boxes[t], atol=1e-9))),
        "pass": bool(
            ours["crop_mismatch"] == 0
            and ours["init_crop_equal"]
            and raw_dev.max() <= TOL_PX
            and (not box_cmp or box_dev[box_cmp].max() <= TOL_PX)
            and score_dev.max() <= TOL_SCORE
            and (not box_cmp or his_dev[box_cmp].max() <= TOL_HIS)
            and not nom_mismatch
            and not ours["nom_crop_mismatch"]
            and not ring_mismatch
            and len(gate_excused) + len(nom_excused) <= 0.3 * n
            and n_nom >= 1),
    }


TOL_PX_FREE = 0.05  # free-running lockstep tolerance (bit-equal crops)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--freerun", action="store_true",
                    help="overfit the corner head, then run BOTH loops "
                         "uninterrupted from frame 0 (interval 5 / K=3 / "
                         "'complex': ring growth + wraparound + the "
                         "3-gate accept path all free-running)")
    ap.add_argument("--overfit", type=int, default=300)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(
        n_frames=args.frames, height=240, width=320, seed=args.seed,
        channels=6)
    frames = np.ascontiguousarray(frames)

    if args.freerun:
        from tools.parity.freerun import box_iou_xywh, compare_freerun

        sd, ref = run_reference(frames, gt, args.seed, freerun=True,
                                overfit_steps=args.overfit,
                                update_interval=5, online_size=3,
                                re_constrain="complex")
        ours = run_ours_free(sd, ref, frames, gt)
        ref_boxes = np.asarray(ref["boxes"], np.float64)
        n = len(ref_boxes)
        res = {"family": "mixformer-freerun",
               **compare_freerun(
                   ref_boxes, ours["boxes"], tol_px=TOL_PX_FREE,
                   ref_events=list(zip(ref["nominated"], ref["n_online"],
                                       ref["forget"])),
                   our_events=list(zip(ours["nominated"], ours["n_online"],
                                       ours["forget"])),
                   min_horizon=min(n, 40))}
        res["nominations_ref"] = int(sum(ref["nominated"]))
        res["complex_accepts_ref"] = int(sum(
            1 for t in range(n)
            if ref["raw"][t][0] == "complex"
            and np.allclose(ref["raw"][t][2], ref_boxes[t], atol=1e-9)))
        res["mean_gt_iou_ref"] = float(np.mean([
            box_iou_xywh(ref_boxes[t], gt[t + 1]) for t in range(n)]))
        res["max_score_dev"] = float(np.abs(
            np.asarray(ref["scores"]) - np.asarray(ours["scores"])).max())
        res["pass"] = bool(res["pass"] and res["mean_gt_iou_ref"] >= 0.5
                           and res["nominations_ref"] >= 1)
        print(json.dumps(res))
        return 0 if res["pass"] else 1

    # Phase A: the published VOT2022RGBD deployment (interval 10, K=5,
    # decay 0.98, 'simple'): ring grows 1 -> 3 over 24 frames.
    phase_pub = run_phase(frames, gt, args.seed)
    # Phase B: interval 2 / K=3 through the tracker's own params surface +
    # 'complex' re-constraint: growth AND wraparound AND the 3-gate path.
    phase_wrap = run_phase(frames[:16], gt[:16], args.seed,
                           update_interval=2, online_size=3,
                           re_constrain="complex")
    # Phase C: online_size=1 scalar-replace branch (joint forward path).
    phase_k1 = run_phase(frames[:10], gt[:10], args.seed,
                         update_interval=3, online_size=1)
    # Phase D: the 'complex' re-constraint ACCEPT path. The corner head is
    # overfit at tracking geometry so predictions are consistent with the
    # his_w/his_h history and the 1.35x scale gate passes (round-4 caveat:
    # the random-weight donor's scale gate rejected every frame).
    phase_acc = run_phase(frames[:16], gt[:16], args.seed,
                          update_interval=2, online_size=3,
                          re_constrain="complex", overfit_steps=300)
    phase_acc["pass"] = bool(phase_acc["pass"]
                             and phase_acc["complex_accepts"] >= 1)

    res = {
        "family": "mixformer-rgbd-online-trajectory",
        "variant": "baseline_large(small structural scale)",
        "published": phase_pub,
        "wrap_complex": phase_wrap,
        "k1": phase_k1,
        "complex_accept": phase_acc,
        "pass": bool(phase_pub["pass"] and phase_wrap["pass"]
                     and phase_k1["pass"] and phase_acc["pass"]),
        "tol": {"px": TOL_PX, "score": TOL_SCORE, "his": TOL_HIS},
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
