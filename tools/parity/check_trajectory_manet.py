"""Trajectory-level A/B: the reference's own MANet online protocol vs ours.

Runs the reference's ACTUAL building blocks — RGBE/models/MANet/tracking/
run_tracker.py's forward_samples + train() (sum-form BinaryLoss from
modules/MANet3x1x1_IC.py:308-317), BBRegressor from tracking/bbreg.py
(sklearn Ridge + the reject-and-revert predict), samples from
modules/sample_generator.py via gen_samples, crops from modules/utils.py
crop_image (PIL resize) — in the exact run_mdnet loop order
(run_tracker.py:119-330), side by side with mmtrack_tpu's functional
protocol (trackers/mdnet_tracker.py with the MANet runtime flags) on the
same synthetic RGB+event sequence and the same converted weights.

The MANet protocol deltas vs pyMDNet this harness pins (all covered by
runtime flags added for it):

  - 512 candidates; candidate spread HARD-set to trans_f_expand at failure
    (:239 set_trans_f) instead of the 1.1x expand walk;
  - the reported AND sampling boxes revert to the PREVIOUS frame's results
    at failure (:252-256);
  - BinaryLoss is the raw SUM of per-sample BCE terms (no combined-count
    normalization) — with grad_clip 10 this saturates the clip, so it is
    a genuinely different iteration from pyMDNet's mean;
  - update memories seeded from the init-set slices (pos_feats[:50],
    neg_feats[:200], :180-181) — every pool entry is uniform-sized, there
    is no 500-row init entry and no fresh negative draw;
  - BBRegressor.predict rejects refined boxes outside overlap [0.6,1] /
    scale [1,2] of the pre-refine box and reverts them (bbreg.py:35-55);
  - init training 30 iters at lr 1e-4, updates at lr 2e-4, 20-frame short
    window, 10-frame long interval (tracking/options.py).

Both sides consume byte-identical crops and identical batch index streams
(np.random.permutation captured from the reference's train() and remapped
through its pointer walk). Dropout p=0 on both sides; the adapter-branch
BatchNorms run in eval (tracking never trains conv layers). Teacher-forced
from gt for sampling; the revert path resyncs to the reference's own
result/result_bb history; fc weights + momentum resync each transition.

Production-fidelity footnote (NOT covered here, crops are injected): the
reference's crop is an integer crop + PIL resize where our device crop is
the bilinear warp pinned against pyMDNet's crop_image2 in tests/test_mdnet.

Run: python tools/parity/check_trajectory_manet.py [--frames 8] [--fast]
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import REFERENCE_ROOT, reference_available  # noqa: E402

TOL_SCORE = 2e-3
TOL_BOX = 1e-2
TOL_BBREG = 0.05
TOL_FC = 5e-3
EPS_TOP = 1e-4
EPS_SUCCESS = 1e-4


def _load_ref():
    """Import MANet's run_tracker with the reference's own module-shadowing
    order: '../modules' ahead of the tracking dir (run_tracker.py:15), so
    `from utils import *` resolves to modules/utils.py (PIL crop) exactly
    as it does when the reference runs as a script."""
    root = os.path.join(REFERENCE_ROOT, "RGBE", "models", "MANet")
    os.environ.setdefault("MPLBACKEND", "Agg")
    import torch
    # the reference calls the pre-1.0 alias torch.nn.utils.clip_grad_norm
    # (run_tracker.py:117); polyfill on a torch that removed it
    if not hasattr(torch.nn.utils, "clip_grad_norm"):
        torch.nn.utils.clip_grad_norm = torch.nn.utils.clip_grad_norm_
    sys.path.insert(0, os.path.join(root, "tracking"))
    sys.path.insert(0, os.path.join(root, "modules"))
    cwd = os.getcwd()
    os.chdir(os.path.join(root, "tracking"))
    try:
        spec = importlib.util.spec_from_file_location(
            "manet_run_tracker", os.path.join(root, "tracking",
                                              "run_tracker.py"))
        rt_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rt_mod)
    finally:
        os.chdir(cwd)
    # modern torch propagates channels_last through the convs from the
    # transposed numpy strides, breaking the .view at fc4 — force
    # contiguity (identical values, layout only)
    orig_extract = rt_mod.RegionExtractor.extract_regions

    def extract_contig(self, index):
        return np.ascontiguousarray(orig_extract(self, index))

    rt_mod.RegionExtractor.extract_regions = extract_contig
    return rt_mod


class _PermRecorder:
    """Capture np.random.permutation outputs around a reference train()
    call, then rebuild its pointer walk into per-iter index batches
    (MANet run_tracker.py:66-89 — same walk as pyMDNet)."""

    def __init__(self):
        self.records = []
        self._orig = None

    def __enter__(self):
        self._orig = np.random.permutation

        def hook(x):
            out = self._orig(x)
            self.records.append((x if np.isscalar(x) else len(x),
                                 np.array(out)))
            return out

        np.random.permutation = hook
        return self

    def __exit__(self, *a):
        np.random.permutation = self._orig

    def walks(self, n_pos, n_neg, maxiter, batch_pos, batch_neg_cand):
        k_pos, total = 1, n_pos
        while total < batch_pos * maxiter:
            total += n_pos
            k_pos += 1
        outs = [o for _, o in self.records]
        pos_parts = [outs[0]] + outs[2:2 + (k_pos - 1)]
        neg_parts = [outs[1]] + outs[2 + (k_pos - 1):]
        assert all(len(p) == n_pos for p in pos_parts), "pos split wrong"
        assert all(len(p) == n_neg for p in neg_parts), "neg split wrong"
        pos_idx = np.concatenate(pos_parts)
        neg_idx = np.concatenate(neg_parts)
        pos = np.stack([pos_idx[i * batch_pos:(i + 1) * batch_pos]
                        for i in range(maxiter)])
        neg = np.stack([neg_idx[i * batch_neg_cand:(i + 1) * batch_neg_cand]
                        for i in range(maxiter)])
        return pos, neg


KEY_MAP = {"fc4_weight": "layers.fc4.1.weight",
           "fc4_bias": "layers.fc4.1.bias",
           "fc5_weight": "layers.fc5.1.weight",
           "fc5_bias": "layers.fc5.1.bias",
           "fc6_0_weight": "branches.0.1.weight",
           "fc6_0_bias": "branches.0.1.bias"}


def _torch_fc_state(model, optimizer):
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()
          if ".fc" in k or k.startswith("branches")}
    bufs = {}
    name_of = {id(p): n for n, p in model.get_learnable_params().items()}
    for group in optimizer.param_groups:
        for p in group["params"]:
            st = optimizer.state.get(p, {})
            buf = st.get("momentum_buffer")
            if buf is not None:
                bufs[KEY_MAP[name_of[id(p)]]] = buf.detach().numpy().copy()
    return sd, bufs


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_reference(frames_vis, frames_event, gt, seed, opts_override):
    import torch

    rt_mod = _load_ref()
    opts = rt_mod.opts
    opts["use_gpu"] = False
    opts.update(opts_override)
    np.random.seed(seed)
    torch.manual_seed(seed)

    model = rt_mod.MDNet(None, K=1)
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    model.set_learnable_params(opts["ft_layers"])
    criterion = rt_mod.BinaryLoss()
    init_opt = rt_mod.set_optimizer(model, opts["lr_init"])
    update_opt = rt_mod.set_optimizer(model, opts["lr_update"])
    state_dict0 = {k: v.detach().numpy().copy()
                   for k, v in model.state_dict().items()}

    SG = rt_mod.SampleGenerator
    gen = rt_mod.gen_samples
    from PIL import Image
    img_vis = [Image.fromarray(f) for f in frames_vis]
    img_event = [Image.fromarray(f) for f in frames_event]
    img_size = img_vis[0].size  # (w, h)

    def fwd(i, samples, out_layer="conv3"):
        return rt_mod.forward_samples(model, img_vis[i], img_event[i],
                                      samples, out_layer=out_layer)

    target_bbox = np.array(gt[0], np.float64)
    # ---- init, in the reference's exact order (run_tracker.py:148-181):
    # bbreg FIRST, then pos/neg draws, then init training
    bbreg_examples = gen(SG("uniform", img_size, 0.3, 1.5, 1.1),
                         target_bbox, opts["n_bbreg"],
                         opts["overlap_bbreg"], opts["scale_bbreg"])
    bb_f = fwd(0, bbreg_examples)
    bbreg = rt_mod.BBRegressor(img_size)
    bbreg.train(bb_f, bbreg_examples, target_bbox)

    pos_examples = gen(SG("gaussian", img_size, 0.1, 1.2), target_bbox,
                       opts["n_pos_init"], opts["overlap_pos_init"])
    neg_examples = np.concatenate([
        gen(SG("uniform", img_size, 1, 2, 1.1), target_bbox,
            opts["n_neg_init"] // 2, opts["overlap_neg_init"]),
        gen(SG("whole", img_size, 0, 1.2, 1.1), target_bbox,
            opts["n_neg_init"] // 2, opts["overlap_neg_init"])])
    neg_examples = np.random.permutation(neg_examples)
    assert len(pos_examples) == opts["n_pos_init"], "pos rejection underfill"

    _log("[ref] bbreg trained; embedding init sets")
    pos_feats = fwd(0, pos_examples)
    neg_feats = fwd(0, neg_examples)
    _log("[ref] init training")
    with _PermRecorder() as rec:
        rt_mod.train(model, criterion, init_opt, pos_feats, neg_feats,
                     opts["maxiter_init"])
    init_walks = rec.walks(len(pos_examples), len(neg_examples),
                           opts["maxiter_init"], opts["batch_pos"],
                           max(opts["batch_neg_cand"], opts["batch_neg"]))
    fc_post_init, _ = _torch_fc_state(model, init_opt)

    sample_generator = SG("gaussian", img_size, opts["trans_f"],
                          opts["scale_f"], valid=True)
    pos_generator = SG("gaussian", img_size, 0.1, 1.2)
    neg_generator = SG("uniform", img_size, 1.5, 1.2)
    # memories seeded from the init-set slices (run_tracker.py:180-181)
    pos_all = [pos_feats[:opts["n_pos_update"]]]
    neg_all = [neg_feats[:opts["n_neg_update"]]]

    init_cap = {
        "pos_examples": pos_examples, "neg_examples": np.array(neg_examples),
        "bbreg_examples": bbreg_examples,
        "walks": init_walks, "fc_post_init": fc_post_init,
    }

    import torch as _t
    result = [np.array(gt[0], np.float64)]
    result_bb = [np.array(gt[0], np.float64)]
    cap = {"frames": []}

    for i in range(1, len(frames_vis)):
        target_bbox = np.array(gt[i - 1], np.float64)   # teacher-forced
        fr = {"trans_pre": float(sample_generator.trans_f)}
        samples = gen(sample_generator, target_bbox, opts["n_samples"])
        scores = fwd(i, samples, out_layer="fc6")
        top_scores, top_idx = scores[:, 1].topk(5)
        top_idx = top_idx.cpu().numpy()
        target_score = float(top_scores.mean())
        tb = samples[top_idx].mean(axis=0)
        success = target_score > opts["success_thr"]
        if success:
            sample_generator.set_trans_f(opts["trans_f"])
        else:
            sample_generator.set_trans_f(opts["trans_f_expand"])
        fr["trans_post"] = float(sample_generator.trans_f)
        if success:
            bb_samples = samples[top_idx]
            bb_feats = fwd(i, bb_samples)
            bbreg_bbox = bbreg.predict(bb_feats, bb_samples).mean(axis=0)
        else:
            bbreg_bbox = tb
        if not success:
            # revert both to the previous frame's results (:252-256)
            tb = result[i - 1]
            bbreg_bbox = result_bb[i - 1]
        result.append(np.array(tb, np.float64))
        result_bb.append(np.array(bbreg_bbox, np.float64))
        fr.update({"samples": samples,
                   "scores": scores[:, 1].numpy().copy(),
                   "top_idx": np.array(top_idx),
                   "target_score": target_score, "success": bool(success),
                   "raw_box": np.array(tb, np.float64),
                   "bbreg_box": np.array(bbreg_bbox, np.float64)})
        if success:
            pos_ex = gen(pos_generator, np.array(tb), opts["n_pos_update"],
                         opts["overlap_pos_update"])
            neg_ex = gen(neg_generator, np.array(tb), opts["n_neg_update"],
                         opts["overlap_neg_update"])
            assert len(pos_ex) == opts["n_pos_update"], "pos underfill"
            assert len(neg_ex) == opts["n_neg_update"], "neg underfill"
            pos_all.append(fwd(i, pos_ex))
            neg_all.append(fwd(i, neg_ex))
            if len(pos_all) > opts["n_frames_long"]:
                del pos_all[0]
            if len(neg_all) > opts["n_frames_short"]:
                del neg_all[0]
            fr["pos_examples"], fr["neg_examples"] = pos_ex, neg_ex
        else:
            fr["pos_examples"] = fr["neg_examples"] = None

        did_update, walks, window_start = False, None, 0
        if not success:
            nframes = min(opts["n_frames_short"], len(pos_all))
            window_start = len(pos_all) - nframes
            pd = _t.stack(pos_all[-nframes:], 0).view(-1, pos_all[0].size(-1))
            nd = _t.stack(neg_all, 0).view(-1, neg_all[0].size(-1))
            with _PermRecorder() as rec:
                rt_mod.train(model, criterion, update_opt, pd, nd,
                             opts["maxiter_update"])
            walks = rec.walks(pd.shape[0], nd.shape[0],
                              opts["maxiter_update"], opts["batch_pos"],
                              max(opts["batch_neg_cand"], opts["batch_neg"]))
            did_update = True
        elif i % opts["long_interval"] == 0:
            pd = _t.stack(pos_all, 0).view(-1, pos_all[0].size(-1))
            nd = _t.stack(neg_all, 0).view(-1, neg_all[0].size(-1))
            with _PermRecorder() as rec:
                rt_mod.train(model, criterion, update_opt, pd, nd,
                             opts["maxiter_update"])
            walks = rec.walks(pd.shape[0], nd.shape[0],
                              opts["maxiter_update"], opts["batch_pos"],
                              max(opts["batch_neg_cand"], opts["batch_neg"]))
            did_update = True
        fr["did_update"] = did_update
        fr["walks"] = walks
        fr["window_start"] = window_start
        fr["n_pos_frames"] = len(pos_all)
        fr["n_neg_frames"] = len(neg_all)
        fr["neg_writes"] = 1 + sum(1 for f in cap["frames"]
                                   if f["success"]) + int(fr["success"])
        fc_w, fc_m = _torch_fc_state(model, update_opt)
        fr["fc_post"], fr["mom_post"] = fc_w, fc_m
        cap["frames"].append(fr)
        _log(f"[ref] frame {i} done (success={success})")

    import utils as manet_utils   # modules/utils.py (shadowing order)
    return state_dict0, opts, init_cap, cap["frames"], manet_utils.crop_image


def run_ours(sd0, opts, init_cap, frames_cap, crop_fn, frames_vis,
             frames_event, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_manet_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.mdnet import MDNet
    from mmtrack_tpu.trackers.mdnet_tracker import (
        MDNetRuntime, mdnet_init_from_patches, mdnet_step_from_patches)

    rt = MDNetRuntime(
        n_samples=opts["n_samples"],
        n_init_pos=opts["n_pos_init"], n_init_neg=opts["n_neg_init"],
        init_iters=opts["maxiter_init"], lr_init=opts["lr_init"],
        update_iters=opts["maxiter_update"], lr_update=opts["lr_update"],
        n_frames_short=opts["n_frames_short"],
        n_frames_long=opts["n_frames_long"],
        long_interval=opts["long_interval"],
        trans=opts["trans_f"], trans_f_expand=opts["trans_f_expand"],
        scale_bbreg=1.5, scale_pos=1.2, trans_neg=1.5, scale_neg=1.2,
        loss_sum=True, manet_seed_memory=True, bbreg_reject=True,
        revert_on_failure=True, hard_trans_expand=True)
    model = MDNet(mode="adapter")
    x = jnp.zeros((1, 107, 107, 6))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_manet_checkpoint(sd0))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    def fc_tree(sd):
        conv, _, _ = load_into(
            {k: zeros[k] for k in zeros if k.startswith("fc")},
            convert_manet_checkpoint(sd))
        return jax.tree.map(jnp.asarray, conv)

    def crops(i, samples):
        out = np.zeros((len(samples), 107, 107, 6), np.float32)
        for k, s in enumerate(samples):
            out[k, :, :, :3] = crop_fn(frames_vis[i], s, 107, 16)
            out[k, :, :, 3:] = crop_fn(frames_event[i], s, 107, 16)
        return jnp.asarray(out)

    H, W = frames_vis.shape[1], frames_vis.shape[2]

    init_fn = jax.jit(partial(mdnet_init_from_patches, rt, model,
                              dropout=False))
    step_fn = jax.jit(partial(mdnet_step_from_patches, rt, model,
                              dropout=False), static_argnames=("im_hw",))

    state = init_fn(
        P, jnp.asarray(gt[0], jnp.float32),
        crops(0, init_cap["pos_examples"]),
        crops(0, init_cap["neg_examples"]),
        crops(0, init_cap["bbreg_examples"]),
        jnp.asarray(init_cap["bbreg_examples"], jnp.float32),
        None,                      # MANet: memories seeded from init slices
        jax.random.PRNGKey(0),
        inject_idx=tuple(jnp.asarray(w, jnp.int32)
                         for w in init_cap["walks"]))
    _log("[ours] init done")
    ref_fc0 = fc_tree(init_cap["fc_post_init"])
    init_fc_dev = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state["fc"]),
                        jax.tree.leaves(ref_fc0)))

    out = {"init_fc_dev": init_fc_dev, "frames": []}
    n_upd = rt.update_iters
    zero_walks = (jnp.zeros((n_upd, rt.batch_pos), jnp.int32),
                  jnp.zeros((n_upd, rt.batch_neg_cand), jnp.int32))

    ref_result = [np.array(gt[0], np.float64)]
    ref_result_bb = [np.array(gt[0], np.float64)]

    for t, fr in enumerate(frames_cap, start=1):
        # teacher-force the sampling box + resync the revert history to the
        # reference's own result/result_bb (run_tracker.py:252-256 reads
        # result[i-1]/result_bb[i-1], which the reference itself wrote)
        state = {**state,
                 "box": jnp.asarray(ref_result[t - 1], jnp.float32),
                 "report_box": jnp.asarray(ref_result_bb[t - 1], jnp.float32),
                 "trans_f": jnp.asarray(fr["trans_pre"], jnp.float32),
                 "frame_num": jnp.asarray(t - 1, jnp.int32)}
        if fr["walks"] is not None:
            pos_w, negc_w = fr["walks"]
            # every pool entry (incl. the seeded entry 0) is a uniform
            # n_pos_update-row entry, and our flat pool is
            # [seed(50), ring...] in list order — the stacked-window row r
            # maps to flat row window_start*50 + r
            pos_w = fr["window_start"] * rt.n_pos_update + pos_w
            Ln = rt.n_frames_short
            e = negc_w // rt.n_neg_update
            w = fr["neg_writes"] - fr["n_neg_frames"] + e
            negc_w = (w % Ln) * rt.n_neg_update + negc_w % rt.n_neg_update
            inj = (jnp.asarray(pos_w, jnp.int32),
                   jnp.asarray(negc_w, jnp.int32))
        else:
            inj = zero_walks
        pos_p = (crops(t, fr["pos_examples"]) if fr["pos_examples"]
                 is not None else jnp.zeros((rt.n_pos_update, 107, 107, 6)))
        neg_p = (crops(t, fr["neg_examples"]) if fr["neg_examples"]
                 is not None else jnp.zeros((rt.n_neg_update, 107, 107, 6)))
        state, box, mean_score, aux = step_fn(
            P, state, jnp.asarray(fr["samples"], jnp.float32),
            crops(t, fr["samples"]), pos_p, neg_p,
            im_hw=(float(H), float(W)), inject_idx=inj)

        # our reported boxes this frame (post-revert semantics)
        our_raw = np.asarray(state["box"], np.float64)
        our_bb = np.asarray(box, np.float64)
        ref_result.append(np.asarray(fr["raw_box"], np.float64))
        ref_result_bb.append(np.asarray(fr["bbreg_box"], np.float64))

        fc_dev = -1.0
        if fr["did_update"]:
            ref_fc = fc_tree(fr["fc_post"])
            fc_dev = max(float(jnp.abs(a - b).max())
                         for a, b in zip(jax.tree.leaves(state["fc"]),
                                         jax.tree.leaves(ref_fc)))
        out["frames"].append({
            "scores": np.asarray(aux["scores"]),
            "success": bool(aux["success"]),
            "did_update": bool(aux["do_update"]),
            "raw_box": our_raw,
            "refined": our_bb,
            "top_idx": np.sort(np.asarray(aux["top_idx"])),
            "fc_dev": fc_dev,
            "trans_post": float(state["trans_f"]),
        })
        state["fc"] = fc_tree(fr["fc_post"])
        if fr["mom_post"]:
            state["momentum"] = fc_tree(fr["mom_post"])
        _log(f"[ours] frame {t} done")
    return out


def run_phase(frames_vis, frames_event, gt, seed, override,
              require_updates, require_failures=0):
    sd0, opts, init_cap, frames_cap, crop_fn = run_reference(
        frames_vis, frames_event, gt, seed, override)
    ours = run_ours(sd0, opts, init_cap, frames_cap, crop_fn,
                    frames_vis, frames_event, gt)

    n = len(frames_cap)
    score_dev, box_dev, bbreg_dev, fc_devs = [], [], [], []
    flag_mismatch, top_mismatch, update_mismatch = [], [], []
    top_excused, succ_excused = [], []
    for t in range(n):
        ref, got = frames_cap[t], ours["frames"][t]
        score_dev.append(float(np.abs(ref["scores"] - got["scores"]).max()))
        srt = np.sort(ref["scores"])[::-1]
        if srt[4] - srt[5] < EPS_TOP:
            top_excused.append(t)
        elif not np.array_equal(np.sort(ref["top_idx"]), got["top_idx"]):
            top_mismatch.append(t)
        if abs(ref["target_score"]) < EPS_SUCCESS:
            succ_excused.append(t)
        elif ref["success"] != got["success"]:
            flag_mismatch.append(t)
        if ref["did_update"] != got["did_update"]:
            update_mismatch.append(t)
        if t not in top_mismatch and t not in top_excused:
            box_dev.append(float(np.abs(ref["raw_box"]
                                        - got["raw_box"]).max()))
            bbreg_dev.append(float(np.abs(ref["bbreg_box"]
                                          - got["refined"]).max()))
        if got["fc_dev"] >= 0:
            fc_devs.append(got["fc_dev"])
    trans_dev = max(abs(frames_cap[t]["trans_post"]
                        - ours["frames"][t]["trans_post"])
                    for t in range(n))
    n_fail = sum(1 for f in frames_cap if not f["success"])

    return {
        "constants": {"init": f"{opts['n_pos_init']}/{opts['n_neg_init']}"
                              f"x{opts['maxiter_init']}",
                      "update": f"{opts['maxiter_update']}it "
                                f"{opts['batch_pos']}p/"
                                f"{opts['batch_neg']}of"
                                f"{opts['batch_neg_cand']}n "
                                f"lr{opts['lr_update']}",
                      "n_samples": opts["n_samples"],
                      "long_interval": opts["long_interval"],
                      "n_frames_short": opts["n_frames_short"],
                      "loss": "sum"},
        "frames_tracked": n,
        "init_fc_dev": ours["init_fc_dev"],
        "max_score_dev": max(score_dev),
        "max_box_dev_px": max(box_dev) if box_dev else -1.0,
        "max_bbreg_dev_px": max(bbreg_dev) if bbreg_dev else -1.0,
        "max_update_fc_dev": max(fc_devs) if fc_devs else -1.0,
        "max_trans_dev": trans_dev,
        "n_updates": len(fc_devs),
        "successes": n - n_fail,
        "failures": n_fail,
        "top5_mismatches": top_mismatch,
        "top5_excused": top_excused,
        "success_mismatches": flag_mismatch,
        "success_excused": succ_excused,
        "update_flag_mismatches": update_mismatch,
        "pass": bool(
            max(score_dev) <= TOL_SCORE
            and (not box_dev or max(box_dev) <= TOL_BOX)
            and (not bbreg_dev or max(bbreg_dev) <= TOL_BBREG)
            and ours["init_fc_dev"] <= TOL_FC
            and (not fc_devs or max(fc_devs) <= TOL_FC)
            and trans_dev <= 1e-6
            and len(fc_devs) >= require_updates
            and n_fail >= require_failures
            and not top_mismatch and not flag_mismatch
            and not update_mismatch
            and len(top_excused) + len(succ_excused) <= 0.3 * n),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true",
                    help="shrink init to 100/500/10 for iteration")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(
        n_frames=args.frames, height=240, width=320, seed=args.seed,
        channels=6)
    frames_vis = np.ascontiguousarray(frames[..., :3])
    frames_event = np.ascontiguousarray(frames[..., 3:])

    base = {"long_interval": 3}
    if args.fast:
        base.update({"n_pos_init": 100, "n_neg_init": 500,
                     "maxiter_init": 10})

    # Phase A: success path — long-term updates, collection, reject-bbreg.
    phase_a = run_phase(frames_vis, frames_event, gt, args.seed, dict(base),
                        require_updates=2)
    # Phase B: failure path — gt jumps to background from frame 3:
    # short-term window remap, hard trans set, revert-to-previous boxes.
    gt_fail = gt.copy()
    gt_fail[3:, 0] = 8.0
    gt_fail[3:, 1] = 8.0
    nf = min(args.frames, 7)
    phase_b = run_phase(frames_vis[:nf], frames_event[:nf], gt_fail[:nf],
                        args.seed, dict(base, n_frames_short=2),
                        require_updates=2, require_failures=2)

    res = {
        "family": "manet-online-trajectory",
        "success_phase": phase_a,
        "failure_phase": phase_b,
        "pass": bool(phase_a["pass"] and phase_b["pass"]),
        "tol": {"score": TOL_SCORE, "box": TOL_BOX, "bbreg": TOL_BBREG,
                "fc": TOL_FC},
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
