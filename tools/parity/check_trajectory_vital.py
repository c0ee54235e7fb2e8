"""Trajectory-level A/B: the reference's own pyVITAL online protocol vs ours.

Runs the reference's ACTUAL building blocks — RGBE/models/pyVITAL/tracking/
run_tracker.py's forward_samples + train() (the focal-form BCELoss from
modules/model.py:159-171, the ASDN adversarial positive masking at
train():83-151), gnet.g_init.NetG + g_pretrain, BBRegressor, samples from
modules.sample_generator, crops from modules.utils.crop_image2 — in the
exact run_vital loop order (run_tracker.py:199-420), side by side with
mmtrack_tpu's functional protocol on the same synthetic RGB+event sequence
and the same converted weights.

pyVITAL protocol deltas vs pyMDNet this harness pins:

  - fc6 merges the two streams by SUM (Linear(512,2) on x_vis + x_event,
    model.py:67,137) where pyMDNet concatenates — MDNet(fc6_merge='sum');
  - BCELoss is focal-form: (1-p) * (-log p) per sample on both terms,
    combined-count mean (model.py:159-171) — for init AND online updates
    (rt.loss_focal);
  - long-term updates train the classifier on ASDN-MASKED positives
    (train(model, model_g, ...) at run_tracker.py:382); short-term/failure
    updates pass model_g=None (:373);
  - lr_init 5e-3, lr_update 5e-4 (tracking/options.yaml).

The reference's per-iteration ASDN drop masks are captured from its own
model_g eval calls and INJECTED into our step (inject_masks), so the
masked-positive classifier update is compared exactly. The G network's own
training dynamics are NOT compared — deliberately: the reference's G phase
trains on features its 9-cell probe loop has already zeroed IN PLACE
(train():160-175 mutates batch_pos_feats cumulatively through tensor
views, so model_g's MSE input at :187 is all-zeros; g_pretrain.py:43-44
has the same defect, training G's bias alone). Our GNet (models/vital.py)
is the documented redesign: per-sample masks from LIVE features, a
persistent G optimizer, and a supervised pretrain on per-cell damage
probes of unmutated features. The classifier-side protocol — what decides
boxes — is what this harness proves equivalent.

Both sides consume byte-identical crops and identical captured batch index
streams; dropout p=0 on both sides (the MDNet fc dropouts AND NetG's, so
the captured masks are deterministic); torch.Tensor.cuda is bridged to a
no-op (the reference's loss/G code calls .cuda() unconditionally —
model.py:162, run_tracker.py:187 — and cannot run on a CPU-only box as
shipped). Teacher-forced from gt; fc weights + momentum resync each
transition.

Run: python tools/parity/check_trajectory_vital.py [--frames 8] [--fast]
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

TOL_SCORE = 5e-3      # frame-1 margins ride the init-trained fc; see the
                      # pyMDNet harness note (init_fc_dev through a
                      # 512-dim summed fc6 dot)
TOL_BOX = 1e-2
TOL_BBREG = 0.05
TOL_FC = 5e-3
EPS_TOP = 1e-4
EPS_SUCCESS = 1e-4


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _load_ref():
    """Import pyVITAL's run_tracker with cwd at the pyVITAL root (its
    options/gnet paths are './tracking/options.yaml' and './gnet')."""
    root = os.path.join(REFERENCE_ROOT, "RGBE", "models", "pyVITAL")
    os.environ.setdefault("MPLBACKEND", "Agg")
    import scipy.misc as _sm
    if not hasattr(_sm, "imresize"):   # modules/utils.py legacy import
        def _imresize(arr, size, interp="bilinear"):
            from PIL import Image
            im = Image.fromarray(np.asarray(arr))
            if np.isscalar(size):
                wh = (int(im.width * size), int(im.height * size))
            else:
                wh = (int(size[1]), int(size[0]))
            return np.asarray(im.resize(wh, Image.BILINEAR))
        _sm.imresize = _imresize
    import torch
    # the reference calls .cuda() unconditionally in BCELoss (model.py:162)
    # and the G phase (run_tracker.py:187) — no-op bridge for CPU
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, os.path.join(root, "tracking"))
    sys.path.insert(0, os.path.join(root, "gnet"))
    sys.path.insert(0, root)
    cwd = os.getcwd()
    os.chdir(root)
    try:
        spec = importlib.util.spec_from_file_location(
            "pyvital_run_tracker", os.path.join(root, "tracking",
                                                "run_tracker.py"))
        rt_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rt_mod)
    finally:
        os.chdir(cwd)
    orig_extract = rt_mod.RegionExtractor.extract_regions

    def extract_contig(self, index):
        rv, re_ = orig_extract(self, index)
        return np.ascontiguousarray(rv), np.ascontiguousarray(re_)

    rt_mod.RegionExtractor.extract_regions = extract_contig
    return rt_mod


class _PermRecorder:
    """Capture np.random.permutation outputs around a reference train()
    call (run_tracker.py:60-81 pointer walk, same as pyMDNet)."""

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


def _torch_fc_state(model, optimizer):
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()
          if ".fc" in k or k.startswith("branches")}
    bufs = {}
    name_of = {id(p): n for n, p in model.get_learnable_params().items()}
    key_map = {"fc4_weight": "layers.fc4.0.weight",
               "fc4_bias": "layers.fc4.0.bias",
               "fc5_weight": "layers.fc5.1.weight",
               "fc5_bias": "layers.fc5.1.bias",
               "fc6_0_weight": "branches.0.1.weight",
               "fc6_0_bias": "branches.0.1.bias"}
    for group in optimizer.param_groups:
        for p in group["params"]:
            st = optimizer.state.get(p, {})
            buf = st.get("momentum_buffer")
            if buf is not None:
                bufs[key_map[name_of[id(p)]]] = buf.detach().numpy().copy()
    return sd, bufs


def _mask_from_evals(res_list):
    """Rebuild the reference's per-iteration ASDN mask from its captured
    model_g eval outputs, replicating train():107-133 exactly: per sample,
    the 3 lowest of the 9 G responses are zeroed — into ONE mask shared
    batch-wide (the python loop writes mask_asdn[:, :, col, row] = 0 for
    ALL rows), with the transposed (col, row) spatial indexing quirk.
    Returns one (3, 3) float mask (1 = keep)."""
    res = np.asarray(res_list)  # (B, 9)
    m = np.ones((3, 3), np.float32)
    for i in range(res.shape[0]):
        idl = np.argsort(res[i].reshape(9))[:3]
        for idx in idl:
            row, col = idx // 3, idx % 3
            m[col, row] = 0.0   # mask_asdn[:, :, col, row] = 0
    return m


def run_reference(frames_vis, frames_event, gt, seed, opts_override):
    import torch

    rt_mod = _load_ref()
    opts = rt_mod.opts
    opts["use_gpu"] = False
    opts.update(opts_override)
    np.random.seed(seed)
    torch.manual_seed(seed)

    model = rt_mod.MDNet(None, K=1)
    model_g = rt_mod.NetG()
    for mod in list(model.modules()) + list(model_g.modules()):
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    model.set_learnable_params(opts["ft_layers"])
    model_g.set_learnable_params(opts["ft_layers"])
    criterion = rt_mod.BCELoss()
    criterion_g = torch.nn.MSELoss(reduction="mean")
    init_opt = rt_mod.set_optimizer(model, opts["lr_init"], opts["lr_mult"])
    update_opt = rt_mod.set_optimizer(model, opts["lr_update"],
                                      opts["lr_mult"])
    state_dict0 = {k: v.detach().numpy().copy()
                   for k, v in model.state_dict().items()}

    # capture G's eval-mode outputs (the mask sources in train():108)
    g_evals = []
    orig_g_forward = model_g.forward

    def g_forward(x):
        out = orig_g_forward(x)
        if not model_g.training:
            g_evals.append(out.detach().numpy().copy())
        return out

    model_g.forward = g_forward

    SG = rt_mod.SampleGenerator
    from PIL import Image
    img_vis = [Image.fromarray(f) for f in frames_vis]
    img_event = [Image.fromarray(f) for f in frames_event]
    img_size = img_vis[0].size

    def fwd(i, samples, out_layer="conv3"):
        return rt_mod.forward_samples(model, img_vis[i], img_event[i],
                                      samples, out_layer=out_layer)

    target_bbox = np.array(gt[0], np.float64)
    # ---- init (run_tracker.py:228-268): pos/neg draws, init train
    # (model_g=None), g_pretrain, bbreg, update generators + neg_upd
    pos_examples = SG("gaussian", img_size, opts["trans_pos"],
                      opts["scale_pos"])(target_bbox, opts["n_pos_init"],
                                         opts["overlap_pos_init"])
    neg_examples = np.concatenate([
        SG("uniform", img_size, opts["trans_neg_init"],
           opts["scale_neg_init"])(target_bbox,
                                   int(opts["n_neg_init"] * 0.5),
                                   opts["overlap_neg_init"]),
        SG("whole", img_size)(target_bbox, int(opts["n_neg_init"] * 0.5),
                              opts["overlap_neg_init"])])
    neg_examples = np.random.permutation(neg_examples)
    pos_fv, pos_fe = fwd(0, pos_examples)
    neg_fv, neg_fe = fwd(0, neg_examples)
    _log("[ref] init training")
    with _PermRecorder() as rec:
        rt_mod.train(model, None, criterion, init_opt, pos_fv, pos_fe,
                     neg_fv, neg_fe, opts["maxiter_init"])
    init_walks = rec.walks(len(pos_examples), len(neg_examples),
                           opts["maxiter_init"], opts["batch_pos"],
                           max(opts["batch_neg_cand"], opts["batch_neg"]))
    fc_post_init, _ = _torch_fc_state(model, init_opt)
    # g_pretrain runs the reference's own G warmup (its probe loop zeroes
    # pos_fv+pos_fe's SUM tensor, not the per-stream pools — those stay
    # intact for the classifier memories below)
    _log("[ref] g_pretrain")
    rt_mod.g_pretrain(model, model_g, criterion_g, pos_fv + pos_fe)

    bbreg_examples = SG("uniform", img_size, opts["trans_bbreg"],
                        opts["scale_bbreg"], opts["aspect_bbreg"])(
        target_bbox, opts["n_bbreg"], opts["overlap_bbreg"])
    bb_fv, bb_fe = fwd(0, bbreg_examples)
    bbreg = rt_mod.BBRegressor(img_size)
    bbreg.train(bb_fv + bb_fe, bbreg_examples, target_bbox)

    sample_generator = SG("gaussian", img_size, opts["trans"], opts["scale"])
    pos_generator = SG("gaussian", img_size, opts["trans_pos"],
                       opts["scale_pos"])
    neg_generator = SG("uniform", img_size, opts["trans_neg"],
                       opts["scale_neg"])
    neg_upd = neg_generator(target_bbox, opts["n_neg_update"],
                            opts["overlap_neg_init"])
    nf_v, nf_e = fwd(0, neg_upd)
    pos_all_v, pos_all_e = [pos_fv], [pos_fe]
    neg_all_v, neg_all_e = [nf_v], [nf_e]

    init_cap = {
        "pos_examples": pos_examples, "neg_examples": neg_examples,
        "bbreg_examples": bbreg_examples, "neg_upd_examples": neg_upd,
        "walks": init_walks, "fc_post_init": fc_post_init,
    }

    import torch as _t
    cap = {"frames": []}
    for i in range(1, len(frames_vis)):
        target_bbox = np.array(gt[i - 1], np.float64)
        fr = {"trans_pre": float(sample_generator.trans)}
        samples = sample_generator(target_bbox, opts["n_samples"])
        scores, _ = fwd(i, samples, out_layer="fc6")
        scores = scores.numpy()
        top_scores, top_idx = torch.from_numpy(scores[:, 1]).topk(5)
        top_scores, top_idx = top_scores.numpy(), top_idx.numpy()
        target_score = float(top_scores.mean())
        success = target_score > 0
        tb = samples[top_idx]
        tb = tb.mean(axis=0) if top_idx.shape[0] > 1 else tb
        if success:
            sample_generator.set_trans(opts["trans"])
        else:
            sample_generator.expand_trans(opts["trans_limit"])
        fr["trans_post"] = float(sample_generator.trans)
        if success:
            bb_samples = samples[top_idx]
            bb_v, bb_e = fwd(i, bb_samples)
            bbreg_bbox = bbreg.predict(bb_v + bb_e, bb_samples).mean(axis=0)
        else:
            bbreg_bbox = tb
        fr.update({"samples": samples, "scores": scores[:, 1].copy(),
                   "top_idx": np.array(top_idx), "target_score": target_score,
                   "success": bool(success), "raw_box": np.array(tb),
                   "bbreg_box": np.array(bbreg_bbox)})
        if success:
            pos_ex = pos_generator(np.array(tb), opts["n_pos_update"],
                                   opts["overlap_pos_update"])
            pv, pe = fwd(i, pos_ex)
            pos_all_v.append(pv)
            pos_all_e.append(pe)
            if len(pos_all_v) > opts["n_frames_long"]:
                del pos_all_v[0], pos_all_e[0]
            neg_ex = neg_generator(np.array(tb), opts["n_neg_update"],
                                   opts["overlap_neg_update"])
            nv, ne = fwd(i, neg_ex)
            neg_all_v.append(nv)
            neg_all_e.append(ne)
            if len(neg_all_v) > opts["n_frames_short"]:
                del neg_all_v[0], neg_all_e[0]
            fr["pos_examples"], fr["neg_examples"] = pos_ex, neg_ex
        else:
            fr["pos_examples"] = fr["neg_examples"] = None

        did_update, walks, window_start, masks = False, None, 0, None
        if not success:
            # short-term update: model_g = None (run_tracker.py:373)
            nframes = min(opts["n_frames_short"], len(pos_all_v))
            window_start = len(pos_all_v) - nframes
            pd_v = _t.cat(pos_all_v[-nframes:], 0)
            pd_e = _t.cat(pos_all_e[-nframes:], 0)
            nd_v = _t.cat(neg_all_v, 0)
            nd_e = _t.cat(neg_all_e, 0)
            with _PermRecorder() as rec:
                rt_mod.train(model, None, criterion, update_opt, pd_v, pd_e,
                             nd_v, nd_e, opts["maxiter_update"])
            walks = rec.walks(pd_v.shape[0], nd_v.shape[0],
                              opts["maxiter_update"], opts["batch_pos"],
                              max(opts["batch_neg_cand"], opts["batch_neg"]))
            did_update = True
        elif i % opts["long_interval"] == 0:
            # long-term update WITH the adversarial G (run_tracker.py:382)
            pd_v = _t.cat(pos_all_v, 0)
            pd_e = _t.cat(pos_all_e, 0)
            nd_v = _t.cat(neg_all_v, 0)
            nd_e = _t.cat(neg_all_e, 0)
            g_evals.clear()
            with _PermRecorder() as rec:
                rt_mod.train(model, model_g, criterion, update_opt,
                             pd_v, pd_e, nd_v, nd_e,
                             opts["maxiter_update"])
            walks = rec.walks(pd_v.shape[0], nd_v.shape[0],
                              opts["maxiter_update"], opts["batch_pos"],
                              max(opts["batch_neg_cand"], opts["batch_neg"]))
            assert len(g_evals) == opts["maxiter_update"], \
                f"captured {len(g_evals)} G eval calls"
            masks = np.stack([_mask_from_evals(r) for r in g_evals])
            did_update = True
        fr["did_update"] = did_update
        fr["walks"] = walks
        fr["masks"] = masks
        fr["window_start"] = window_start
        fr["n_pos_frames"] = len(pos_all_v)
        fr["n_neg_frames"] = len(neg_all_v)
        fr["neg_writes"] = 1 + sum(1 for f in cap["frames"]
                                   if f["success"]) + int(fr["success"])
        fc_w, fc_m = _torch_fc_state(model, update_opt)
        fr["fc_post"], fr["mom_post"] = fc_w, fc_m
        cap["frames"].append(fr)
        _log(f"[ref] frame {i} done (success={success}, "
             f"G={'on' if masks is not None else 'off'})")

    import modules.utils as ref_utils
    return state_dict0, opts, init_cap, cap["frames"], ref_utils.crop_image2


def run_ours(sd0, opts, init_cap, frames_cap, crop_fn, frames_vis,
             frames_event, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.convert import (convert_mdnet_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.mdnet import MDNet
    from mmtrack_tpu.trackers.mdnet_tracker import (
        MDNetRuntime, mdnet_init_from_patches, mdnet_step_from_patches)

    rt = MDNetRuntime(
        n_init_pos=opts["n_pos_init"], n_init_neg=opts["n_neg_init"],
        init_iters=opts["maxiter_init"], lr_init=opts["lr_init"],
        update_iters=opts["maxiter_update"], lr_update=opts["lr_update"],
        n_frames_short=opts["n_frames_short"],
        n_frames_long=opts["n_frames_long"],
        long_interval=opts["long_interval"],
        loss_focal=True)
    model = MDNet(mode="dual", num_branches=1, fc6_merge="sum")
    x = jnp.zeros((1, 107, 107, 6))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_mdnet_checkpoint(sd0))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    def fc_tree(sd):
        conv, _, _ = load_into(
            {k: zeros[k] for k in zeros if k.startswith("fc")},
            convert_mdnet_checkpoint(sd))
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
        crops(0, init_cap["neg_upd_examples"]),
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
    ones_masks = np.ones((n_upd, rt.batch_pos, 3, 3), np.float32)

    for t, fr in enumerate(frames_cap, start=1):
        state = {**state,
                 "box": jnp.asarray(gt[t - 1], jnp.float32),
                 "trans_f": jnp.asarray(fr["trans_pre"], jnp.float32),
                 "frame_num": jnp.asarray(t - 1, jnp.int32)}
        if fr["walks"] is not None:
            pos_w, negc_w = fr["walks"]
            if not fr["success"] and fr["window_start"] > 0:
                pos_w = (rt.n_init_pos
                         + (fr["window_start"] - 1) * rt.n_pos_update
                         + pos_w)
            Ln = rt.n_frames_short
            e = negc_w // rt.n_neg_update
            w = fr["neg_writes"] - fr["n_neg_frames"] + e
            negc_w = (w % Ln) * rt.n_neg_update + negc_w % rt.n_neg_update
            inj = (jnp.asarray(pos_w, jnp.int32),
                   jnp.asarray(negc_w, jnp.int32))
        else:
            inj = zero_walks
        if fr["masks"] is not None:
            # reference mask is one (3,3) shared batch-wide per iter
            masks = np.broadcast_to(
                fr["masks"][:, None, :, :],
                (n_upd, rt.batch_pos, 3, 3)).astype(np.float32)
        else:
            masks = ones_masks
        pos_p = (crops(t, fr["pos_examples"]) if fr["pos_examples"]
                 is not None else jnp.zeros((rt.n_pos_update, 107, 107, 6)))
        neg_p = (crops(t, fr["neg_examples"]) if fr["neg_examples"]
                 is not None else jnp.zeros((rt.n_neg_update, 107, 107, 6)))
        state, box, mean_score, aux = step_fn(
            P, state, jnp.asarray(fr["samples"], jnp.float32),
            crops(t, fr["samples"]), pos_p, neg_p,
            im_hw=(float(H), float(W)), inject_idx=inj,
            inject_masks=jnp.asarray(masks))

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
            "raw_box": np.asarray(aux["raw_box"], np.float64),
            "refined": np.asarray(aux["refined"], np.float64),
            "top_idx": np.sort(np.asarray(aux["top_idx"])),
            "fc_dev": fc_dev,
            "masked": fr["masks"] is not None,
            "trans_post": float(state["trans_f"]),
        })
        state["fc"] = fc_tree(fr["fc_post"])
        if fr["mom_post"]:
            state["momentum"] = fc_tree(fr["mom_post"])
        _log(f"[ours] frame {t} done")
    return out


def run_phase(frames_vis, frames_event, gt, seed, override,
              require_updates, require_failures=0, require_masked=0):
    sd0, opts, init_cap, frames_cap, crop_fn = run_reference(
        frames_vis, frames_event, gt, seed, override)
    ours = run_ours(sd0, opts, init_cap, frames_cap, crop_fn,
                    frames_vis, frames_event, gt)

    n = len(frames_cap)
    score_dev, box_dev, bbreg_dev, fc_devs, masked_fc_devs = [], [], [], [], []
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
            if ref["success"]:
                bbreg_dev.append(float(np.abs(ref["bbreg_box"]
                                              - got["refined"]).max()))
        if got["fc_dev"] >= 0:
            fc_devs.append(got["fc_dev"])
            if got["masked"]:
                masked_fc_devs.append(got["fc_dev"])
    trans_dev = max(abs(frames_cap[t]["trans_post"]
                        - ours["frames"][t]["trans_post"])
                    for t in range(n))
    n_fail = sum(1 for f in frames_cap if not f["success"])

    return {
        "constants": {"init": f"{opts['n_pos_init']}/{opts['n_neg_init']}"
                              f"x{opts['maxiter_init']}",
                      "update": f"{opts['maxiter_update']}it "
                                f"lr{opts['lr_update']}",
                      "loss": "focal(g=1)", "fc6_merge": "sum",
                      "long_interval": opts["long_interval"],
                      "n_frames_short": opts["n_frames_short"]},
        "frames_tracked": n,
        "init_fc_dev": ours["init_fc_dev"],
        "max_score_dev": max(score_dev),
        "max_box_dev_px": max(box_dev) if box_dev else -1.0,
        "max_bbreg_dev_px": max(bbreg_dev) if bbreg_dev else -1.0,
        "max_update_fc_dev": max(fc_devs) if fc_devs else -1.0,
        "max_masked_update_fc_dev": (max(masked_fc_devs)
                                     if masked_fc_devs else -1.0),
        "max_trans_dev": trans_dev,
        "n_updates": len(fc_devs),
        "n_masked_updates": len(masked_fc_devs),
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
            and len(masked_fc_devs) >= require_masked
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

    # Phase A: success path — ASDN-masked long-term updates (G engaged).
    phase_a = run_phase(frames_vis, frames_event, gt, args.seed, dict(base),
                        require_updates=2, require_masked=2)
    # Phase B: failure path — short-term updates without G, expand walk.
    gt_fail = gt.copy()
    gt_fail[3:, 0] = 8.0
    gt_fail[3:, 1] = 8.0
    nf = min(args.frames, 7)
    phase_b = run_phase(frames_vis[:nf], frames_event[:nf], gt_fail[:nf],
                        args.seed, dict(base, n_frames_short=2),
                        require_updates=2, require_failures=2)

    res = {
        "family": "pyvital-online-trajectory",
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
