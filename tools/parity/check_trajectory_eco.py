"""Trajectory-level A/B: the reference's own ECO loop vs eco_tracker.

Runs the fork's ACTUAL tracker — keep_track_vot2021/pytracking/tracker/
eco/eco.py::ECO (identical bytes to every AR-external copy) at the
parameter/eco/default.py constants (SPT/external/AR/pytracking/parameter/
eco/default.py) on a randomly-seeded resnet18_vggmconv1 — side by side
with mmtrack_tpu's eco_step_from_patches on the same synthetic sequence
and the same converted backbone weights, per-TRANSITION:

  - both sides consume the SAME 5-scale crops (the reference's
    sample_patch outputs, captured by a hook on the extractor);
  - our full state — position/scale, per-block filters, compressed
    sample memory, sample weights, preconditioner energy, and the online
    CG's carried conjugate direction (p, rho, r_prev) — is resynchronized
    from the reference's recorded post-frame state after every frame, so
    each frame tests the complete step (localization, weightedsum score
    fusion, wraparound max, state clamp, Fourier-shifted memory write,
    min-weight replacement, and the every-train_skipping FilterOptim CG
    with Polak-Ribiere beta + direction_forget_factor carry,
    optimization.py:125-216) from an identical starting point.

The reference stores spectra over the rfft half plane (cfft2 +
rfftshift2); ours are full centered series. `half_to_full` maps between
them by conjugate symmetry; pytracking's inner_prod_fs double-counts the
non-DC columns exactly like the full-plane sum, so rho/alpha/beta in the
two CG iterations are directly comparable (see ops/fourier.py docstring).

Frame count default 12 covers one full train_skipping=10 period: frame 11
runs the online CG (frame_num % 10 == 1), frames 2-10 test the
no-training path (memory write + localization only).

Run: python tools/parity/check_trajectory_eco.py [--frames 12]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import tempfile
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

TOL_SCORE = 1e-4     # fused (5, S, S) score fields per transition
TOL_PX = 0.05        # output box (sub-pixel state arithmetic only; the
                     # argmax grid is integer and must agree exactly)
TOL_FILTER = 1e-5    # post-CG filter (full-spectrum embedding)
TOL_SW = 1e-6        # sample weights after min-weight replacement


def half_to_full(a: np.ndarray) -> np.ndarray:
    """pytracking half-plane spectrum (..., F, Wh, 2) real -> full
    centered complex (..., F, F): X(-ky,-kx) = conj(X(ky,kx))."""
    c = a[..., 0] + 1j * a[..., 1]
    left = np.conj(c[..., ::-1, 1:][..., ::-1])
    return np.concatenate([left, c], axis=-1).astype(np.complex64)


def half_to_full_real(a: np.ndarray) -> np.ndarray:
    """Same embedding for real energy fields (|X(-k)|^2 = |X(k)|^2)."""
    left = a[..., ::-1, 1:][..., ::-1]
    return np.concatenate([left, a], axis=-1).astype(np.float32)


def _ri_np(c: np.ndarray) -> np.ndarray:
    return np.stack([c.real, c.imag], axis=-1).astype(np.float32)


def make_sequence(n_frames: int, seed: int):
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(n_frames=n_frames, height=240,
                                         width=320, seed=seed)
    return np.ascontiguousarray(frames[..., :3]), gt


def run_reference(frames, gt, seed: int = 0, light: bool = False):
    """light=True records only boxes + fused score maps (for the free-run
    A/B): the reference loop here is ALREADY free-running — per-transition
    isolation happens on OUR side by resyncing to its recorded states —
    so the light mode just skips the heavy per-frame state/patch capture
    (59 ECO memory snapshots would be GBs)."""
    import torch

    patch_cuda_to_cpu()
    patch_legacy_fft()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/keep_track_vot2021"):
        backbone_mod = importlib.import_module(
            "ltr.models.backbone.resnet_vggm")
        deep_mod = importlib.import_module("pytracking.features.deep")
        extractor_mod = importlib.import_module(
            "pytracking.features.extractor")
        eco_mod = importlib.import_module("pytracking.tracker.eco.eco")
        params_mod = importlib.import_module("pytracking.utils.params")

        # torch>=2 compat: F.pad rejects float pad amounts (sample_patch
        # passes integral tensor floats) — cast, no math change
        import torch.nn.functional as TF
        real_pad = TF.pad

        def compat_pad(input, pad, *a, **k):
            return real_pad(input, tuple(int(v) for v in pad), *a, **k)

        TF.pad = compat_pad

        # torch>=2 TensorList compat (GaussNewtonCG double-grad)
        real_grad = torch.autograd.grad

        def compat_grad(outputs, inputs, grad_outputs=None, **kw):
            def fix(a):
                return list(a) if isinstance(a, list) else a
            return real_grad(fix(outputs), fix(inputs), fix(grad_outputs),
                             **kw)

        torch.autograd.grad = compat_grad

        torch.manual_seed(seed)
        net = backbone_mod.resnet18_vggmconv1(
            output_layers=["vggconv1", "layer3"])
        net.eval()
        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in net.state_dict().items()}

        # ResNetVGGm1.initialize loads from a file path; give it ours
        with tempfile.NamedTemporaryFile(suffix=".pth",
                                         delete=False) as tmp:
            torch.save(net.state_dict(), tmp.name)
            net_path = tmp.name

        # parameter/eco/default.py verbatim (cpu)
        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.device = "cpu"
        shallow = params_mod.TrackerParams()
        deepp = params_mod.TrackerParams()
        p.max_image_sample_size = 250 ** 2
        p.min_image_sample_size = 200 ** 2
        p.search_area_scale = 4.5
        p.CG_iter = 5
        p.init_CG_iter = 100
        p.init_GN_iter = 10
        p.post_init_CG_iter = 0
        p.fletcher_reeves = False
        p.standard_alpha = True
        p.CG_forgetting_rate = 75
        p.precond_data_param = 0.3
        p.precond_reg_param = 0.15
        p.precond_proj_param = 35
        shallow.learning_rate = 0.025
        deepp.learning_rate = 0.0075
        shallow.output_sigma_factor = 1 / 16
        deepp.output_sigma_factor = 1 / 4
        p.sample_memory_size = 200
        p.train_skipping = 10
        p.scale_factors = 1.02 ** torch.arange(-2, 3).float()
        p.score_upsample_factor = 1
        p.score_fusion_strategy = "weightedsum"
        shallow.translation_weight = 0.4
        deepp.translation_weight = 0.6
        p.augmentation = {
            "fliplr": True,
            "rotate": [5, -5, 10, -10, 20, -20, 30, -30, 45, -45, -60, 60],
            "blur": [(2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2)],
            "shift": [(6, 6), (-6, 6), (6, -6), (-6, -6)],
            "dropout": (7, 0.2)}
        deepp.use_augmentation = True
        shallow.use_augmentation = True
        p.update_projection_matrix = True
        p.projection_reg = 5e-8
        shallow.compressed_dim = 16
        deepp.compressed_dim = 64
        p.interpolation_method = "bicubic"
        p.interpolation_bicubic_a = -0.75
        p.interpolation_centering = True
        p.interpolation_windowing = False
        for fp, wmin, wedge, sp in ((shallow, 1e-4, 10e-3, 0.05),
                                    (deepp, 10e-4, 50e-3, 0.1)):
            fp.use_reg_window = True
            fp.reg_window_min = wmin
            fp.reg_window_edge = wedge
            fp.reg_window_power = 2
            fp.reg_sparsity_threshold = sp
        fparams = params_mod.FeatureParams(
            feature_params=[shallow, deepp])
        features = deep_mod.ResNetVGGm1(
            output_layers=["vggconv1", "layer3"], net_path=net_path,
            base_model="resnet18", use_gpu=False, fparams=fparams,
            pool_stride=[2, 1], normalize_power=2)
        p.features = extractor_mod.MultiResolutionExtractor([features])

        tracker = eco_mod.ECO(p)
        tracker.visdom = None

        def snap_filter():
            return [f.detach().numpy().copy() for f in tracker.filter]

        def snap_cg():
            # FilterOptim's ip is the per-TensorList-entry inner_prod_fs,
            # so p/rho/r_prev are PER-BLOCK quantities (rho is a
            # 2-entry TensorList after the first online run; the initial
            # torch.ones(1) broadcasts to both blocks)
            fo = tracker.filter_optimizer
            rho = [float(v) for v in fo.rho]
            if len(rho) == 1:
                rho = rho * 2
            return {
                "p": (None if fo.p is None
                      else [e.detach().numpy().copy() for e in fo.p]),
                "rho": rho,
                "r_prev": (None if fo.r_prev is None
                           else [e.detach().numpy().copy()
                                 for e in fo.r_prev]),
            }

        def snap_state():
            fo = tracker.filter_optimizer
            return {
                "pos": tracker.pos.numpy().copy(),
                "target_sz": tracker.target_sz.numpy().copy(),
                "target_scale": float(tracker.target_scale),
                "filter": snap_filter(),
                "proj": [P.detach().numpy().copy()
                         for P in tracker.projection_matrix],
                "memory": [m.numpy().copy()
                           for m in tracker.training_samples],
                "sw": [w.numpy().copy() for w in tracker.sample_weights],
                "prev_ind": list(tracker.previous_replace_ind),
                "num_stored": [int(v)
                               for v in tracker.num_stored_samples],
                "se": [e.numpy().copy() for e in fo.sample_energy],
                "cg": snap_cg(),
            }

        H, W = frames.shape[1:3]
        tracker.initialize(
            frames[0], {"init_bbox": [float(v) for v in gt[0]]})
        init = snap_state()
        init["img_sample_sz"] = float(tracker.img_sample_sz[0])
        init["filter_sz"] = [int(v) for v in
                             (tracker.filter_sz[0][0],
                              tracker.filter_sz[1][0])]
        init["base_target_sz"] = tracker.base_target_sz.numpy().copy()

        cap = {"patches": [], "scores": []}
        orig_sp = extractor_mod.sample_patch

        def hook_sp(im, pos, sz, out_sz, mode="replicate",
                    max_scale_change=None):
            out = orig_sp(im, pos, sz, out_sz, mode=mode,
                          max_scale_change=max_scale_change)
            if not light:
                cap["patches"].append(out[0].detach().numpy().copy())
            return out

        extractor_mod.sample_patch = hook_sp

        orig_loc = tracker.localize_target

        def hook_loc(sf):
            tv, si, s = orig_loc(sf)
            cap["scores"].append(s.detach().numpy().copy())
            return tv, si, s

        tracker.localize_target = hook_loc

        try:
            boxes, posts = [], []
            for t in range(1, len(frames)):
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])
                if not light:
                    posts.append(snap_state())
        finally:
            extractor_mod.sample_patch = orig_sp
            os.unlink(net_path)

        return sd_np, init, {
            "patches": cap["patches"], "scores": cap["scores"],
            "boxes": np.asarray(boxes, np.float64), "posts": posts,
        }


def _to_our_state(snap, frame_num: int, base_target_sz=None):
    import jax.numpy as jnp

    filters = tuple(
        jnp.asarray(_ri_np(half_to_full(f[0])))
        for f in snap["filter"])
    # memory (F, Wh, M, cdim, 2) -> (M, cdim, F, F) complex
    memory = tuple(
        jnp.asarray(half_to_full(m.transpose(2, 3, 0, 1, 4)))
        for m in snap["memory"])
    se = tuple(jnp.asarray(half_to_full_real(e[0]))
               for e in snap["se"])
    cg = snap["cg"]
    cg_states = []
    for b in range(2):
        zeros_b = jnp.zeros_like(filters[b])
        if cg["p"] is None:
            cg_states.append((zeros_b, jnp.asarray(1.0, jnp.float32),
                              zeros_b, jnp.asarray(False)))
        else:
            p_b = jnp.asarray(_ri_np(half_to_full(cg["p"][b][0])))
            r_b = (zeros_b if cg["r_prev"] is None else
                   jnp.asarray(_ri_np(half_to_full(cg["r_prev"][b][0]))))
            cg_states.append((p_b, jnp.asarray(cg["rho"][b], jnp.float32),
                              r_b, jnp.asarray(True)))
    return {
        "pos": jnp.asarray(snap["pos"], jnp.float32),
        "target_scale": jnp.asarray(snap["target_scale"], jnp.float32),
        "target_sz": jnp.asarray(snap["target_sz"], jnp.float32),
        "base_target_sz": jnp.asarray(base_target_sz, jnp.float32),
        "filters": filters,
        "projections": tuple(jnp.asarray(P, jnp.float32)
                             for P in snap["proj"]),
        "memory": memory,
        "sample_weights": tuple(jnp.asarray(w, jnp.float32)
                                for w in snap["sw"]),
        "prev_replace_ind": tuple(
            jnp.asarray(-1 if i is None else i, jnp.int32)
            for i in snap["prev_ind"]),
        "num_stored": jnp.asarray(snap["num_stored"][0], jnp.int32),
        "sample_energy": se,
        "frame_num": jnp.asarray(frame_num, jnp.int32),
        "cg_state": tuple(cg_states),
    }


def run_ours(sd_np, init, ref, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.backbones import resnet18_vggmconv1
    from mmtrack_tpu.models.convert import (
        convert_eco_backbone_checkpoint,
        load_into,
    )
    from mmtrack_tpu.trackers.eco_tracker import (
        ECORuntime,
        _extract_features,
        _to_spectrum,
        _apply_filter_spectrum,
        eco_geometry,
        eco_step_from_patches,
    )
    from mmtrack_tpu.ops.fourier import embed_spectrum, sample_scores

    rt = ECORuntime()
    model = resnet18_vggmconv1()
    x, y, w, h = [float(v) for v in gt[0]]
    st, consts = eco_geometry(rt, (h, w))
    assert st.sample_sz == int(init["img_sample_sz"]), \
        (st.sample_sz, init["img_sample_sz"])
    assert list(st.filt_sz) == init["filter_sz"], \
        (st.filt_sz, init["filter_sz"])
    # the reference's scale (target_scale at init) must match our consts
    np.testing.assert_allclose(float(consts["target_scale"]),
                               init["target_scale"], rtol=1e-6)

    tr = jnp.zeros((1, st.sample_sz, st.sample_sz, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, tr),
                            jax.random.PRNGKey(0))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_eco_backbone_checkpoint(sd_np)["params"])
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))
    P = {"params": params}

    H, W = frames.shape[1:3]
    step = jax.jit(partial(eco_step_from_patches, rt, model, st),
                   static_argnames=("img_hw",))

    @jax.jit
    def fused_scores(state, patches):
        feats = _extract_features(model, P, patches)
        test_X = tuple(
            _to_spectrum(feats[b] @ state["projections"][b],
                         consts["windows"][b], consts["interp"][b])
            for b in range(2))
        F_out = max(st.filt_sz)
        sf = jnp.zeros((rt.num_scales, F_out, F_out), jnp.complex64)
        for b in range(2):
            resp = _apply_filter_spectrum(test_X[b], state["filters"][b])
            sf = sf + embed_spectrum(rt.translation_weights[b] * resp,
                                     F_out)
        return sample_scores(sf, st.sample_sz)

    out = {"boxes": [], "scores": [], "filters": [], "sw": [], "se": []}
    for t in range(1, len(frames)):
        snap = init if t == 1 else ref["posts"][t - 2]
        state = _to_our_state(snap, frame_num=t,
                              base_target_sz=init["base_target_sz"])
        pk = ref["patches"][(t - 1) * rt.num_scales:t * rt.num_scales]
        patches = jnp.asarray(
            np.concatenate(pk, 0).transpose(0, 2, 3, 1))
        out["scores"].append(np.asarray(fused_scores(state, patches)))
        state, box, _ = step(P, consts, state, patches, img_hw=(H, W))
        out["boxes"].append(np.asarray(box, np.float64))
        out["filters"].append([np.asarray(f) for f in state["filters"]])
        out["sw"].append([np.asarray(w) for w in
                          state["sample_weights"]])
        out["se"].append([np.asarray(e) for e in
                          state["sample_energy"]])
    return out


def run_ours_free(sd_np, init, frames, gt):
    """OUR ECO loop free-running: adopts the reference's post-INIT state
    once (the init's dropout augmentation rides torch RNG streams that
    cannot be reproduced in jax; init-path parity is covered by the
    per-transition check's init diagnostics), then runs 100% our own step
    — own 5-scale crops (_crop's sample_patch twin), localization, memory
    writes and online CG — uninterrupted over the whole horizon."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from functools import partial

    from mmtrack_tpu.models.backbones import resnet18_vggmconv1
    from mmtrack_tpu.models.convert import (
        convert_eco_backbone_checkpoint,
        load_into,
    )
    from mmtrack_tpu.trackers.eco_tracker import (
        ECORuntime,
        eco_geometry,
        eco_track_step,
    )

    rt = ECORuntime()
    model = resnet18_vggmconv1()
    x, y, w, h = [float(v) for v in gt[0]]
    st, consts = eco_geometry(rt, (h, w))
    assert st.sample_sz == int(init["img_sample_sz"]), \
        (st.sample_sz, init["img_sample_sz"])

    tr = jnp.zeros((1, st.sample_sz, st.sample_sz, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, tr),
                            jax.random.PRNGKey(0))
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_eco_backbone_checkpoint(sd_np)["params"])
    if missing or unexpected:
        raise AssertionError((missing[:6], unexpected[:6]))
    P = {"params": params}

    state = _to_our_state(init, frame_num=1,
                          base_target_sz=init["base_target_sz"])
    step = jax.jit(partial(eco_track_step, rt, model, st))
    boxes = []
    for t in range(1, len(frames)):
        state, box, _ = step(P, consts, state, jnp.asarray(frames[t]))
        boxes.append(np.asarray(box, np.float64))
    return np.asarray(boxes)


TOL_PX_FREE = 0.05   # free-running lockstep tolerance (sub-pixel state
                     # arithmetic; integer argmax grid must agree)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--freerun", action="store_true",
                    help="adopt the reference's post-init state once, then "
                         "run BOTH loops uninterrupted (own crops, no "
                         "resync) and compare emitted boxes")
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt = make_sequence(args.frames, args.seed)

    if args.freerun:
        from tools.parity.freerun import compare_freerun

        sd, init, ref = run_reference(frames, gt, args.seed, light=True)
        our_boxes = run_ours_free(sd, init, frames, gt)
        n = len(ref["boxes"])
        # frame_num = t + 2; the online CG trains when frame_num % 10 == 1
        # (train_skipping=10), i.e. first at transition t = 9. Up to there
        # lockstep must be BIT-equal. The CG itself carries a measured
        # ~8e-5 f32 noise floor per train frame (the per-transition
        # check's max_score_dev on CG frames), which exceeds typical
        # argmax cell gaps of the fused 5-scale field — so post-CG,
        # grid-cell-level divergence is expected from float
        # non-associativity alone and the gate switches to a trajectory
        # band: every later frame must still agree to IoU >= 0.8 (both
        # loops tracking the same target through their own feedback).
        first_train = next(t for t in range(n) if (t + 2) % 10 == 1)
        res = {"family": "eco-freerun",
               **compare_freerun(ref["boxes"], our_boxes,
                                 tol_px=TOL_PX_FREE,
                                 min_horizon=min(n, first_train + 1))}
        res["first_cg_train_frame"] = first_train
        if res["lockstep_horizon"] < n:
            s = np.sort(np.asarray(ref["scores"][res["break_frame"]],
                                   np.float64).reshape(-1))
            res["break_top2_gap"] = float(s[-1] - s[-2])
            res["break_after_cg"] = bool(res["break_frame"] > first_train)
            res["pass"] = bool(res["pass"] and res["break_after_cg"]
                               and res["min_iou"] >= 0.8)
        print(json.dumps(res))
        return 0 if res["pass"] else 1
    cache = os.environ.get("MMTRACK_ECO_REF_CACHE", "")
    if cache and os.path.exists(cache):
        import pickle

        with open(cache, "rb") as f:
            sd, init, ref = pickle.load(f)
    else:
        sd, init, ref = run_reference(frames, gt, args.seed)
        if cache:
            import pickle

            with open(cache, "wb") as f:
                pickle.dump((sd, init, ref), f)
    ours = run_ours(sd, init, ref, frames, gt)

    n = len(ref["boxes"])
    score_dev = np.asarray([
        np.abs(ours["scores"][t] - ref["scores"][t][:, 0]).max()
        for t in range(n)])
    box_dev = np.abs(ref["boxes"] - np.asarray(ours["boxes"])).max(axis=1)
    filt_dev, sw_dev = [], []
    train_frames = []
    for t in range(n):
        post = ref["posts"][t]
        fd = max(
            np.abs(ours["filters"][t][b]
                   - _ri_np(half_to_full(post["filter"][b][0]))).max()
            for b in range(2))
        filt_dev.append(fd)
        sw_dev.append(max(
            np.abs(ours["sw"][t][b] - post["sw"][b]).max()
            for b in range(2)))
        if (t + 2) % 10 == 1:   # frame_num = t + 2 trains
            train_frames.append(t)
    filt_dev = np.asarray(filt_dev)
    sw_dev = np.asarray(sw_dev)

    ok = (float(score_dev.max()) <= TOL_SCORE
          and float(box_dev.max()) <= TOL_PX
          and float(filt_dev.max()) <= TOL_FILTER
          and float(sw_dev.max()) <= TOL_SW)
    print(json.dumps({
        "ok": ok,
        "frames": n,
        "train_frame_indices": train_frames,
        "max_score_dev": float(score_dev.max()),
        "max_box_dev": float(box_dev.max()),
        "max_filter_dev": float(filt_dev.max()),
        "max_filter_dev_train_frames": (
            float(filt_dev[train_frames].max()) if train_frames else None),
        "max_sample_weight_dev": float(sw_dev.max()),
        "boxes_ref_last": list(ref["boxes"][-1]),
        "boxes_ours_last": list(np.asarray(ours["boxes"])[-1]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
