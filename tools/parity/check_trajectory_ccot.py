"""Trajectory-level A/B: the reference's own C-COT loop vs ccot_tracker.

Runs the fork's ACTUAL tracker — keep_track_vot2021/pytracking/tracker/
ccot/ccot.py::CCOT — side by side with mmtrack_tpu's
eco_step_from_patches under the CCOT runtime flags (no projection,
full-channel memory, FilterOptim CG EVERY frame, C-COT's own
second-sample weight split, unweighted block-sum score fusion) on the
same synthetic sequence and the same converted resnet18_vggmconv1
weights, per-TRANSITION (same method as check_trajectory_eco.py: both
sides consume the reference's captured sample_patch crops, and our full
state — position/scale, per-block filters, full-channel sample memory,
sample weights, preconditioner energy, and the online CG's carried
conjugate direction — is resynchronized from the reference's recorded
post-frame state after every frame).

THE SHIPPED ccot.py CANNOT RUN AS-IS — three defects, all reproduced
here before settling on the configuration below:

1. ccot/optim.py:3-4 imports `from libs import ...` / `from
   utils.plotting import ...` — absolute paths that exist nowhere
   (every other tracker uses `pytracking.libs`). The module cannot even
   load. Bridged by aliasing sys.modules["libs"/"utils"] to
   pytracking.libs/utils (zero logic change).
2. ccot/optim.py:18 calls `self.set_preconditioner(self.precond_M1)` —
   an API the fork's optimization.ConjugateGradientBase no longer has
   (the current class overrides `M1`). Bridged by adding a
   set_preconditioner that assigns M1 (what the old API did).
3. ccot.py lacks ECO's filter-size odd-ification (ccot.py:44
   `filter_sz = feature_sz` vs eco.py:65 `+ (feature_sz + 1) % 2`), but
   cfft2 ALWAYS produces odd spectra (fourier.py:20-24) — so any even
   feature size crashes in interpolate_dft ("size of tensor a (53) must
   match b (52)"). With the in-tree resnet18_vggmconv1 extractor the
   shallow block is ALWAYS even (img_sample_sz ≡ 16 mod 32 ⇒ S/4 even),
   i.e. the two-block C-COT the fork implies has never run. The A/B
   therefore runs the layer3-only configuration (S/16 odd — the only
   one whose math executes); ccot_tracker's two-block default inherits
   ECO's odd-ification, which is exactly the fix.

The fork also ships NO parameter file for CCOT, so constants are the
parameter/eco/default.py values where ccot.py reads the same names, and
for ccot.py's single top-level reads (learning_rate,
output_sigma_factor, the reg window, no translation weights): the
values pinned in trackers/ccot_tracker.py::ccot_runtime — IDENTICAL on
both sides, so the A/B tests the step arithmetic, not a constants
guess. sample_memory_size is 30 on both sides (the runtime's documented
memory deviation).

Because C-COT trains every frame (ccot.py:150 — no train_skipping),
every transition exercises the full FilterOptim CG with the carried
direction, unlike the ECO check where only one frame per period trains.

Run: python tools/parity/check_trajectory_ccot.py [--frames 8]
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

from tools.parity.check_trajectory_eco import (  # noqa: E402
    _ri_np,
    half_to_full,
    half_to_full_real,
    make_sequence,
)
from tools.parity.refload import (  # noqa: E402
    patch_cuda_to_cpu,
    patch_legacy_fft,
    reference_available,
    reference_path,
)

TOL_SCORE = 1e-4     # fused (5, S, S) score fields per transition
TOL_PX = 0.05        # output box (sub-pixel state arithmetic only)
TOL_FILTER = 2e-5    # post-CG filter (full-spectrum embedding). Looser
                     # than the ECO check's 1e-5: C-COT's CG runs over
                     # the FULL 256-channel spectra (4x ECO's compressed
                     # dims -> ~2x longer f32 reductions) and EVERY
                     # frame trains; observed dev is 1.15e-5, flat
                     # across transitions (pure summation noise, no
                     # drift — scores 3.7e-7 / boxes 7.6e-6 px stay
                     # orders under their gates)
TOL_SW = 1e-6        # sample weights after min-weight replacement


def run_reference(frames, gt, seed: int = 0):
    import torch

    patch_cuda_to_cpu()
    patch_legacy_fft()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/keep_track_vot2021"):
        # defect-1 bridge: ccot/optim.py's broken absolute imports
        sys.modules["libs"] = importlib.import_module("pytracking.libs")
        sys.modules["utils"] = importlib.import_module("pytracking.utils")
        backbone_mod = importlib.import_module(
            "ltr.models.backbone.resnet_vggm")
        deep_mod = importlib.import_module("pytracking.features.deep")
        extractor_mod = importlib.import_module(
            "pytracking.features.extractor")
        optimization_mod = importlib.import_module(
            "pytracking.libs.optimization")
        # defect-2 bridge: the pre-refactor preconditioner API ccot's
        # FilterOptim still calls — assigning M1 is what it used to do
        optimization_mod.ConjugateGradientBase.set_preconditioner = (
            lambda self, fn: setattr(self, "M1", fn))
        ccot_mod = importlib.import_module("pytracking.tracker.ccot.ccot")
        fourier_mod = importlib.import_module("pytracking.libs.fourier")
        params_mod = importlib.import_module("pytracking.utils.params")

        # torch>=2 compat: F.pad rejects float pad amounts (sample_patch
        # passes integral tensor floats) — cast, no math change
        import torch.nn.functional as TF
        real_pad = TF.pad

        def compat_pad(input, pad, *a, **k):
            return real_pad(input, tuple(int(v) for v in pad), *a, **k)

        TF.pad = compat_pad

        torch.manual_seed(seed)
        net = backbone_mod.resnet18_vggmconv1(
            output_layers=["layer3"])
        net.eval()
        sd_np = {k: v.detach().cpu().numpy()
                 for k, v in net.state_dict().items()}

        with tempfile.NamedTemporaryFile(suffix=".pth",
                                         delete=False) as tmp:
            torch.save(net.state_dict(), tmp.name)
            net_path = tmp.name

        # parameter/eco/default.py where ccot.py reads the same names;
        # ccot_runtime's pinned values for its single top-level reads
        # (ccot_tracker.py docstring) — both sides identical
        p = params_mod.TrackerParams()
        p.debug = 0
        p.visualization = False
        p.use_gpu = False
        p.device = "cpu"
        p.max_image_sample_size = 250 ** 2
        p.min_image_sample_size = 200 ** 2
        p.search_area_scale = 4.5
        p.CG_iter = 5
        p.init_CG_iter = 100
        p.fletcher_reeves = False
        p.standard_alpha = True
        p.CG_forgetting_rate = 75
        p.precond_data_param = 0.3
        p.precond_reg_param = 0.15
        p.learning_rate = 0.0075            # ccot.py single top-level lr
        p.output_sigma_factor = 1 / 16      # single label sigma
        p.sample_memory_size = 30           # ccot_runtime's memory bound
        p.scale_factors = 1.02 ** torch.arange(-2, 3).float()
        p.interpolation_method = "bicubic"
        p.interpolation_bicubic_a = -0.75
        p.interpolation_centering = True
        p.interpolation_windowing = False
        # single top-level reg window (dcf.get_reg_filter(..., params))
        p.use_reg_window = True
        p.reg_window_min = 1e-4
        p.reg_window_edge = 10e-3
        p.reg_window_power = 2
        p.reg_sparsity_threshold = 0.05

        fparams = params_mod.FeatureParams(
            feature_params=[params_mod.TrackerParams()])
        features = deep_mod.ResNetVGGm1(
            output_layers=["layer3"], net_path=net_path,
            base_model="resnet18", use_gpu=False, fparams=fparams,
            pool_stride=[1], normalize_power=2)
        p.features = extractor_mod.MultiResolutionExtractor([features])

        tracker = ccot_mod.CCOT(p)
        tracker.visdom = None
        # ccot.py never calls initialize_features (eco.py:34 does) —
        # without it features.stride() raises AttributeError
        p.features.initialize()

        def snap_cg():
            # per-TensorList-entry ip => per-block p/rho/r_prev, exactly
            # as in the ECO check; after the init CG run rho is already a
            # 2-entry TensorList
            fo = tracker.filter_optimizer
            rho = [float(v) for v in fo.rho]
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
                "filter": [f.detach().numpy().copy()
                           for f in tracker.filter],
                # ONE shared weight vector / replace index / count
                # (ccot.py:84-86,196 — not per-block like ECO)
                "sw": tracker.sample_weights.numpy().copy(),
                "prev_ind": int(tracker.previous_replace_ind),
                "num_stored": int(tracker.num_stored_samples),
                "memory": [m.numpy().copy()
                           for m in tracker.training_samples],
                "se": [e.numpy().copy() for e in fo.sample_energy],
                "cg": snap_cg(),
            }

        tracker.initialize(
            frames[0], {"init_bbox": [float(v) for v in gt[0]]})
        init = snap_state()
        init["img_sample_sz"] = float(tracker.img_sample_sz[0])
        init["filter_sz"] = [int(f[0]) for f in tracker.filter_sz]
        init["base_target_sz"] = tracker.base_target_sz.numpy().copy()

        cap = {"patches": [], "scores": []}
        orig_sp = extractor_mod.sample_patch

        def hook_sp(im, pos, sz, out_sz, mode="replicate",
                    max_scale_change=None):
            out = orig_sp(im, pos, sz, out_sz, mode=mode,
                          max_scale_change=max_scale_change)
            cap["patches"].append(out[0].detach().numpy().copy())
            return out

        extractor_mod.sample_patch = hook_sp

        # ccot.py computes scores inline (track():117-118: sf =
        # apply_filter(test_xf); s = sample_fs(sf, output_sz)) — capture
        # them by wrapping apply_filter
        orig_af = tracker.apply_filter

        def hook_af(xf):
            sf = orig_af(xf)
            cap["scores"].append(fourier_mod.sample_fs(
                sf, tracker.output_sz).detach().numpy().copy())
            return sf

        tracker.apply_filter = hook_af

        try:
            boxes, posts = [], []
            for t in range(1, len(frames)):
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])
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
    # memory (F, Wh, M, C, 2) -> (M, C, F, F) complex, full channels
    memory = tuple(
        jnp.asarray(half_to_full(m.transpose(2, 3, 0, 1, 4)))
        for m in snap["memory"])
    se = tuple(jnp.asarray(half_to_full_real(e[0]))
               for e in snap["se"])
    cg = snap["cg"]
    cg_states = []
    for b in range(len(filters)):
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
    nb = len(filters)
    sw = jnp.asarray(snap["sw"], jnp.float32)
    prev = jnp.asarray(snap["prev_ind"], jnp.int32)
    return {
        "pos": jnp.asarray(snap["pos"], jnp.float32),
        "target_scale": jnp.asarray(snap["target_scale"], jnp.float32),
        "target_sz": jnp.asarray(snap["target_sz"], jnp.float32),
        "base_target_sz": jnp.asarray(base_target_sz, jnp.float32),
        "filters": filters,
        "memory": memory,
        # the reference's SINGLE shared vector/index feeds every
        # per-block slot (equal learning rates keep them identical)
        "sample_weights": tuple(sw for _ in range(nb)),
        "prev_replace_ind": tuple(prev for _ in range(nb)),
        "num_stored": jnp.asarray(snap["num_stored"], jnp.int32),
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
    from mmtrack_tpu.ops.fourier import embed_spectrum, sample_scores
    from mmtrack_tpu.trackers.ccot_tracker import ccot_runtime
    from mmtrack_tpu.trackers.eco_tracker import (
        _apply_filter_spectrum,
        _extract_features,
        _to_spectrum,
        eco_geometry,
        eco_step_from_patches,
    )

    # the layer3-only configuration — the only one the shipped ccot.py
    # can execute (see module docstring, defect 3)
    rt = ccot_runtime(strides=(16,), blocks=("layer3",),
                      feat_dims=(256,), compressed_dims=(256,),
                      learning_rates=(0.0075,),
                      output_sigma_factors=(1 / 16,),
                      translation_weights=(1.0,),
                      reg_window_min=(1e-4,), reg_window_edge=(10e-3,),
                      reg_sparsity_threshold=(0.05,))
    model = resnet18_vggmconv1()
    x, y, w, h = [float(v) for v in gt[0]]
    st, consts = eco_geometry(rt, (h, w))
    assert st.sample_sz == int(init["img_sample_sz"]), \
        (st.sample_sz, init["img_sample_sz"])
    assert list(st.filt_sz) == init["filter_sz"], \
        (st.filt_sz, init["filter_sz"])

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
        feats = _extract_features(model, P, patches, rt.blocks)
        test_X = tuple(
            _to_spectrum(feats[b], consts["windows"][b],
                         consts["interp"][b])
            for b in range(rt.n_blocks))
        F_out = max(st.filt_sz)
        sf = jnp.zeros((rt.num_scales, F_out, F_out), jnp.complex64)
        for b in range(rt.n_blocks):
            resp = _apply_filter_spectrum(test_X[b], state["filters"][b])
            # unweighted block sum (ccot.py apply_filter)
            sf = sf + embed_spectrum(rt.translation_weights[b] * resp,
                                     F_out)
        return sample_scores(sf, st.sample_sz)

    out = {"boxes": [], "scores": [], "filters": [], "sw": []}
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
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    frames, gt = make_sequence(args.frames, args.seed)
    cache = os.environ.get("MMTRACK_CCOT_REF_CACHE", "")
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
    for t in range(n):
        post = ref["posts"][t]
        nb = len(post["filter"])
        filt_dev.append(max(
            np.abs(ours["filters"][t][b]
                   - _ri_np(half_to_full(post["filter"][b][0]))).max()
            for b in range(nb)))
        sw_dev.append(max(
            np.abs(ours["sw"][t][b] - post["sw"]).max()
            for b in range(nb)))
    filt_dev = np.asarray(filt_dev)
    sw_dev = np.asarray(sw_dev)

    ok = (float(score_dev.max()) <= TOL_SCORE
          and float(box_dev.max()) <= TOL_PX
          and float(filt_dev.max()) <= TOL_FILTER
          and float(sw_dev.max()) <= TOL_SW)
    print(json.dumps({
        "ok": ok,
        "frames": n,
        "trains_every_frame": True,
        "max_score_dev": float(score_dev.max()),
        "max_box_dev": float(box_dev.max()),
        "max_filter_dev": float(filt_dev.max()),
        "max_sample_weight_dev": float(sw_dev.max()),
        "boxes_ref_last": list(ref["boxes"][-1]),
        "boxes_ours_last": list(np.asarray(ours["boxes"])[-1]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
