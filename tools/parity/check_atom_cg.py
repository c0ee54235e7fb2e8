"""f64 arbitration probe for ATOM's CG deviations.

The trajectory A/B (check_trajectory_atom.py) leaves two metrics above
the noise level of the other families: the post-reoptimization filter
(~6e-4) and the joint-init response (~1e-2). Both come out of iterative
CG solvers on ill-conditioned normal equations, where f32 rounding is
amplified by ~sqrt(cond) per iteration — OR they could hide a real
semantic divergence from the reference's solver
(pytracking/libs/optimization.py:49-390). This probe arbitrates:

  - capture, from a live run of the reference's OWN tracker, the exact
    inputs of (a) the joint FactorizedConvProblem init optimization
    (6 GN x 10 CG, optimization.py:293-390) and (b) every online
    ConvProblem ConjugateGradient re-optimization (5 Polak-Ribiere CG
    iterations, optimization.py:199-290);
  - replay each solve four ways ON THE SAME INPUTS: the reference's own
    torch classes in f64 and f32, and ours
    (ops/optimization.gauss_newton_cg) in f64 and f32;
  - report, per solve:
      sem_dev   = |ours_f64 - ref_f64|   (semantic agreement in exact-
                                          enough arithmetic)
      ref_noise = |ref_f32  - ref_f64|   (the reference's own f32 error)
      our_noise = |ours_f32 - ref_f64|   (ours, same yardstick)
      rec_dev   = |ref_f32 replay - the tracker's recorded result|
                                         (validates input reconstruction)

PASS = the implementations agree semantically (sem_dev orders below the
f32 noise floor) and our f32 noise is the same order as the reference's
own. That justifies trajectory-harness tolerances at the measured noise
scale; a FAIL (sem_dev ~ the observed deviation) means a real bug.

Run: python tools/parity/check_atom_cg.py [--frames 12]
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

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from tools.parity import check_trajectory_atom as cta  # noqa: E402
from tools.parity.refload import reference_available, reference_path  # noqa: E402

FILTER_REG = 1e-1
PROJ_REG = 1e-4
ACT_PARAM = 0.05
ONLINE_CG_ITER = 5
INIT_GN_ITER = 6
INIT_CG_PER_GN = 10


def _torch_env():
    """The reference-module environment shims run_reference installs —
    needed here too when the capture cache short-circuits it: legacy
    torch paths and the torch>=2 TensorList-in-autograd.grad bridge."""
    import types

    import torch

    from tools.parity.refload import patch_cuda_to_cpu, patch_legacy_fft

    patch_cuda_to_cpu()
    patch_legacy_fft()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six
    if not getattr(torch.autograd.grad, "_tl_bridge", False):
        orig_grad = torch.autograd.grad

        def grad_compat(outputs, inputs, grad_outputs=None, **kw):
            def plain(v):
                return tuple(v) if isinstance(v, (list, tuple)) else v
            go = None if grad_outputs is None else plain(grad_outputs)
            return orig_grad(plain(outputs), plain(inputs), go, **kw)

        grad_compat._tl_bridge = True
        torch.autograd.grad = grad_compat


def _torch_mods():
    _torch_env()
    with reference_path("RGBD/models/DeT"):
        optim_lib = importlib.import_module("pytracking.libs.optimization")
        atom_optim = importlib.import_module("pytracking.tracker.atom.optim")
        tl_mod = importlib.import_module("pytracking.libs.tensorlist")
    return optim_lib, atom_optim, tl_mod.TensorList


def _resp_act():
    import torch.nn.functional as F

    # atom.py:470-471 ('mlu', 0.05)
    return lambda x: F.elu(F.leaky_relu(x, 1 / ACT_PARAM), ACT_PARAM)


def torch_online_cg(x0, mem, mem_y, sw, dtype):
    """The reference's ConjugateGradient on ConvProblem (atom.py:198-203,
    fletcher_reeves=False, direction_forget_factor=0), replayed on
    reconstructed inputs. Shapes: x0 (1,64,4,4), mem (250,64,18,18),
    mem_y (250,18,18), sw (250,)."""
    import torch

    optim_lib, atom_optim, TensorList = _torch_mods()
    dt = torch.float64 if dtype == "f64" else torch.float32
    problem = atom_optim.ConvProblem(
        TensorList([torch.from_numpy(mem.copy()).to(dt)]),
        TensorList([torch.from_numpy(mem_y[:, None].copy()).to(dt)]),
        TensorList([torch.tensor(FILTER_REG, dtype=dt)]),
        TensorList([torch.from_numpy(sw.copy()).to(dt)]),
        _resp_act())
    x = TensorList([torch.from_numpy(x0.copy()).to(dt)])
    opt = optim_lib.ConjugateGradient(
        problem, x, fletcher_reeves=False, standard_alpha=True,
        direction_forget_factor=0)
    opt.run(ONLINE_CG_ITER)
    return x[0].detach().numpy()


def torch_init_gnc(f0, P0, feats, y, sw, dtype):
    """The reference's GaussNewtonCG on FactorizedConvProblem
    (atom.py:158-179, run(init_CG_iter // init_GN_iter, init_GN_iter)),
    replayed on the captured init tensors. Shapes: f0 (1,64,4,4),
    P0 (256,64,1,1), feats (N,256,18,18), y (N,1,18,18), sw (N,)."""
    import torch

    optim_lib, atom_optim, TensorList = _torch_mods()
    dt = torch.float64 if dtype == "f64" else torch.float32
    problem = atom_optim.FactorizedConvProblem(
        TensorList([torch.from_numpy(feats.copy()).to(dt)]),
        TensorList([torch.from_numpy(y.copy()).to(dt)]),
        TensorList([torch.tensor(FILTER_REG, dtype=dt)]),
        TensorList([torch.tensor(PROJ_REG, dtype=dt)]),
        None,  # params: stored but unused by the problem's math
        TensorList([torch.from_numpy(sw.copy()).to(dt)]),
        lambda x: x, _resp_act())
    joint = TensorList([torch.from_numpy(f0.copy()).to(dt),
                        torch.from_numpy(P0.copy()).to(dt)])
    opt = optim_lib.GaussNewtonCG(problem, joint)
    opt.run(INIT_CG_PER_GN, INIT_GN_ITER)
    return joint[0].detach().numpy(), joint[1].detach().numpy()


def ours_online_cg(rt, x0, mem, mem_y, sw, dtype):
    """ops/optimization.gauss_newton_cg(num_gn=1, fletcher_reeves=False)
    on the same inputs (trackers/atom_tracker.py online update path)."""
    import jax.numpy as jnp
    from functools import partial

    from mmtrack_tpu.ops.optimization import gauss_newton_cg
    from mmtrack_tpu.trackers.atom_tracker import _residuals_filter

    dt = jnp.float64 if dtype == "f64" else jnp.float32
    comp = jnp.asarray(mem.transpose(0, 2, 3, 1), dt)
    y = jnp.asarray(mem_y, dt)
    w = jnp.asarray(sw, dt)
    f = jnp.asarray(x0[0].transpose(1, 2, 0), dt)
    out = gauss_newton_cg(
        partial(_residuals_filter, rt, comp=comp, y=y, sw=w),
        f, 1, ONLINE_CG_ITER, fletcher_reeves=False)
    return np.asarray(out).transpose(2, 0, 1)[None]


def ours_init_gnc(rt, f0, P0, feats, y, sw, dtype):
    """ops/optimization.gauss_newton_cg on the joint problem with the
    M1 = diag([filter_reg, projection_reg])^-1 preconditioner."""
    import jax.numpy as jnp
    from functools import partial

    from mmtrack_tpu.ops.optimization import gauss_newton_cg
    from mmtrack_tpu.trackers.atom_tracker import _residuals_joint

    dt = jnp.float64 if dtype == "f64" else jnp.float32
    samples = jnp.asarray(feats.transpose(0, 2, 3, 1), dt)
    yy = jnp.asarray(y[:, 0], dt)
    w = jnp.asarray(sw, dt)
    f = jnp.asarray(f0[0].transpose(1, 2, 0), dt)
    # torch 1x1 conv weight is (out=64, in=256, 1, 1); ours is (256, 64)
    P = jnp.asarray(P0[:, :, 0, 0].T, dt)
    f_out, P_out = gauss_newton_cg(
        partial(_residuals_joint, rt, samples=samples, y=yy, sw=w),
        (f, P), INIT_GN_ITER, INIT_CG_PER_GN,
        precond=lambda t: (t[0] / rt.filter_reg, t[1] / rt.projection_reg))
    return (np.asarray(f_out).transpose(2, 0, 1)[None],
            np.asarray(P_out).T[:, :, None, None])


def response_dev(rt, feats, fP_a, fP_b):
    """Functional metric: max |response_a - response_b| of the two (f,P)
    pairs on the init samples, in f64."""
    import jax.numpy as jnp

    from mmtrack_tpu.trackers.atom_tracker import _apply_filter_same

    samples = jnp.asarray(feats.transpose(0, 2, 3, 1), jnp.float64)

    def resp(fP):
        f, P = fP       # torch layouts: f (1,64,4,4), P (64,256,1,1)
        comp = samples @ jnp.asarray(P[:, :, 0, 0].T, jnp.float64)
        return _apply_filter_same(
            rt, comp, jnp.asarray(f[0].transpose(1, 2, 0), jnp.float64))

    return float(jnp.abs(resp(fP_a) - resp(fP_b)).max())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.trackers.atom_tracker import ATOMRuntime

    rt = ATOMRuntime(aug_dropout_num=0, random_shift_factor=0.0,
                     num_init_random_boxes=0)

    frames, gt = cta.make_sequence(args.frames, args.seed)
    # the reference capture is the expensive part (~5 min torch CPU);
    # cache it across probe iterations
    import pickle

    cache = f"/tmp/atom_cg_capture_f{args.frames}_s{args.seed}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            init, ref = pickle.load(fh)
    else:
        _sd, init, ref = cta.run_reference(frames, gt, args.seed)
        with open(cache, "wb") as fh:
            pickle.dump((init, ref), fh)

    # ---- init joint optimization, all four ways on the captured tensors
    feats, y0, sw0 = init["feats"], init["feats_y"], init["feats_sw"]
    f64 = torch_init_gnc(init["f0"], init["P0"], feats, y0, sw0, "f64")
    f32 = torch_init_gnc(init["f0"], init["P0"], feats, y0, sw0, "f32")
    o64 = ours_init_gnc(rt, init["f0"], init["P0"], feats, y0, sw0, "f64")
    o32 = ours_init_gnc(rt, init["f0"], init["P0"], feats, y0, sw0, "f32")
    init_row = {
        "sem_dev": response_dev(rt, feats, o64, f64),
        "ref_noise": response_dev(rt, feats, f32, f64),
        "our_noise": response_dev(rt, feats, o32, f64),
        "rec_dev": float(max(
            np.abs(f32[0] - init["filter"]).max(),
            np.abs(f32[1] - init["projection"]).max())),
        "sem_dev_pointwise": float(max(
            np.abs(o64[0] - f64[0]).max(), np.abs(o64[1] - f64[1]).max())),
    }

    # ---- online re-optimizations: walk the memory mirror, replay each
    mem = init["samples"].copy()           # (250, 64, 18, 18)
    mem_y = init["y"][:, 0].copy()         # (250, 18, 18)
    online_rows = []
    prev_filter = init["filter"]
    n = len(ref["boxes"])
    for t in range(n):
        rs = ref["resync"].get(t)
        if rs is not None:
            mem[rs["slot"]] = rs["sample"]
            mem_y[rs["slot"]] = rs["label"]
        is_cg = (ref["flags"][t] == "hard_negative") or ((t + 1) % 10 == 0)
        if is_cg:
            sw = ref["weights"][t]
            r64 = torch_online_cg(prev_filter, mem, mem_y, sw, "f64")
            r32 = torch_online_cg(prev_filter, mem, mem_y, sw, "f32")
            u64 = ours_online_cg(rt, prev_filter, mem, mem_y, sw, "f64")
            u32 = ours_online_cg(rt, prev_filter, mem, mem_y, sw, "f32")
            online_rows.append({
                "t": t, "flag": ref["flags"][t],
                "sem_dev": float(np.abs(u64 - r64).max()),
                "ref_noise": float(np.abs(r32 - r64).max()),
                "our_noise": float(np.abs(u32 - r64).max()),
                "rec_dev": float(np.abs(r32 - ref["filters"][t]).max()),
            })
        prev_filter = ref["filters"][t]

    # the replayed f32 reference must land back on the tracker's recorded
    # output (validates the input reconstruction), and semantic agreement
    # must sit orders below the f32 noise floor with our noise comparable.
    # The per-solve ref_noise varies ~200x by luck of rounding (observed
    # 1.6e-6..3.4e-4 across four hard-negative solves), so the floor is
    # the reference's own WORST observed f32 error on this problem class,
    # aggregated across the online solves — not the per-row value.
    floor_online = max(max(r["ref_noise"] for r in online_rows), 1e-9) \
        if online_rows else 1e-9
    online_ok = all(r["sem_dev"] <= 0.05 * floor_online
                    and r["our_noise"] <= 10.0 * floor_online
                    for r in online_rows)
    floor_init = max(init_row["ref_noise"], 1e-9)
    init_ok = (init_row["sem_dev"] <= 0.05 * floor_init
               and init_row["our_noise"] <= 10.0 * floor_init)
    rec_ok = (init_row["rec_dev"] <= 10 * floor_init
              and all(r["rec_dev"] <= 10 * floor_online
                      for r in online_rows))
    res = {
        "family": "atom-cg-f64-probe",
        "init": init_row,
        "online": online_rows,
        "f32_noise_floor": {"online": floor_online, "init": floor_init},
        "pass": bool(init_ok and online_ok and rec_ok
                     and len(online_rows) >= 2),
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
