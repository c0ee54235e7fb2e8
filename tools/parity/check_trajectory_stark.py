"""Trajectory-level A/B: the reference's own SPT STARK tracker loop vs ours.

check_stark.py proves forward parity of the converted six-channel STARK;
this check runs the reference's ACTUAL L3 runtime — SPT/lib/test/tracker/
stark_s.py::STARK_S (sample_target crops, Preprocessor on each modality
triplet, dual-backbone embed, merge_template_search, transformer,
mean-of-queries box decode, map_box_back, clip 10px) — against
mmtrack_tpu's STARKTracker (host_preproc=True, the bit-exact cv2 crop
twin) on the same synthetic RGB-D sequence and the same converted
weights, teacher-forced from ground truth.

Scope note: SPT's benchmark runtime is STARK_S; its stark_st tracker
path is UNBUILDABLE as shipped (lib/models/stark/stark_st.py's
build_starkst requires cfg.MODEL.TRANSFORMER.FUS_LAYERS, which only the
stark_s config defines — the stark_st2 config it is paired with lacks
it), so there is no runnable reference for the ST template-refresh loop
in the SPT tree. Our STARKRuntime(dynamic_template=True) implements that
refresh per the stock STARK-ST rule (stark_st.py:91-99) and its
score-gated analog is A/B-able via the MixFormer online tracker instead.

Run: python tools/parity/check_trajectory_stark.py [--frames 24]
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

TOL_PX = 0.02


def run_reference(frames, gt, seed: int = 0):
    import torch

    patch_cuda_to_cpu()
    with reference_path("RGBD/models/SPT") as root:
        misc = importlib.import_module("lib.utils.misc")
        misc.is_main_process = lambda: False  # block pretrained download

        cfg_mod = importlib.import_module("lib.config.stark_s.config")
        importlib.reload(cfg_mod)
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", "stark_s", "baseline.yaml"))
        s_mod = importlib.import_module("lib.models.stark.stark_s")
        trk_mod = importlib.import_module("lib.test.tracker.stark_s")
        merge = importlib.import_module("lib.utils.merge")

        torch.manual_seed(seed)
        donor = s_mod.build_starks(cfg_mod.cfg)
        # non-trivial BN running stats in the corner head so the
        # running-stat conversion is exercised
        donor.train()
        with torch.no_grad():
            from lib.utils.misc import NestedTensor

            rs = np.random.RandomState(100)

            def nt(shape):
                return NestedTensor(
                    torch.from_numpy(rs.uniform(-2, 2, shape)
                                     .astype(np.float32)),
                    torch.zeros((1, shape[2], shape[3]), dtype=torch.bool))

            fz_c = donor.forward_backbone_color(nt((1, 3, 128, 128)))
            fx_c = donor.forward_backbone_color(nt((1, 3, 320, 320)))
            fz_d = donor.forward_backbone_depth(nt((1, 3, 128, 128)))
            fx_d = donor.forward_backbone_depth(nt((1, 3, 320, 320)))
            donor.forward_transformer(
                merge.merge_template_search([fz_c, fx_c]),
                merge.merge_template_search([fz_d, fx_d]),
                run_box_head=True)
        donor.eval()
        state_dict = donor.state_dict()

        params_mod = importlib.import_module("lib.test.parameter.stark_s")
        real_load = torch.load
        torch.load = lambda *a, **k: {"net": state_dict}
        real_build = trk_mod.build_starks
        trk_mod.build_starks = lambda cfg: donor
        try:
            p = params_mod.parameters("baseline")
            p.cfg = cfg_mod.cfg
            p.checkpoint = "<in-memory>"
            p.save_all_boxes = False
            tracker = trk_mod.STARK_S(p, "synth")
        finally:
            torch.load = real_load
            trk_mod.build_starks = real_build

        tracker.initialize(frames[0],
                           {"init_bbox": [float(v) for v in gt[0]]})
        boxes = []
        with torch.no_grad():
            for t in range(1, len(frames)):
                tracker.state = [float(v) for v in gt[t - 1]]
                out = tracker.track(frames[t])
                boxes.append(out["target_bbox"])

        sd_np = {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
        return sd_np, np.asarray(boxes, np.float64)


def run_ours(sd_np, frames, gt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmtrack_tpu.models.convert import convert_stark_checkpoint, load_into
    from mmtrack_tpu.models.stark import STARK
    from mmtrack_tpu.trackers.stark_tracker import STARKRuntime, STARKTracker

    model = STARK(six_channel=True)
    rt = STARKRuntime()

    tz = jnp.zeros((1, rt.template_size, rt.template_size, 6))
    tx = jnp.zeros((1, rt.search_size, rt.search_size, 6))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), tz, tx)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, _ = load_into(zeros, convert_stark_checkpoint(sd_np))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    tracker = STARKTracker(model, P, rt, host_preproc=True)
    tracker.initialize(frames[0], {"init_bbox": [float(v) for v in gt[0]]})
    boxes = []
    for t in range(1, len(frames)):
        tracker.state = {**tracker.state,
                         "box": jnp.asarray(np.asarray(gt[t - 1],
                                                       np.float32))}
        out = tracker.track(frames[t])
        boxes.append(out["target_bbox"])
    return np.asarray(boxes, np.float64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    frames, gt = make_synthetic_sequence(
        n_frames=args.frames, height=240, width=320, seed=args.seed)

    sd, ref_boxes = run_reference(frames, gt, args.seed)
    our_boxes = run_ours(sd, frames, gt)

    n = len(ref_boxes)
    box_dev = np.abs(ref_boxes - our_boxes).max(axis=1)
    if os.environ.get("MMTRACK_TRAJ_DEBUG"):
        for t in range(n):
            print(f"t={t:2d} dev={box_dev[t]:.2e} ref={ref_boxes[t]} "
                  f"ours={our_boxes[t]}", file=sys.stderr)
    res = {
        "family": "spt_stark_s-trajectory",
        "frames_tracked": n,
        "max_box_dev_px": float(box_dev.max()),
        "mean_box_dev_px": float(box_dev.mean()),
        "pass": bool(box_dev.max() <= TOL_PX),
        "tol_px": TOL_PX,
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
