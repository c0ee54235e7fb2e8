"""OPE evaluation entry point for the RGBD/RGBT/RGBE suites.

Rebuild of ViPT/RGBT_workspace/test_rgbt_mgpus.py +
RGBE_workspace/test_rgbe_mgpus.py + eval_rgb{d,t,e}.sh orchestration as one
CLI. The reference fans out a spawn pool across GPUs; here sequences run
through one process (batched multi-sequence device parallelism replaces the
pool; multi-host sweeps shard the sequence list by process index).

Usage:
  python tools/eval_ope.py --dataset LasHeR --config deep_rgbt \
      --checkpoint ck.orbax [--dataset_root /data/lasher]
  python tools/eval_ope.py --dataset SYNTH --config deep_rgbt --synthetic
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   help="LasHeR|RGBT234|GTOT|VTUAV|VisEvent|DepthTrack|CDTB|SYNTH")
    p.add_argument("--config", default="deep_rgbt")
    p.add_argument("--tracker", default=None,
                   help="registry tracker name (overrides --config's ViPT); "
                        "see mmtrack_tpu.registry.list_trackers()")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--results_root", default="./workspace/results")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batched", type=int, default=0, metavar="B",
                   help="lockstep-batch B sequences per device pass "
                        "(eval/batched_ope.py; ViPT configs only). "
                        "Disk rgbcolormap batches stream rgb+JET-index at "
                        "4 B/px; MMTRACK_STREAM=yuv420 opts into raw 4:2:0 "
                        "planes at 2.5 B/px")
    p.add_argument("--analyze", action="store_true",
                   help="also compute SR/PR/NPR and F-score from the results")
    args = p.parse_args()

    from mmtrack_tpu.utils.hostmem import tune_host_allocator

    tune_host_allocator()  # frame decode is host-bound on this 1-core box
    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()  # first full compile is minutes on 1 core

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.eval.analysis import analyze_fscore, analyze_ope, print_results
    from mmtrack_tpu.eval.datasets import EvalSequence, list_sequences, load_sequence
    from mmtrack_tpu.eval.ope import run_dataset, run_sequence, result_path, save_result
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.parallel.mesh import process_local_slice
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker
    from mmtrack_tpu.utils.env import load_env_settings

    params = None
    if args.checkpoint:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.abspath(args.checkpoint))
        params = state["params"] if "params" in state else state
    else:
        print("WARNING: no checkpoint given; using random init (pipeline check)")

    if args.tracker:
        from mmtrack_tpu.registry import build_tracker
        tracker_factory = lambda: build_tracker(args.tracker, params=params)
    else:
        cfg = vipt_experiment_config(args.config)
        model = build_viptrack(cfg)
        rt = ViPTRuntime.from_config(cfg)
        if params is None:
            z = jnp.zeros((1, cfg.DATA.TEMPLATE.SIZE, cfg.DATA.TEMPLATE.SIZE, 6))
            x = jnp.zeros((1, cfg.DATA.SEARCH.SIZE, cfg.DATA.SEARCH.SIZE, 6))
            params = jax.jit(lambda r: model.init(r, z, x, None, rt.ce_keep_lens))(
                jax.random.PRNGKey(0))
        tracker_factory = lambda: ViPTTracker(model, params, rt)

    run_name = args.tracker or args.config

    if args.synthetic:
        frames, gt = make_synthetic_sequence(n_frames=12, height=240, width=320)
        seqs = [EvalSequence("synth_000", [None] * 12, [None] * 12, gt)]
        loaders = {"synth_000": lambda i: frames[i]}
        outputs = []
        for seq in seqs:
            path = result_path(args.results_root, args.dataset, run_name, seq.name)
            if not os.path.exists(path):
                res = run_sequence(tracker_factory(), seq,
                                   frame_loader=loaders[seq.name])
                save_result(path, res)
                print(f"{seq.name} , fps:{res['fps']:.2f}")
                outputs.append(res)
    else:
        root = args.dataset_root or load_env_settings().dataset_root(args.dataset)
        seq_dirs = list_sequences(root, args.dataset)
        seq_dirs = seq_dirs[process_local_slice(len(seq_dirs))]
        seqs = [load_sequence(d, args.dataset) for d in seq_dirs]
        if args.batched > 1:
            if args.tracker:
                p.error("--batched applies to ViPT configs (no --tracker)")
            from mmtrack_tpu.eval.batched_ope import run_dataset_batched
            from mmtrack_tpu.parallel.batched_eval import BatchedViPTTracker
            run_dataset_batched(
                lambda: BatchedViPTTracker(model, params, rt), seqs,
                args.results_root, args.dataset, run_name,
                batch_size=args.batched)
        else:
            run_dataset(tracker_factory, seqs,
                        args.results_root, args.dataset, run_name)

    if args.analyze:
        report = analyze_ope(seqs, args.results_root, args.dataset, run_name)
        print(print_results(report, run_name))
        fs = analyze_fscore(seqs, args.results_root, args.dataset, run_name)
        print(f"F-score: {fs['fscore']:.4f} (Pr {fs['precision']:.4f} / "
              f"Re {fs['recall']:.4f})")
        out = {"ope": {k: v for k, v in report["overall"].items()
                       if np.isscalar(v)}, "fscore": fs}
        with open(os.path.join(args.results_root, args.dataset,
                               f"{run_name}_report.json"), "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
