"""Modality benchmark orchestrator: run a suite of trackers over a dataset.

Rebuild of the reference's top-level drivers (RGBD/benchmark.py:6-62,
RGBT/benchmark.py:5-39, RGBE/benchmark.py:5-49 — per-model `os.chdir` +
`os.system("bash run.sh")` loops, shipped fully commented out): here the zoo
is a registry, so the sweep is a loop over recipes with shared eval/analysis,
emitting one consolidated report.

  python tools/benchmark_suite.py --modality rgbt --dataset LasHeR
  python tools/benchmark_suite.py --modality rgbe --synthetic
  python tools/benchmark_suite.py --trackers siamfc,vipt_deep_rgbt --synthetic
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modality", default=None, choices=["rgbd", "rgbt", "rgbe", "rgb"])
    p.add_argument("--trackers", default=None, help="comma-separated names")
    p.add_argument("--dataset", default="SYNTH")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--results_root", default="./workspace/results")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--frames", type=int, default=12)
    args = p.parse_args()

    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.eval.analysis import analyze_fscore, analyze_ope
    from mmtrack_tpu.eval.datasets import EvalSequence, list_sequences, load_sequence
    from mmtrack_tpu.eval.ope import result_path, run_sequence, save_result
    from mmtrack_tpu.registry import build_tracker, list_trackers
    from mmtrack_tpu.utils.env import load_env_settings

    names = (args.trackers.split(",") if args.trackers
             else list_trackers(args.modality))
    print(f"benchmarking {len(names)} trackers: {names}")

    if args.synthetic:
        frames, gt = make_synthetic_sequence(n_frames=args.frames,
                                             height=240, width=320)
        seqs = [EvalSequence("synth_000", [None] * args.frames,
                             [None] * args.frames, gt)]
        loaders = {"synth_000": lambda i: frames[i]}
    else:
        root = args.dataset_root or load_env_settings().dataset_root(args.dataset)
        seqs = [load_sequence(d, args.dataset)
                for d in list_sequences(root, args.dataset)]
        loaders = None

    report = {}
    for name in names:
        for seq in seqs:
            path = result_path(args.results_root, args.dataset, name, seq.name)
            if os.path.exists(path):
                continue
            tracker = build_tracker(name)
            res = run_sequence(tracker, seq,
                               frame_loader=None if loaders is None
                               else loaders[seq.name])
            save_result(path, res, fmt=seq.save_fmt,
                        delimiter=seq.save_delimiter)
            print(f"[{name}] {seq.name} fps:{res['fps']:.2f}")
        ope = analyze_ope(seqs, args.results_root, args.dataset, name)
        fs = analyze_fscore(seqs, args.results_root, args.dataset, name)
        report[name] = {
            "SR": round(ope["overall"]["success_auc"] * 100, 2),
            "PR": round(ope["overall"]["precision_20px"] * 100, 2),
            "F": round(fs["fscore"], 4),
        }
        print(f"[{name}] SR {report[name]['SR']} | PR {report[name]['PR']} "
              f"| F {report[name]['F']}")

    out_path = os.path.join(args.results_root, args.dataset, "suite_report.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("suite report:", out_path)


if __name__ == "__main__":
    main()
