"""Demo: run any zoo tracker over a sequence and dump visualizations.

UX parity with the reference's per-tracker test.py/run.sh entries
(RGBE/benchmark.py:25-49 intended invocation) without needing datasets: by
default a synthetic multi-modal sequence is generated; pass --rgb_dir/--x_dir
for a real one.

  python tools/demo.py --tracker vipt_deep_rgbt --out /tmp/demo
  python tools/demo.py --tracker siamfc --frames 30
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tracker", default="vipt_deep_rgbt")
    p.add_argument("--out", default="./workspace/demo")
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--rgb_dir", default=None, help="directory of RGB frames")
    p.add_argument("--x_dir", default=None, help="directory of X-modality frames")
    p.add_argument("--init_box", default=None, help="x,y,w,h for real sequences")
    p.add_argument("--dtype", default="rgbrgb")
    p.add_argument("--dashboard", action="store_true",
                   help="serve the live interactive debug UI "
                        "(pause/step, score-map heatmaps) on localhost")
    p.add_argument("--pause", action="store_true",
                   help="start the dashboard paused (step frame-by-frame)")
    args = p.parse_args()

    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()

    from mmtrack_tpu.data.composition import get_x_frame
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.registry import build_tracker
    from mmtrack_tpu.vis import TrackingVisualizer

    if args.rgb_dir:
        rgbs = sorted(os.path.join(args.rgb_dir, f) for f in os.listdir(args.rgb_dir))
        xs = (sorted(os.path.join(args.x_dir, f) for f in os.listdir(args.x_dir))
              if args.x_dir else [None] * len(rgbs))
        frames = [get_x_frame(r, x, args.dtype) for r, x in zip(rgbs, xs)]
        init_box = [float(v) for v in args.init_box.split(",")]
        gt = None
    else:
        arr, gt = make_synthetic_sequence(n_frames=args.frames)
        frames = list(arr)
        init_box = gt[0].tolist()

    tracker = build_tracker(args.tracker)
    vis = TrackingVisualizer(args.out)
    dash = None
    if args.dashboard:
        from mmtrack_tpu.vis_server import DebugDashboard

        dash = DebugDashboard(pause_mode=args.pause)
    tracker.initialize(frames[0], {"init_bbox": init_box})
    vis.add_frame(0, frames[0], init_box,
                  gt_box=None if gt is None else gt[0])
    for t in range(1, len(frames)):
        out = tracker.track(frames[t])
        vis.add_frame(t, frames[t], out["target_bbox"],
                      gt_box=None if gt is None else gt[t],
                      score=out.get("best_score"),
                      mask=out.get("segmentation"))
        if dash is not None:
            dash.register((frames[t], out["target_bbox"],
                           out.get("segmentation")), "tracking", 1,
                          "Tracking")
            if out.get("score_map") is not None:
                dash.register(out["score_map"], "heatmap", 1, "Score Map")
            dash.register({"frame": t,
                           "score": round(float(out.get("best_score", 0)), 4)},
                          "info_dict", 1, "Status")
            dash.wait_if_paused()
        print(f"frame {t}: box={['%.1f' % v for v in out['target_bbox']]} "
              f"score={out.get('best_score', 0):.3f}")
    print("visualization:", vis.write_index())


if __name__ == "__main__":
    main()
