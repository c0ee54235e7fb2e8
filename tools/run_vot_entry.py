"""VOT toolkit entry (vipt_baseline.py analog): launched by `vot evaluate`
per sequence via trackers.ini protocol=traxpython.

Select the tracker with MMTRACK_TRACKER (default vipt_deep_rgbd) and the
composition with MMTRACK_DTYPE (rgbcolormap for RGBD stacks, rgbrgb for RGBT).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmtrack_tpu.eval.vot import run_vot_exp
from mmtrack_tpu.registry import build_tracker

name = os.environ.get("MMTRACK_TRACKER", "vipt_deep_rgbd")
dtype = os.environ.get("MMTRACK_DTYPE", "rgbcolormap")
channels = os.environ.get("MMTRACK_CHANNELS", "rgbd")
run_vot_exp(lambda: build_tracker(name), channels=channels, dtype=dtype)
