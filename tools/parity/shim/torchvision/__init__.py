"""Minimal torchvision stand-in for tools/parity (torchvision not installed).

Only the handful of symbols the reference trackers import: box_area/box_iou
(torchvision.ops.boxes), a version string, and bare transforms used at
import time but not in the model-forward parity path.
"""

__version__ = "0.0-shim"

from . import ops, transforms  # noqa: F401
