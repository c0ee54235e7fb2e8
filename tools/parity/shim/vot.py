"""Minimal stub of the `vot` TraX client package (vot-trax on PyPI).

The reference's test trackers import `vot` at module scope
(ViPT/lib/test/tracker/vipt.py:11) but only use it inside the VOT
protocol entry points, which the parity harness never exercises. This
stub provides the public names so the module imports on a box without
the vot toolkit installed. It stubs a public third-party package's API,
not reference code.
"""

import collections

Rectangle = collections.namedtuple("Rectangle", ["x", "y", "width", "height"])
Point = collections.namedtuple("Point", ["x", "y"])
Polygon = collections.namedtuple("Polygon", ["points"])


class VOT:  # pragma: no cover - never constructed by the parity harness
    def __init__(self, *args, **kwargs):
        raise RuntimeError("vot shim: TraX protocol not available")
