"""Interactive debug dashboard (vis_server.py) vs the reference's visdom
UI semantics (ViPT/lib/vis/visdom_cus.py; basetracker.py:59-83): the
register() facade, per-type rendering endpoints, debug-level gating, and
the pause / single-step frame gate."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from mmtrack_tpu.vis_server import DebugDashboard


@pytest.fixture()
def dash():
    d = DebugDashboard(log=None)
    yield d
    d.close()


def _get(dash, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{dash.port}{path}", timeout=5) as r:
        return json.loads(r.read())


def _post(dash, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{dash.port}{path}",
        data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_register_and_state(dash):
    dash.register(np.random.rand(6, 6), "heatmap", 1, "Score Map")
    dash.register((np.zeros((32, 48, 3), np.uint8), [4, 4, 10, 8]),
                  "tracking", 1, "Tracking")
    dash.register({"flag": "normal", "score": 0.9}, "info_dict", 1, "Status")
    s = _get(dash, "/state")
    assert set(s["titles"]) == {"Score Map", "Tracking", "Status"}
    assert s["titles"]["Score Map"]["type"] == "heatmap"

    hm = _get(dash, "/data?title=Score%20Map")
    assert hm["type"] == "heatmap" and len(hm["values"]) == 6
    assert hm["max"] >= hm["min"]

    tr = _get(dash, "/data?title=Tracking")
    assert tr["type"] == "tracking" and len(tr["jpeg"]) > 100

    st = _get(dash, "/data?title=Status")
    assert st["info"]["flag"] == "normal"


def test_debug_level_gating(dash):
    dash.register(np.zeros((2, 2)), "heatmap", 5, "TooDeep")
    assert "TooDeep" not in _get(dash, "/state")["titles"]


def test_index_page_served(dash):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{dash.port}/", timeout=5) as r:
        page = r.read().decode()
    assert "mmtrack_tpu debug" in page and "ArrowRight" in page


def test_pause_and_single_step(dash):
    # pause via the control endpoint, assert the gate blocks, then step
    # exactly one frame through, then resume
    _post(dash, "/control", {"action": "pause"})
    assert _get(dash, "/state")["paused"] is True

    passed = []

    def loop():
        for i in range(3):
            dash.wait_if_paused(poll=0.01)
            passed.append(i)

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    time.sleep(0.25)
    assert passed == []          # blocked at frame 0

    _post(dash, "/control", {"action": "step"})
    time.sleep(0.25)
    assert passed == [0]         # exactly one frame released

    _post(dash, "/control", {"action": "resume"})
    th.join(timeout=2)
    assert passed == [0, 1, 2]
    assert _get(dash, "/state")["paused"] is False


def test_ope_run_sequence_feeds_dashboard(dash):
    from mmtrack_tpu.eval.datasets import EvalSequence
    from mmtrack_tpu.eval.ope import run_sequence

    class Dummy:
        def initialize(self, image, info):
            self.box = list(info["init_bbox"])

        def track(self, image):
            self.box[0] += 1
            return {"target_bbox": list(self.box), "best_score": 0.5,
                    "score_map": np.random.rand(4, 4)}

    frames = np.zeros((5, 24, 32, 6), np.uint8)
    seq = EvalSequence("s", [None] * 5, [None] * 5,
                       np.tile([2.0, 2.0, 6.0, 6.0], (5, 1)))
    run_sequence(Dummy(), seq, frame_loader=lambda i: frames[i],
                 dashboard=dash)
    titles = _get(dash, "/state")["titles"]
    assert {"Tracking", "Score Map", "Status"} <= set(titles)
    assert _get(dash, "/state")["frame"] == 4
