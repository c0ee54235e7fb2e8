"""Shared core for the FREE-RUNNING trajectory lockstep A/Bs (round 5).

The per-transition trajectory checks (check_trajectory_*.py) resynchronize
our online state to the reference's after every frame, so each frame tests
one step from an identical starting point but the accumulated-drift channel
(state -> crop -> state feedback) is never exercised. These free-running
checks close that channel: BOTH frameworks run uninterrupted from frame 0 —
each computing its OWN crops, updates and decisions, exactly as the
reference's deployment loop does (e.g. keep_track_vot2021/pytracking/
tracker/dimp/dimp.py:94-176 run end-to-end) — and the emitted boxes are
compared per frame over the full horizon.

Lockstep semantics: per-frame float noise (~1e-6 relative) compounds
through the feedback loop, so the comparison reports

  - per-frame box deviation (max over the 4 coords, px),
  - the lockstep horizon: the first frame whose deviation exceeds the
    caller's tolerance (== n_frames when none does),
  - discrete event-sequence equality (flags / update events / nominations),
    which must be EXACT over the locked horizon — a single differing
    branch decision is a runtime-semantics finding, not float noise.

Donors: random-weight donors put the reference's own decision ratios at
their 0.5x/0.8x thresholds, where sub-1e-3 noise legitimately flips
branches (documented in the per-transition checks). The free-running
checks therefore use the overfit donors from tools/parity/overfit_donors.py
(decisive response margins) wherever a family's decisions are
response-driven; purely closed-form families (MOSSE, SCSRDCF) free-run on
their production configuration directly.
"""

from __future__ import annotations

import numpy as np


def box_iou_xywh(a, b) -> float:
    """IoU of two [x, y, w, h] boxes."""
    ax1, ay1, aw, ah = [float(v) for v in a]
    bx1, by1, bw, bh = [float(v) for v in b]
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax1 + aw, bx1 + bw), min(ay1 + ah, by1 + bh)
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def compare_freerun(ref_boxes, our_boxes, tol_px: float, *,
                    ref_events=None, our_events=None,
                    min_horizon: int | None = None) -> dict:
    """Uniform free-run comparison -> result dict (caller adds family name).

    ref_boxes/our_boxes: (n, 4) xywh per tracked frame, same length.
    tol_px: per-frame lockstep tolerance on max coord deviation.
    ref_events/our_events: optional per-frame discrete event tuples
      (flags, update decisions, ...); compared exactly over the locked
      horizon.
    min_horizon: frames that must stay locked for pass (default: all).
    """
    ref_boxes = np.asarray(ref_boxes, np.float64)
    our_boxes = np.asarray(our_boxes, np.float64)
    assert ref_boxes.shape == our_boxes.shape, (ref_boxes.shape,
                                                our_boxes.shape)
    n = len(ref_boxes)
    dev = np.abs(ref_boxes - our_boxes).max(axis=1)
    beyond = np.nonzero(dev > tol_px)[0]
    horizon = int(beyond[0]) if len(beyond) else n

    event_mismatches = []
    if ref_events is not None:
        assert our_events is not None and len(ref_events) == n
        event_mismatches = [
            t for t in range(horizon)
            if tuple(ref_events[t]) != tuple(our_events[t])]

    ious = np.asarray([box_iou_xywh(ref_boxes[t], our_boxes[t])
                       for t in range(n)])
    need = n if min_horizon is None else min_horizon
    res = {
        "frames_tracked": n,
        "tol_px": tol_px,
        "lockstep_horizon": horizon,
        "max_box_dev_px": float(dev.max()),
        "mean_box_dev_px": float(dev.mean()),
        "max_box_dev_locked_px": float(dev[:horizon].max()) if horizon else 0.0,
        "min_iou": float(ious.min()),
        "event_mismatches": event_mismatches,
        "pass": bool(horizon >= need and not event_mismatches),
    }
    if horizon < n:
        res["break_frame"] = horizon
        res["break_dev_px"] = float(dev[horizon])
    return res
