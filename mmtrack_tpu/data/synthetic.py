"""Synthetic multi-modal sequence generator for tests and benchmarks.

The reference repo ships one tiny OTB demo sequence as its only in-repo data
(RGBE/models/pyMDNet/datasets/OTB/DragonBaby). Datasets are not available in
this environment, so tests and golden-trajectory checks run on generated
moving-target sequences with RGB + auxiliary-modality channels.
"""

from __future__ import annotations

import numpy as np


def make_synthetic_sequence(n_frames: int = 20, height: int = 240, width: int = 320,
                            box0=(120.0, 90.0, 48.0, 36.0), velocity=(3.0, 2.0),
                            seed: int = 0, channels: int = 6,
                            target_rgb: float | None = 220,
                            target_aux: float | None = 180,
                            distractor: bool = False,
                            distractor_start_frame: int = 0,
                            return_distractor_gt: bool = False):
    """A bright square target moving over textured background.

    Returns (frames (N, H, W, C) uint8, gt_boxes (N, 4) float xywh).
    By default the target is salient in both modality triplets so even a
    weakly-trained model has signal; ground truth follows the analytic
    motion. `target_rgb=None` / `target_aux=None` leaves the target
    UNDRAWN in that triplet (pure background there) — the aux-only form
    models the ViPT new-modality setting where only the prompt modality
    carries the object (depth_utils.py:71-132's X channels).

    `distractor=True` adds a SECOND square with identical size and
    appearance on the mirrored trajectory (start reflected through the
    image center, velocity negated), so the two objects cross
    mid-sequence — the distractor-suppression setting KYS/KeepTrack exist
    for. The target is drawn second and wins overlaps; ground truth stays
    the target's. Drawn from an independent RNG so the default frames and
    every golden fixture are bit-unchanged.

    `distractor_start_frame` delays the distractor's first DRAWN frame
    (its analytic trajectory advances regardless): a distractor unseen by
    init-time learners enters mid-sequence as a fresh peak — the
    redetection/identity-jump regime. Default 0 keeps all existing frames
    bit-unchanged.

    `return_distractor_gt=True` appends the distractor's own xywh
    trajectory to the return tuple (None without `distractor`; NaN rows
    on frames before `distractor_start_frame`) — donor overfits use it to
    supervise a secondary response peak."""
    rng = np.random.RandomState(seed)
    bg = rng.randint(0, 80, (height, width, channels), np.uint8)
    frames = np.empty((n_frames, height, width, channels), np.uint8)
    gt = np.empty((n_frames, 4), np.float64)

    x, y, w, h = box0
    vx, vy = velocity
    if distractor:
        drng = np.random.RandomState(seed + 7777)
        dx, dy = width - x - w, height - y - h
        dvx, dvy = -vx, -vy
    dgt = np.empty((n_frames, 4), np.float64)

    def _draw(f, bx, by, tex_rng):
        xi, yi = int(round(bx)), int(round(by))
        x2, y2 = min(xi + int(w), width), min(yi + int(h), height)
        xi, yi = max(xi, 0), max(yi, 0)
        if target_rgb is not None:
            f[yi:y2, xi:x2, :3] = target_rgb
        if target_aux is not None:
            f[yi:y2, xi:x2, 3:] = target_aux
        tex = tex_rng.randint(-20, 20, f[yi:y2, xi:x2].shape)
        if target_rgb is None:
            tex[..., :3] = 0
        if target_aux is None:
            tex[..., 3:] = 0
        f[yi:y2, xi:x2] = np.clip(
            f[yi:y2, xi:x2].astype(np.int16) + tex, 0, 255).astype(np.uint8)

    for t in range(n_frames):
        f = bg.copy()
        if distractor:
            if t >= distractor_start_frame:
                _draw(f, dx, dy, drng)
                dgt[t] = (dx, dy, w, h)
            else:
                dgt[t] = np.nan
            dx += dvx
            dy += dvy
            if not (0 <= dx <= width - w):
                dvx = -dvx
            if not (0 <= dy <= height - h):
                dvy = -dvy
        xi, yi = int(round(x)), int(round(y))
        x2, y2 = min(xi + int(w), width), min(yi + int(h), height)
        xi, yi = max(xi, 0), max(yi, 0)
        if target_rgb is not None:
            f[yi:y2, xi:x2, :3] = target_rgb
        if target_aux is not None:
            f[yi:y2, xi:x2, 3:] = target_aux
        # light texture inside the target; the draw always covers the full
        # box so the RNG stream — and every golden fixture generated with
        # the defaults — is unchanged, but it is only APPLIED to triplets
        # that carry the target (texture would otherwise reveal it)
        tex = rng.randint(-20, 20, f[yi:y2, xi:x2].shape)
        if target_rgb is None:
            tex[..., :3] = 0
        if target_aux is None:
            tex[..., 3:] = 0
        f[yi:y2, xi:x2] = np.clip(
            f[yi:y2, xi:x2].astype(np.int16) + tex, 0, 255).astype(np.uint8)
        frames[t] = f
        gt[t] = (x, y, w, h)
        x += vx
        y += vy
        if not (0 <= x <= width - w):
            vx = -vx
        if not (0 <= y <= height - h):
            vy = -vy
    if return_distractor_gt:
        return frames, gt, (dgt if distractor else None)
    return frames, gt
