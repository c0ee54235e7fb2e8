"""Benchmark: ViPT batched multi-sequence tracking FPS per TPU chip.

Two measurements, one honest headline:

1. STREAMED (the headline `value`): frames come from DISK — 640x480 color
   JPEG + 16-bit depth PNG pairs (DepthTrack's on-disk format), composed to
   rgbcolormap on the host (data/composition.py, identical work to the
   reference's get_rgbd_frame), uploaded as uint8 chunks with a
   double-buffered reader thread so host IO/decode overlaps the on-device
   scan. This is the full serving pipeline on this box (ONE CPU core feeds
   the chip; the reference FPS protocol also times the full loop,
   ViPT/RGBT_workspace/test_rgbt_mgpus.py:102-117).
2. DEVICE-RESIDENT (`device_resident_fps`): frames already in HBM — the
   compute ceiling of the same per-frame loop (crop + normalize + ViT-B
   bf16 forward + Hann penalty + decode + map-back) as a chunked lax.scan.

B sequences advance in lockstep; steady-state timing excludes compilation.
vs_baseline = streamed value / 35.0 (the ViPT paper's ~35 FPS on its
reference GPU; repo ships no machine-readable FPS — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_FPS = 35.0

# device-resident configuration (v5e-1 sweet spot from round 1)
DR_BATCH, DR_CHUNK_T, DR_CHUNKS, DR_H, DR_W = 16, 16, 4, 240, 320

# streamed-from-disk configuration: DepthTrack-like 640x480 sources
ST_BATCH, ST_CHUNK_T, ST_CHUNKS, ST_H, ST_W = 8, 8, 6, 480, 640
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_cache", "depthtrack_like")


def _ensure_fixtures(n_seq: int, n_frames: int) -> None:
    """Write 640x480 JPEG+PNG sequences once (synthetic content, real
    decode/compose cost)."""
    import cv2

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    marker = os.path.join(FIXTURE_DIR, f"ok_{n_seq}x{n_frames}")
    if os.path.exists(marker):
        return
    for b in range(n_seq):
        frames, _ = make_synthetic_sequence(n_frames=n_frames, height=ST_H,
                                            width=ST_W, seed=100 + b)
        cdir = os.path.join(FIXTURE_DIR, f"seq{b:02d}", "color")
        ddir = os.path.join(FIXTURE_DIR, f"seq{b:02d}", "depth")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        rng = np.random.RandomState(b)
        depth_base = rng.randint(500, 4000, (ST_H, ST_W), np.uint16)
        for t in range(n_frames):
            cv2.imwrite(os.path.join(cdir, f"{t:04d}.jpg"),
                        frames[t][..., :3][..., ::-1])  # BGR jpeg
            cv2.imwrite(os.path.join(ddir, f"{t:04d}.png"),
                        (depth_base + 10 * t).astype(np.uint16))
    open(marker, "w").close()


def _read_chunk(t0: int, T: int, n_seq: int, out: np.ndarray | None = None) -> np.ndarray:
    """Decode + compose one (T, B, H, W, 6) uint8 chunk from disk into a
    (reusable) staging buffer. Buffer reuse matters doubly here: fresh
    allocations fault on first touch AND device_put of cold pages runs
    ~100x slower through the tunnel (see utils/hostmem.py)."""
    from mmtrack_tpu.data.composition import get_x_frame
    from mmtrack_tpu.utils.hostmem import tune_host_allocator

    tune_host_allocator()
    if out is None:
        out = np.empty((T, n_seq, ST_H, ST_W, 6), np.uint8)
        out.fill(0)  # pre-touch
    for dt in range(T):
        t = t0 + dt
        for b in range(n_seq):
            sd = os.path.join(FIXTURE_DIR, f"seq{b:02d}")
            out[dt, b] = get_x_frame(
                os.path.join(sd, "color", f"{t:04d}.jpg"),
                os.path.join(sd, "depth", f"{t:04d}.png"),
                "rgbcolormap", depth_clip=True)
    return out


def _read_chunk_raw(t0: int, T: int, n_seq: int):
    """Decode only: (T,B,H,W,3) uint8 RGB + (T,B,H,W) uint16 depth. The
    clip/normalize/JET composition runs ON DEVICE (ops/compose.py) — the
    1-core host does nothing but imread."""
    import cv2

    from mmtrack_tpu.utils.hostmem import tune_host_allocator

    tune_host_allocator()
    rgb = np.empty((T, n_seq, ST_H, ST_W, 3), np.uint8)
    dep = np.empty((T, n_seq, ST_H, ST_W), np.uint16)
    for dt in range(T):
        t = t0 + dt
        for b in range(n_seq):
            sd = os.path.join(FIXTURE_DIR, f"seq{b:02d}")
            im = cv2.imread(os.path.join(sd, "color", f"{t:04d}.jpg"))
            rgb[dt, b] = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            dep[dt, b] = cv2.imread(os.path.join(sd, "depth", f"{t:04d}.png"), -1)
    return rgb, dep


class _Prefetcher(threading.Thread):
    """Double-buffered disk reader: chunk i+1 is decoded into one of two
    persistent pre-touched staging buffers and device_put while the device
    scans chunk i. The staging buffers are blocked-on after upload so their
    warm pages are reused (cold-page device_put is pathological here)."""

    def __init__(self, n_chunks: int, T: int, n_seq: int):
        super().__init__(daemon=True)
        self.n_chunks, self.T, self.n_seq = n_chunks, T, n_seq
        self.bufs = [np.zeros((T, n_seq, ST_H, ST_W, 6), np.uint8)
                     for _ in range(2)]
        self.slots = [None] * n_chunks
        self.ready = [threading.Event() for _ in range(n_chunks)]

    def run(self):
        for i in range(self.n_chunks):
            buf = self.bufs[i % 2]
            _read_chunk(1 + i * self.T, self.T, self.n_seq, out=buf)
            dev = jax.device_put(buf)
            jax.block_until_ready(dev)  # buffer safe to rewrite next round
            self.slots[i] = dev
            self.ready[i].set()

    def get(self, i: int):
        self.ready[i].wait()
        chunk, self.slots[i] = self.slots[i], None
        return chunk


def main() -> None:
    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import (
        ViPTRuntime,
        vipt_init_state,
        vipt_track_scan_batched,
    )

    cfg = vipt_experiment_config("deep_rgbd")
    rt = ViPTRuntime.from_config(cfg)
    model = build_viptrack(cfg, dtype=jnp.bfloat16)

    z = jnp.zeros((1, 128, 128, 6), jnp.float32)
    x = jnp.zeros((1, 256, 256, 6), jnp.float32)
    params = jax.jit(lambda r: build_viptrack(cfg).init(
        r, z, x, None, rt.ce_keep_lens))(jax.random.PRNGKey(0))

    init = jax.jit(jax.vmap(partial(vipt_init_state, rt)))
    scan = jax.jit(partial(vipt_track_scan_batched, rt, model),
                   donate_argnums=(1,))

    # ---------------- device-resident ceiling (320x240 in-HBM frames)
    frames_np, gt = make_synthetic_sequence(n_frames=DR_CHUNK_T + 1,
                                            height=DR_H, width=DR_W)
    f0 = jnp.asarray(np.tile(frames_np[0], (DR_BATCH, 1, 1, 1)))
    b0 = jnp.asarray(np.tile(gt[0].astype(np.float32), (DR_BATCH, 1)))
    chunk_np = np.tile(frames_np[1:][:, None], (1, DR_BATCH, 1, 1, 1))

    state = init(f0, b0)
    state, boxes, _ = scan(params, state, jax.device_put(chunk_np))
    jax.block_until_ready(boxes)

    # round-1 protocol: double-buffered chunk upload; fresh input buffers
    # each dispatch (reused buffers give bogus timings on this backend)
    state = init(f0, b0)
    t0 = time.perf_counter()
    nxt = jax.device_put(chunk_np)
    for i in range(DR_CHUNKS):
        cur = nxt
        if i + 1 < DR_CHUNKS:
            nxt = jax.device_put(chunk_np)
        state, boxes, _ = scan(params, state, cur)
    jax.block_until_ready(boxes)
    dr_elapsed = time.perf_counter() - t0
    dr_fps = DR_BATCH * DR_CHUNK_T * DR_CHUNKS / dr_elapsed

    # ---------------- streamed end-to-end (disk 640x480 jpeg+png)
    # Host composes (decode+clip+JET) at ~16ms/frame once the allocator is
    # tuned (utils/hostmem.py; untuned this box runs 10x slower on mmap
    # churn), overlapping the ~6ms/frame device scan via the prefetch
    # thread. The device-side composition (ops/compose.py, bit-exact) is
    # available for hosts with decode workers to spare; on this 1-core box
    # the LUT-gather-heavy compose costs more than it saves.
    from mmtrack_tpu.utils.hostmem import tune_host_allocator

    tune_host_allocator()
    n_frames = 1 + ST_CHUNK_T * ST_CHUNKS
    _ensure_fixtures(ST_BATCH, n_frames)

    init_frames = _read_chunk(0, 1, ST_BATCH)[0]
    _, gt2 = make_synthetic_sequence(n_frames=2, height=ST_H, width=ST_W,
                                     seed=100)
    f0 = jnp.asarray(init_frames)
    b0 = jnp.asarray(np.tile(gt2[0].astype(np.float32), (ST_BATCH, 1)))

    # compile at the streamed shapes
    state = init(f0, b0)
    warm = jax.device_put(np.zeros((ST_CHUNK_T, ST_BATCH, ST_H, ST_W, 6),
                                   np.uint8))
    state, boxes, _ = scan(params, state, warm)
    jax.block_until_ready(boxes)

    state = init(f0, b0)
    reader = _Prefetcher(ST_CHUNKS, ST_CHUNK_T, ST_BATCH)
    t0 = time.perf_counter()
    reader.start()
    for i in range(ST_CHUNKS):
        state, boxes, _ = scan(params, state, reader.get(i))
    jax.block_until_ready(boxes)
    st_elapsed = time.perf_counter() - t0
    st_fps = ST_BATCH * ST_CHUNK_T * ST_CHUNKS / st_elapsed

    print(json.dumps({
        "metric": "vipt_streamed_track_fps_per_chip",
        "value": round(st_fps, 2),
        "unit": (f"frames/s end-to-end (disk 640x480 jpeg+16bit-png, 1-core "
                 f"host decode+rgbcolormap compose, batch={ST_BATCH} seqs, "
                 f"prefetch-overlapped upload, ViT-B bf16)"),
        "vs_baseline": round(st_fps / REFERENCE_GPU_FPS, 3),
        "device_resident_fps": round(dr_fps, 2),
        "device_resident_unit": (f"frames/s with frames in HBM "
                                 f"({DR_W}x{DR_H}, batch={DR_BATCH}, "
                                 f"lax.scan T={DR_CHUNK_T})"),
        "host": "1 CPU core feeds the chip; gap to ceiling = decode+compose+tunnel",
    }))


if __name__ == "__main__":
    main()
