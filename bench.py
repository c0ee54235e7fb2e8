"""Benchmark: ViPT batched multi-sequence tracking FPS per TPU chip.

Serving configuration: B sequences advance in lockstep; frames stream to the
device in chunks of T and a lax.scan drives the full per-frame loop (crop +
normalize + ViT-B forward + Hanning penalty + decode + map-back) entirely in
HBM — the north-star "online loop never leaves HBM". Compute in bfloat16
(fp32 params, fp32 decode); steady-state measurement excludes compilation,
includes the chunk host->device transfer.

FPS protocol matches the reference (frames / wall-clock,
ViPT/RGBT_workspace/test_rgbt_mgpus.py:117). Prints ONE JSON line.
vs_baseline = value / 35.0, the ViPT paper's ~35 FPS on its reference GPU
(the repo ships no machine-readable FPS — see BASELINE.md).
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_FPS = 35.0
BATCH = 16          # measured sweet spot on v5e-1 (8: ~1.25k, 16: ~1.7k, 32: transfer-bound)
CHUNK_T = 16
N_CHUNKS = 4
H, W = 240, 320


def main() -> None:
    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import (
        ViPTRuntime,
        vipt_init_state,
        vipt_track_scan_batched,
    )

    cfg = vipt_experiment_config("deep_rgbt")
    rt = ViPTRuntime.from_config(cfg)
    model = build_viptrack(cfg, dtype=jnp.bfloat16)

    z = jnp.zeros((1, 128, 128, 6), jnp.float32)
    x = jnp.zeros((1, 256, 256, 6), jnp.float32)
    params = jax.jit(lambda r: build_viptrack(cfg).init(
        r, z, x, None, rt.ce_keep_lens))(jax.random.PRNGKey(0))

    frames_np, gt = make_synthetic_sequence(n_frames=CHUNK_T + 1, height=H, width=W)
    init = jax.jit(jax.vmap(partial(vipt_init_state, rt)))
    scan = jax.jit(partial(vipt_track_scan_batched, rt, model), donate_argnums=(1,))

    f0 = jnp.asarray(np.tile(frames_np[0], (BATCH, 1, 1, 1)))
    b0 = jnp.asarray(np.tile(gt[0].astype(np.float32), (BATCH, 1)))
    chunk_np = np.tile(frames_np[1:][:, None], (1, BATCH, 1, 1, 1))  # (T,B,H,W,6)

    # compile + warmup
    state = init(f0, b0)
    state, boxes, scores = scan(params, state, jax.device_put(chunk_np))
    jax.block_until_ready(boxes)

    # steady state with double-buffered chunk upload: transfer of chunk i+1
    # overlaps the on-device scan of chunk i (async dispatch)
    state = init(f0, b0)
    t0 = time.perf_counter()
    nxt = jax.device_put(chunk_np)
    for i in range(N_CHUNKS):
        cur = nxt
        if i + 1 < N_CHUNKS:
            nxt = jax.device_put(chunk_np)
        state, boxes, scores = scan(params, state, cur)
    jax.block_until_ready(boxes)
    elapsed = time.perf_counter() - t0

    fps = BATCH * CHUNK_T * N_CHUNKS / elapsed
    print(json.dumps({
        "metric": "vipt_batched_track_fps_per_chip",
        "value": round(fps, 2),
        "unit": (f"frames/s (batch={BATCH} seqs, chunked lax.scan T={CHUNK_T}, "
                 f"{W}x{H}, ViT-B bf16)"),
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
