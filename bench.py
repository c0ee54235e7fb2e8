"""Benchmark: ViPT batched multi-sequence tracking FPS per TPU chip.

Protocol mirrors the reference's FPS measurement (frames / wall-clock,
ViPT/RGBT_workspace/test_rgbt_mgpus.py:117) but uses the TPU-native batched
path: B sequences advance in lockstep through the jitted track step
(preprocessing + ViT-B forward + decode all on device). Steady-state only
(compile excluded), host->device frame transfer included — that is the real
serving loop.

Prints ONE JSON line {metric, value, unit, vs_baseline}.
vs_baseline is value / 35.0: the ViPT paper's reported ~35 FPS on its
reference desktop GPU (the repo itself ships no machine-readable FPS —
BASELINE.md); >1.0 means faster than the reference per device.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_FPS = 35.0
BATCH = 8
N_STEPS = 40
WARMUP = 5
H, W = 240, 320


def main() -> None:
    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.parallel.batched_eval import make_batched_track_step
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime

    cfg = vipt_experiment_config("deep_rgbt")
    model = build_viptrack(cfg)
    rt = ViPTRuntime.from_config(cfg)

    z = jnp.zeros((1, 128, 128, 6), jnp.float32)
    x = jnp.zeros((1, 256, 256, 6), jnp.float32)
    params = jax.jit(lambda r: model.init(r, z, x, None, rt.ce_keep_lens))(
        jax.random.PRNGKey(0))

    frames_np, gt = make_synthetic_sequence(n_frames=N_STEPS + WARMUP + 1,
                                            height=H, width=W)
    init_fn, step_fn = make_batched_track_step(rt, model)

    frames0 = jnp.asarray(np.tile(frames_np[0], (BATCH, 1, 1, 1)))
    boxes0 = jnp.asarray(np.tile(gt[0].astype(np.float32), (BATCH, 1)))
    state = init_fn(frames0, boxes0)

    # warmup (compile + first dispatches)
    for t in range(1, WARMUP + 1):
        f = jnp.asarray(np.tile(frames_np[t], (BATCH, 1, 1, 1)))
        state, b, s = step_fn(params, state, f)
    jax.block_until_ready(b)

    t0 = time.perf_counter()
    for t in range(WARMUP + 1, WARMUP + 1 + N_STEPS):
        f = jnp.asarray(np.tile(frames_np[t], (BATCH, 1, 1, 1)))
        state, b, s = step_fn(params, state, f)
    jax.block_until_ready(b)
    elapsed = time.perf_counter() - t0

    fps = BATCH * N_STEPS / elapsed
    print(json.dumps({
        "metric": "vipt_batched_track_fps_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s (batch={BATCH} sequences, {W}x{H}, ViT-B fp32)",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
