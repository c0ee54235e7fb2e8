"""On-chip A/B of the fused Pallas path vs plain XLA.

Two harnesses, both scan-amortized (per-call dispatch pays a ~25 ms
tunnel round-trip on this backend — docs/PERF.md "Honest timing") and
readback-synced:

  fwd: the bf16 ViT-B-CE-prompt forward alone, chained T times
  loop: the full device-resident tracking step (bench.py's DR phase:
        crop + normalize + forward + hann + decode + map-back), best-of-R

Usage:
  python tools/ab_kernels.py fwd fused|xla [B] [T]
  python tools/ab_kernels.py loop fused|xla
  python tools/ab_kernels.py crop gather|mxu|pallas   # full loop, crop impl A/B

Round-4 on-hardware results (v5e-1): fwd 10.55 -> 7.92 ms (B=16);
loop 1190 -> 1355 fps (fused attn/MLP), then 1358 -> 1858 fps from
MMTRACK_CROP=mxu (the gather crop was ~3.2 ms of the step — now the TPU
default). See docs/PERF.md "Round 4" / "Round 4b" sections.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _setup(mode: str):
    os.environ["MMTRACK_ATTN"] = mode
    os.environ["MMTRACK_MLP"] = mode


def run_fwd(mode: str, B: int = 16, T: int = 32) -> None:
    _setup(mode)
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime

    cfg = vipt_experiment_config("deep_rgbt")
    model = build_viptrack(cfg, dtype=jnp.bfloat16)
    rt = ViPTRuntime.from_config(cfg)
    z = jnp.zeros((B, 128, 128, 6), jnp.float32)
    x = jnp.zeros((B, 256, 256, 6), jnp.float32)
    params = jax.jit(lambda r: model.init(
        r, z[:1], x[:1], None, rt.ce_keep_lens))(jax.random.PRNGKey(0))

    @jax.jit
    def chain(params, template, search):
        def body(carry, _):
            out = model.apply(params, template + carry, search, None,
                              rt.ce_keep_lens)
            return jnp.sum(out["pred_boxes"]) * 1e-6, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=T)
        return c

    np.asarray(chain(params, z, x))   # compile + land
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(chain(params, z, x))
        times.append(time.perf_counter() - t0)
    med = float(np.median(np.asarray(times[1:]) * 1e3)) / T
    print(f"fwd mode={mode} B={B} T={T}: per-forward {med:.2f} ms  "
          f"fwd-fps {B / (med / 1e3):.0f}")


def run_loop(mode: str, reps: int = 3, crop_mode: str | None = None) -> None:
    _setup(mode)
    if crop_mode:
        os.environ["MMTRACK_CROP"] = crop_mode
    from functools import partial

    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import (
        ViPTRuntime,
        vipt_init_state,
        vipt_track_scan_batched,
    )
    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()
    B, T, CHUNKS, H, W = 16, 16, 4, 240, 320
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
    frames_np, gt = make_synthetic_sequence(n_frames=T + 1, height=H, width=W)
    f0 = jnp.asarray(np.tile(frames_np[0], (B, 1, 1, 1)))
    b0 = jnp.asarray(np.tile(gt[0].astype(np.float32), (B, 1)))
    chunk_dev = jax.device_put(
        np.tile(frames_np[1:][:, None], (1, B, 1, 1, 1)))
    state = init(f0, b0)
    state, boxes, _ = scan(params, state, chunk_dev)
    np.asarray(boxes)
    best = float("inf")
    for rep in range(reps):
        state = init(f0, b0)
        np.asarray(jax.tree.leaves(state)[0][:1, :1])
        t0 = time.perf_counter()
        for _ in range(CHUNKS):
            state, boxes, _ = scan(params, state, chunk_dev)
        np.asarray(boxes)
        el = time.perf_counter() - t0
        best = min(best, el)
        tag = f"{mode}" + (f"/crop={crop_mode}" if crop_mode else "")
        print(f"loop mode={tag} rep{rep}: {B * T * CHUNKS / el:.1f} fps")
    tag = f"{mode}" + (f"/crop={crop_mode}" if crop_mode else "")
    print(f"loop mode={tag} best: {B * T * CHUNKS / best:.1f} fps "
          f"({best * 1e3 / (T * CHUNKS):.2f} ms/step)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
    if which == "fwd":
        run_fwd(mode, int(sys.argv[3]) if len(sys.argv) > 3 else 16,
                int(sys.argv[4]) if len(sys.argv) > 4 else 32)
    elif which == "crop":
        run_loop("fused", crop_mode=mode if mode != "fused" else "gather")
    else:
        run_loop(mode)
