"""Measured training throughput on the chip: the round-5 PERF item.

One pjit-compiled fwd+bwd+update step of the production ViPT (deep_rgbd,
ViT-B, 128/256 crops with CE) at the bf16 compute dtype, swept over batch
sizes, on the real TPU. The reference's own telemetry is the per-batch FPS
line of its LTR trainer (ViPT/lib/train/trainers/ltr_trainer.py:130-136,
printed every 50 batches of its 2-GPU DDP run); this is the artifact-level
equivalent for the TPU rebuild.

Method: jit the full train step (value_and_grad + adamw update, params
donated), warm it with 2 steps (compile + cache), then time N dispatched
steps with ONE readback at the end (np.asarray of the loss — dispatch acks
are not completion on this tunnel, docs/PERF.md). MFU is reported against
the 44.3 GFLOP/frame forward cost (docs/PERF.md roofline) x3 for bwd, over
the chip's bf16 peak.

Run: PYTHONPATH=/root/repo python tools/bench_train.py [--batches 16 32]
Prints one JSON line per batch size + a summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

FWD_GFLOP_PER_FRAME = 44.3   # docs/PERF.md roofline (deep_rgbd, CE on)
BWD_FACTOR = 3.0             # fwd + ~2x fwd for the backward pass
PEAK_BF16_TFLOPS = 197.0     # TPU v5e (v5 lite) bf16 peak per chip


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args(argv)

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.vipt import (build_viptrack, ce_keep_schedule,
                                         generate_ctr_mask)
    from mmtrack_tpu.train.optim import build_optimizer, prompt_only_mask
    from mmtrack_tpu.train.train_step import TrainState, make_train_step
    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()
    cfg = vipt_experiment_config("deep_rgbd")
    model = build_viptrack(cfg, dtype=jnp.bfloat16)
    Tz, Tx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    stride = model.patch_size
    keep = ce_keep_schedule(Tx // stride * (Tx // stride),
                            tuple(model.ce_loc),
                            tuple(cfg.MODEL.BACKBONE.CE_KEEP_RATIO))
    mask_z = generate_ctr_mask(Tz // stride, "CTR_POINT")

    z1 = jnp.zeros((1, Tz, Tz, 6), jnp.float32)
    x1 = jnp.zeros((1, Tx, Tx, 6), jnp.float32)
    params = jax.jit(lambda r: model.init(r, z1, x1, mask_z, keep))(
        jax.random.PRNGKey(0))
    mask = {"params": prompt_only_mask(params["params"])}
    tx = build_optimizer(params, lr=4e-4, lr_drop_step=100,
                         trainable_mask=mask)
    step = make_train_step(model, tx, box_mask_z=mask_z, ce_keep_lens=keep,
                           search_size=Tx, stride=stride)

    results = {}
    for B in args.batches:
        rng = np.random.RandomState(0)
        batch = {
            "template": jnp.asarray(rng.randn(B, Tz, Tz, 6), jnp.float32),
            "search": jnp.asarray(rng.randn(B, Tx, Tx, 6), jnp.float32),
            "search_anno": jnp.asarray(rng.uniform(0.2, 0.4, (B, 4)),
                                       jnp.float32),
        }
        jstep = jax.jit(step, donate_argnums=(0,))
        state = TrainState.create(params, tx)
        key = jax.random.PRNGKey(0)
        # warm: compile + one real completion
        for _ in range(2):
            state, stats = jstep(state, batch, key)
        loss0 = float(np.asarray(stats["Loss/total"]))

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, stats = jstep(state, batch, key)
        lossN = float(np.asarray(stats["Loss/total"]))  # real completion
        dt = (time.perf_counter() - t0) / args.steps

        sps = B / dt
        tflops = B * FWD_GFLOP_PER_FRAME * BWD_FACTOR / dt / 1e3
        mfu = tflops / PEAK_BF16_TFLOPS
        results[B] = {"ms_per_step": round(dt * 1e3, 2),
                      "samples_per_s": round(sps, 1),
                      "model_tflops": round(tflops, 1),
                      "mfu_vs_bf16_peak": round(mfu, 3)}
        print(json.dumps({"metric": "vipt_train_step", "batch": B,
                          "steps_timed": args.steps,
                          "loss_first": round(loss0, 4),
                          "loss_last": round(lossN, 4),
                          **results[B]}), flush=True)
        del state, batch

    best = max(results.values(), key=lambda r: r["samples_per_s"])
    print(json.dumps({"metric": "vipt_train_best",
                      "samples_per_s": best["samples_per_s"],
                      "ms_per_step": best["ms_per_step"],
                      "mfu_vs_bf16_peak": best["mfu_vs_bf16_peak"],
                      "dtype": "bf16 compute, f32 params/opt",
                      "note": ("fwd+bwd+adamw, prompt-only trainable mask "
                               "(0.84M trainable of 98M), deep_rgbd "
                               "128/256 crops, one v5e chip")}),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
