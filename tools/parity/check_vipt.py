"""ViPT/OSTrack torch->flax weight-conversion parity check.

Instantiates the reference's own ViPTrack (torch, full published ViT-B
scale, lib/models/vipt/ostrack_prompt.py) on CPU, converts its actual
state_dict through mmtrack_tpu.models.convert, and asserts both frameworks
produce the same score/size/offset maps and predicted box on identical
inputs — the exact code path a trained ViPT_deep_rgbd.pth checkpoint would
take (lib/test/parameter/vipt.py:24-27), with every tensor exercised.

Run: python tools/parity/check_vipt.py [--variants deep_rgbd shaw_rgbd]
Prints one JSON line per variant and exits non-zero if any diff exceeds
tolerance.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.parity.refload import load_vipt_reference, reference_available  # noqa: E402

TOL = 2e-4  # fp32 fused-vs-unfused matmul reassociation across 12 ViT blocks


def _flax_outputs(variant: str, state_dict: dict, z_nhwc, x_nhwc):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.convert import convert_vipt_checkpoint, load_into
    from mmtrack_tpu.models.vipt import (build_viptrack, ce_keep_schedule,
                                         generate_ctr_mask)

    cfg = vipt_experiment_config(variant)
    model = build_viptrack(cfg)

    z = jnp.asarray(z_nhwc)
    x = jnp.asarray(x_nhwc)

    # parameter tree structure without running a real init forward
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z, x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)["params"]

    converted = convert_vipt_checkpoint(state_dict)
    params, missing, unexpected = load_into(zeros, converted)
    if missing:
        raise AssertionError(f"converter left flax params uninitialised: {missing[:8]}")

    lens_x = (cfg.DATA.SEARCH.SIZE // cfg.MODEL.BACKBONE.STRIDE) ** 2
    keep_lens = ce_keep_schedule(lens_x, cfg.MODEL.BACKBONE.CE_LOC,
                                 cfg.MODEL.BACKBONE.CE_KEEP_RATIO)
    mask = generate_ctr_mask(cfg.DATA.TEMPLATE.SIZE // cfg.MODEL.BACKBONE.STRIDE,
                             cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE)

    @functools.partial(jax.jit)
    def fwd(p, z, x, m):
        return model.apply({"params": p}, z, x, box_mask_z=m, ce_keep_lens=keep_lens)

    out = fwd(params, z, x, mask)
    return jax.tree.map(np.asarray, out), [".".join(k) for k in unexpected]


def run_variant(variant: str, seed: int = 0) -> dict:
    import torch

    model, _cfg, box_mask_z = load_vipt_reference(variant)

    rng = np.random.RandomState(seed)
    z = rng.uniform(-2.0, 2.0, size=(1, 6, 128, 128)).astype(np.float32)
    x = rng.uniform(-2.0, 2.0, size=(1, 6, 256, 256)).astype(np.float32)

    # populate non-trivial BatchNorm running stats in the box head so the
    # running_mean/var -> FrozenBatchNorm conversion is actually exercised
    model.train()
    with torch.no_grad():
        for i in range(2):
            rs = np.random.RandomState(100 + i)
            model(torch.from_numpy(rs.uniform(-2, 2, z.shape).astype(np.float32)),
                  torch.from_numpy(rs.uniform(-2, 2, x.shape).astype(np.float32)),
                  ce_template_mask=box_mask_z)
    model.eval()

    with torch.no_grad():
        out_t = model(torch.from_numpy(z), torch.from_numpy(x),
                      ce_template_mask=box_mask_z)

    state_dict = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    out_f, unexpected = _flax_outputs(
        variant, state_dict,
        z.transpose(0, 2, 3, 1), x.transpose(0, 2, 3, 1))

    diffs = {
        "score_map": float(np.abs(out_f["score_map"][:, None] -
                                  out_t["score_map"].numpy()).max()),
        "size_map": float(np.abs(
            out_f["size_map"].transpose(0, 3, 1, 2) -
            out_t["size_map"].numpy().reshape(1, 2, 16, 16)).max()),
        "offset_map": float(np.abs(
            out_f["offset_map"].transpose(0, 3, 1, 2) -
            out_t["offset_map"].numpy().reshape(1, 2, 16, 16)).max()),
        "pred_boxes": float(np.abs(out_f["pred_boxes"] -
                                   out_t["pred_boxes"].numpy()[:, 0]).max()),
    }
    return {
        "family": "vipt",
        "variant": variant,
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "unconverted_torch_keys": unexpected,
        "pass": all(v <= TOL for v in diffs.values()),
        "tol": TOL,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["deep_rgbd", "shaw_rgbd"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    ok = True
    for variant in args.variants:
        res = run_variant(variant, args.seed)
        print(json.dumps(res))
        ok &= res["pass"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
