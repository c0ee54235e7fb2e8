"""RGBD OSTrack torch->flax weight-conversion parity check (full model).

Instantiates the reference's own RGBD OSTrack (torch, CPU, full published
ViT-B scale — RGBD/models/OSTrack/lib/models/ostrack/ostrack.py at the
ostrack320_elimination_cls_t2m12_ep50 online-entry configuration),
converts its actual state_dict through mmtrack_tpu.models.convert, and
asserts both frameworks produce the same outputs on identical inputs,
covering every piece the ONLINE tracker consumes (ostrack_online.py):

  - the dual-template forward: init + online template as a template batch
    of 2 with the search tiled (ostrack_online.py:116-124), DropBlock
    token elimination at layers (3,6,9) keep 0.7 guided by the CTR_POINT
    box_mask_z, per-batch CENTER-head maps (out_dict_f1);
  - the merged head: token stream averaged over the template batch then
    decoded (ostrack_online.py:136-138);
  - the ScoreTransformer cls head on the init template's full z+x token
    sequence at the PUBLISHED t2m12 depth — 2 class-attn layers and a
    TWELVE-layer MLP (cfg.MODEL.HEAD.NUM_CLS_MLP_LAYERS default;
    check_score_head.py's standalone run used depth 3).

Run: python tools/parity/check_ostrack.py
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (  # noqa: E402
    load_ostrack_reference,
    reference_available,
)

TOL = 5e-4   # f32 reassociation across 12 ViT-B blocks at 464-token length
TOL_CLS = 1e-5


def _flax_outputs(state_dict, z2_nhwc, x2_nhwc, pred_box):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import (convert_score_head_checkpoint,
                                            convert_vipt_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.heads import CenterPredictor
    from mmtrack_tpu.models.vipt import (ScoreTransformer, ViPTrack,
                                         ce_keep_schedule, generate_ctr_mask)

    model = ViPTrack(search_size=320, template_size=128, head_channel=256,
                     head_type="CENTER", ce_loc=(3, 6, 9),
                     prompt_type="none")

    z = jnp.asarray(z2_nhwc)
    x = jnp.asarray(x2_nhwc)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), z, x)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_vipt_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")

    lens_x = (320 // 16) ** 2
    keep_lens = ce_keep_schedule(lens_x, (3, 6, 9), (0.7, 0.7, 0.7))
    assert keep_lens == (280, 196, 138), keep_lens
    mask = generate_ctr_mask(128 // 16, "CTR_POINT")

    @jax.jit
    def fwd(p, z, x):
        return model.apply({"params": p}, z, x, box_mask_z=mask,
                           ce_keep_lens=keep_lens)

    out = fwd(params, z, x)

    # merged head (ostrack_online.py:136-138): mean tokens over the
    # template batch -> CENTER head on the search slice
    S = 20
    head = CenterPredictor(channel=256, feat_sz=S)

    @jax.jit
    def merged_head(p, tokens):
        merged = tokens.mean(axis=0, keepdims=True)
        feat = merged[:, -S * S:].reshape(1, S, S, -1)
        return head.apply({"params": p["box_head"]}, feat)

    sm_m, sz_m, of_m = merged_head(params, out["backbone_tokens"])

    # cls head at the PUBLISHED t2m12 depth (12 MLP layers)
    cls_model = ScoreTransformer(d_model=768, n_layers=2, n_mlp_layers=12)
    cls_shapes = jax.eval_shape(cls_model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 464, 768)), jnp.zeros((1, 4)))
    cls_zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                             cls_shapes)["params"]
    cls_params, cls_missing, _ = load_into(
        cls_zeros, convert_score_head_checkpoint(state_dict,
                                                 prefix="cls_head."))
    if cls_missing:
        raise AssertionError(f"unconverted cls leaves: {cls_missing[:8]}")
    conf = cls_model.apply({"params": cls_params},
                           out["backbone_tokens"][0:1],
                           jnp.asarray(pred_box))

    res = {k: np.asarray(v) for k, v in out.items()}
    res["merged_score"] = np.asarray(sm_m)
    res["merged_size"] = np.asarray(sz_m)
    res["merged_offset"] = np.asarray(of_m)
    res["conf"] = float(np.asarray(conf)[0])
    return res, [".".join(k) for k in unexpected]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    import torch

    model, cfg, mask = load_ostrack_reference()
    assert cfg.MODEL.HEAD.NUM_CLS_MLP_LAYERS == 12

    rng = np.random.RandomState(args.seed)
    z2 = rng.uniform(-2.0, 2.0, size=(2, 3, 128, 128)).astype(np.float32)
    x1 = rng.uniform(-2.0, 2.0, size=(1, 3, 320, 320)).astype(np.float32)

    # populate non-trivial BN running stats in the box head
    model.train()
    with torch.no_grad():
        for i in range(2):
            rs = np.random.RandomState(100 + i)
            model(template=torch.from_numpy(
                      rs.uniform(-2, 2, z2.shape).astype(np.float32)),
                  search=torch.from_numpy(
                      rs.uniform(-2, 2, (2, 3, 320, 320)).astype(np.float32)),
                  box_mask_z=mask.expand(2, -1))
    model.eval()

    x2 = torch.from_numpy(x1).expand(2, -1, -1, -1)
    with torch.no_grad():
        out_f1, _coord, cat_tokens, score_f1, _, _ = model(
            template=torch.from_numpy(z2), search=x2,
            box_mask_z=mask.expand(2, -1))
        merged = cat_tokens.mean(dim=0, keepdim=True)
        out_m, _, score_m = model.forward_head(None, merged)
        pred_box = out_f1["pred_boxes"][0:1].squeeze(1)
        cls_out = model.forward_cls_head(cat_tokens[0:1], pred_box)
        conf_t = float(torch.sigmoid(cls_out["pred_logits"]).item())

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())

    ours, unexpected = _flax_outputs(
        sd, z2.transpose(0, 2, 3, 1),
        np.repeat(x1.transpose(0, 2, 3, 1), 2, axis=0),
        np.asarray(pred_box.numpy()))

    S = 20
    diffs = {
        "score_map_f1": float(np.abs(
            ours["score_map"][:, None] - score_f1.numpy()).max()),
        "size_map_f1": float(np.abs(
            ours["size_map"].transpose(0, 3, 1, 2)
            - out_f1["size_map"].numpy()).max()),
        "offset_map_f1": float(np.abs(
            ours["offset_map"].transpose(0, 3, 1, 2)
            - out_f1["offset_map"].numpy()).max()),
        "pred_boxes_f1": float(np.abs(
            ours["pred_boxes"] - out_f1["pred_boxes"].numpy()[:, 0]).max()),
        "backbone_tokens": float(np.abs(
            ours["backbone_tokens"] - cat_tokens.numpy()).max()),
        "merged_score": float(np.abs(
            ours["merged_score"][:, None] - score_m.numpy()).max()),
        "merged_size": float(np.abs(
            ours["merged_size"].transpose(0, 3, 1, 2)
            - out_m["size_map"].numpy()).max()),
        "merged_offset": float(np.abs(
            ours["merged_offset"].transpose(0, 3, 1, 2)
            - out_m["offset_map"].numpy()).max()),
    }
    cls_diff = abs(ours["conf"] - conf_t)
    res = {
        "family": "ostrack_rgbd_full",
        "variant": "ostrack320_elimination_cls_t2m12_ep50",
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "cls_score_diff": cls_diff,
        "unconverted_torch_keys": unexpected,
        "pass": bool(all(v <= TOL for v in diffs.values())
                     and cls_diff <= TOL_CLS),
        "tol": TOL,
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
