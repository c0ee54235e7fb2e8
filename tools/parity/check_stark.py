"""SPT (STARK-S dual-modal) torch->flax weight-conversion parity check.

Reference model: RGBD/models/SPT/lib/models/stark/stark_s.py at
experiments/stark_s/baseline.yaml — dual ResNet-50 (layer3) backbones,
per-modality 6-layer encoders, Conv1d neck + 2 fusion layers, 1-query
decoder, corner head. Compares pred_boxes on identical color+depth inputs
after converting the actual torch state_dict.

Run: python tools/parity/check_stark.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.parity.refload import load_spt_reference, reference_available  # noqa: E402

TOL = 5e-4  # sine-pos normalization differs by the reference's 1e-6 eps


def run(seed: int = 0) -> dict:
    import torch

    model, cfg, misc, merge = load_spt_reference()

    rng = np.random.RandomState(seed)
    zc = rng.uniform(-2, 2, (1, 3, 128, 128)).astype(np.float32)
    zd = rng.uniform(-2, 2, (1, 3, 128, 128)).astype(np.float32)
    xc = rng.uniform(-2, 2, (1, 3, 320, 320)).astype(np.float32)
    xd = rng.uniform(-2, 2, (1, 3, 320, 320)).astype(np.float32)

    NT = misc.NestedTensor

    def nt(a):
        t = torch.from_numpy(a)
        return NT(t, torch.zeros((1, a.shape[2], a.shape[3]), dtype=torch.bool))

    with torch.no_grad():
        fz_c = model.forward_backbone_color(nt(zc))
        fx_c = model.forward_backbone_color(nt(xc))
        fz_d = model.forward_backbone_depth(nt(zd))
        fx_d = model.forward_backbone_depth(nt(xd))
        seq_c = merge.merge_template_search([fz_c, fx_c])
        seq_d = merge.merge_template_search([fz_d, fx_d])
        out_t, coord_t, dec_t = model.forward_transformer(seq_c, seq_d)

    state_dict = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import convert_stark_checkpoint, load_into
    from mmtrack_tpu.models.stark import STARK

    fmodel = STARK(six_channel=True)
    tz = jnp.asarray(np.concatenate([zc, zd], axis=1).transpose(0, 2, 3, 1))
    tx = jnp.asarray(np.concatenate([xc, xd], axis=1).transpose(0, 2, 3, 1))

    shapes = jax.eval_shape(fmodel.init, jax.random.PRNGKey(0), tz, tx)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_stark_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")

    out_f = fmodel.apply({"params": params}, tz, tx)
    diff = float(np.abs(np.asarray(out_f["pred_boxes"]) -
                        coord_t.numpy().reshape(1, 4)).max())
    return {
        "family": "spt_stark_s",
        "torch_params": n_params,
        "max_abs_diff": {"pred_boxes": diff},
        "unexpected_torch_keys": [".".join(k) for k in unexpected],
        "pass": diff <= TOL,
        "tol": TOL,
    }


def main():
    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0
    res = run()
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
