"""MANet (RGB-E adapter topology) torch->flax weight-conversion parity check.

Reference model: RGBE/models/MANet/modules/MANet3x1x1_IC.py MDNet — shared
VGG-M "generality" trunk (custom centered LRN) applied to both modalities
plus per-modality adapter branches (3x3/2+BN+pool5, 1x1/2+BN+pool5, 1x1/2
+BN) summed into each stage, conv3 streams channel-concatenated before
fc4/fc5/fc6. Compares fc6 logits and flattened conv features on identical
inputs after converting the actual torch state_dict (eval mode: BN rides
running stats == our FrozenBatchNorm leaves).

Run: python tools/parity/check_manet.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import REFERENCE_ROOT, reference_available  # noqa: E402

TOL = 1e-4


def run(seed: int = 0) -> dict:
    import torch

    spec = importlib.util.spec_from_file_location(
        "manet_model",
        os.path.join(REFERENCE_ROOT, "RGBE", "models", "MANet", "modules",
                     "MANet3x1x1_IC.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(seed)
    net = mod.MDNet(K=1)
    # non-trivial BN running stats, as a trained checkpoint would carry
    net.train()
    with torch.no_grad():
        rs = np.random.RandomState(100)
        for _ in range(2):
            net(torch.from_numpy(rs.uniform(
                    0, 255, (4, 3, 107, 107)).astype(np.float32)),
                torch.from_numpy(rs.uniform(
                    0, 255, (4, 3, 107, 107)).astype(np.float32)))
    net.eval()

    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 255, (3, 107, 107, 6)).astype(np.float32)
    xr = torch.from_numpy(x[..., :3].transpose(0, 3, 1, 2)).contiguous()
    xt = torch.from_numpy(x[..., 3:].transpose(0, 3, 1, 2)).contiguous()

    with torch.no_grad():
        logits_t = net(xr, xt, k=0, out_layer="fc6").numpy()
        feats_t = net(xr, xt, k=0, out_layer="conv3").numpy()

    state_dict = {k: v.detach().cpu().numpy()
                  for k, v in net.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for k, v in state_dict.items()
                   if "num_batches" not in k)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import (convert_manet_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.mdnet import MDNet

    fmodel = MDNet(mode="adapter", num_branches=1)
    xz = jnp.asarray(x)
    shapes = jax.eval_shape(fmodel.init, jax.random.PRNGKey(0), xz)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_manet_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    logits_f = np.asarray(jax.jit(lambda p, v: fmodel.apply(p, v))(P, xz))
    feats_f = np.asarray(fmodel.apply(P, xz,
                                      method=MDNet.extract_features))

    ft = feats_t.reshape(feats_t.shape[0], 1024, 3, 3).transpose(0, 2, 3, 1)
    ft = ft.reshape(ft.shape[0], 1, -1)

    diffs = {
        "fc6_logits": float(np.abs(logits_f - logits_t).max()),
        "conv3_features_rel": float(np.abs(feats_f - ft).max()
                                    / np.abs(ft).max()),
    }
    return {
        "family": "manet_rgbe",
        "variant": "MANet3x1x1_IC",
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "unexpected_torch_keys": [".".join(k) for k in unexpected],
        "pass": all(v <= TOL for v in diffs.values()),
        "tol": TOL,
    }


def main(argv=None):
    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0
    res = run()
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
