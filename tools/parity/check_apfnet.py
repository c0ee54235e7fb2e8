"""APFNet (RGB-T) torch->flax weight-conversion parity check.

Reference model: RGBT/models/APFNet/modules/model_tracking.py MDNet — the
network tracking/Run.py actually deploys: dual VGG-M streams, five
challenge-attribute SK-fusion branches per conv stage, 5-way SK ensemble,
channel-attention transformers (self per stream/aggregate + cross from the
aggregate into each stream), MDNet fc scoring. Compares fc6 logits and the
flattened conv features on identical 6-channel inputs after converting the
actual torch state_dict — the path a trained APFNet .pth takes.

Also checks the stage-1 topology (model_stage1.py:198-262: one attribute
branch, additive conv(x)+V fusion, no transformers) by replaying the
reference stage-1 arithmetic with the SAME tracking-model weights against
our `active_attribute` path.

Run: python tools/parity/check_apfnet.py
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
TOL_FEAT = 1e-4


def run(seed: int = 0) -> dict:
    import torch
    import torch.nn.functional as F

    spec = importlib.util.spec_from_file_location(
        "apfnet_model_tracking",
        os.path.join(REFERENCE_ROOT, "RGBT", "models", "APFNet", "modules",
                     "model_tracking.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(seed)
    net = mod.MDNet(K=1)
    net.eval()

    rng = np.random.RandomState(seed)
    x = rng.uniform(-120, 140, (3, 107, 107, 6)).astype(np.float32)
    x1 = torch.from_numpy(x[..., :3].transpose(0, 3, 1, 2)).contiguous()
    x2 = torch.from_numpy(x[..., 3:].transpose(0, 3, 1, 2)).contiguous()

    with torch.no_grad():
        logits_t = net(x1, x2, k=0, out_layer="fc6").numpy()
        feats_t = net(x1, x2, k=0, out_layer="conv3").numpy()

        # stage-1 topology replay with the tracking model's own weights:
        # one attribute branch (index a), V = 2-way SK fusion,
        # x = conv(x) + V, no transformers (model_stage1.py:198-262)
        a = 1  # OCC
        y1, y2 = x1, x2
        for s in (1, 2, 3):
            out = [getattr(net, f"parallel{s}")[a](y1),
                   getattr(net, f"parallel{s}")[a](y2)]
            U = out[0] + out[1]
            C = U.shape[1]
            g = getattr(net, f"parallel{s}_skconv")[a](U)
            g = torch.softmax(g.reshape(g.shape[0], 2, C, -1), dim=1)
            V = (out[0] * g[:, 0].reshape(-1, C, 1, 1)
                 + out[1] * g[:, 1].reshape(-1, C, 1, 1))
            y1 = net.layers_v[s - 1](y1) + V
            y2 = net.layers_i[s - 1](y2) + V
        feats_s1_t = torch.cat((y1, y2), 1).reshape(y1.shape[0], -1).numpy()

    state_dict = {k: v.detach().cpu().numpy()
                  for k, v in net.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.apfnet import APFNet
    from mmtrack_tpu.models.convert import (convert_apfnet_checkpoint,
                                            load_into)

    fmodel = APFNet(num_branches=1)
    xz = jnp.asarray(x)
    shapes = jax.eval_shape(fmodel.init, jax.random.PRNGKey(0), xz)
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_apfnet_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    logits_f = np.asarray(jax.jit(lambda p, v: fmodel.apply(p, v))(P, xz))
    feats_f = np.asarray(fmodel.apply(P, xz,
                                      method=APFNet.extract_features))
    feats_s1_f = np.asarray(fmodel.apply(
        P, xz, method=APFNet.extract_features, active_attribute=1))

    # feature comparison needs the same flatten order: torch is CHW-major
    ft = feats_t.reshape(feats_t.shape[0], 1024, 3, 3).transpose(0, 2, 3, 1)
    ft = ft.reshape(ft.shape[0], 1, -1)
    fs1 = feats_s1_t.reshape(feats_s1_t.shape[0], 1024, 3, 3)
    fs1 = fs1.transpose(0, 2, 3, 1).reshape(fs1.shape[0], -1)

    # feature tensors ride raw-pixel-scale activations (O(1e3) values, the
    # MDNet input convention feeds un-normalized crops), so compare
    # relative to the reference's max magnitude
    diffs = {
        "fc6_logits": float(np.abs(logits_f - logits_t).max()),
        "conv3_features_rel": float(np.abs(feats_f - ft).max()
                                    / np.abs(ft).max()),
        "stage1_features_rel": float(
            np.abs(feats_s1_f.reshape(fs1.shape) - fs1).max()
            / np.abs(fs1).max()),
    }
    return {
        "family": "apfnet_rgbt",
        "variant": "model_tracking (deployed) + stage-1 topology",
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "unexpected_torch_keys": [".".join(k) for k in unexpected],
        "pass": (diffs["fc6_logits"] <= TOL
                 and diffs["conv3_features_rel"] <= TOL_FEAT
                 and diffs["stage1_features_rel"] <= TOL_FEAT),
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
