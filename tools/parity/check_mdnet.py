"""pyMDNet (RGBE dual-stream) torch->flax weight-conversion parity check.

Reference model: RGBE/models/pyMDNet/modules/model.py MDNet (VGG-M trunk,
fc4/fc5 per stream, fc6 on the vis+event concat). Compares fc6 logits and
the conv features on identical inputs after converting the actual torch
state_dict — the path a trained mdnet .pth takes.

Run: python tools/parity/check_mdnet.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.parity.refload import REFERENCE_ROOT, reference_available  # noqa: E402

TOL = 1e-4


def run(seed: int = 0) -> dict:
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "pymdnet_model",
        os.path.join(REFERENCE_ROOT, "RGBE", "models", "pyMDNet", "modules",
                     "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    net = mod.MDNet(K=1)
    net.eval()

    rng = np.random.RandomState(seed)
    vis = rng.uniform(-0.5, 0.5, (4, 3, 107, 107)).astype(np.float32)
    ev = rng.uniform(-0.5, 0.5, (4, 3, 107, 107)).astype(np.float32)
    with torch.no_grad():
        logits_t, _ = net(torch.from_numpy(vis), torch.from_numpy(ev), k=0)

    state_dict = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import convert_mdnet_checkpoint, load_into
    from mmtrack_tpu.models.mdnet import MDNet

    model = MDNet(mode="dual")
    patches = jnp.asarray(np.concatenate(
        [vis.transpose(0, 2, 3, 1), ev.transpose(0, 2, 3, 1)], axis=-1))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), patches)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_mdnet_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")

    logits_f = model.apply({"params": params}, patches, 0)

    diff = float(np.abs(np.asarray(logits_f) - logits_t.numpy()).max())
    return {
        "family": "pymdnet_dual",
        "torch_params": n_params,
        "max_abs_diff": {"fc6_logits": diff},
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
