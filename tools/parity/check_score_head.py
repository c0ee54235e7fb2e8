"""OSTrack-online ScoreTransformer torch->flax parity check.

Reference module: RGBD/models/OSTrack/lib/models/ostrack/score_head.py
(class-attention confidence head, NUM_CLS_ATTN_LAYERS=2,
NUM_CLS_MLP_LAYERS=3). Compares the update score on identical token/box
inputs after converting the actual torch state_dict.

Run: python tools/parity/check_score_head.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.parity.refload import reference_available, reference_path  # noqa: E402

TOL = 1e-5


def run(seed: int = 0) -> dict:
    import torch

    with reference_path("RGBD/models/OSTrack"):
        sh = importlib.import_module("lib.models.ostrack.score_head")
        torch.manual_seed(0)
        net = sh.ScoreTransformer(n_cls=1, n_layers=2, d_model=768,
                                  d_encoder=768, n_heads=12, n_mlp_layers=3)
        net.eval()

    rng = np.random.RandomState(seed)
    tokens = rng.randn(2, 256, 768).astype(np.float32)
    box = rng.uniform(0.2, 0.8, (2, 4)).astype(np.float32)
    with torch.no_grad():
        logits_t = net(torch.from_numpy(tokens), torch.from_numpy(box))

    state_dict = {"cls_head." + k: v.detach().numpy()
                  for k, v in net.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import (convert_score_head_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.vipt import ScoreTransformer

    model = ScoreTransformer()
    tk = jnp.asarray(tokens)
    bx = jnp.asarray(box)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), tk, bx)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_score_head_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")

    score_f = model.apply({"params": params}, tk, bx)
    want = 1.0 / (1.0 + np.exp(-logits_t.numpy().reshape(-1)))
    diff = float(np.abs(np.asarray(score_f) - want).max())
    return {
        "family": "ostrack_online_score_head",
        "torch_params": n_params,
        "max_abs_diff": {"update_score": diff},
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
