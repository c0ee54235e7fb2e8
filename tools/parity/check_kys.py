"""KYS ResponsePredictor torch->flax parity check.

Reference module: RGBD/models/keep_track_vot2021/ltr/models/motion/
resp_predictor.py:412-563 (the canonical ResponsePredictor used by
kysnet_res50) + conv_gru.py. Instantiates the reference's own torch module,
runs TWO chained steps — frame 2 (state from the init label through
init_hidden_state_predictor) and frame 3 (the returned GRU state) — and
compares against the flax module after converting the actual state_dict
with convert_kys_checkpoint (the cost volume layer has no parameters; its
math is pinned separately by tests/test_kys.py against a naive
correlation-sampler loop).

Run: python tools/parity/check_kys.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import reference_available, reference_path  # noqa: E402

TOL = 1e-5


def run(seed: int = 0) -> dict:
    import torch

    with reference_path("RGBD/models/keep_track_vot2021"):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp
        resp_pred = importlib.import_module("ltr.models.motion.resp_predictor")

        torch.manual_seed(seed)
        tmodel = resp_pred.ResponsePredictor(state_dim=8, conf_measure="max")
        tmodel.eval()

        rng = np.random.RandomState(seed)
        H = W = 9
        P = H * W
        cv1 = rng.randn(1, P, H, W).astype(np.float32) * 2
        cv2 = rng.randn(1, P, H, W).astype(np.float32) * 2
        score1 = rng.rand(1, 1, H, W).astype(np.float32)
        score2 = rng.rand(1, 1, H, W).astype(np.float32)
        label = rng.rand(1, 1, H, W).astype(np.float32)

        with torch.no_grad():
            fused1, st1, aux1 = tmodel(torch.from_numpy(cv1), None,
                                       torch.from_numpy(score1),
                                       init_label=torch.from_numpy(label))
            fused2, st2, aux2 = tmodel(torch.from_numpy(cv2), st1,
                                       torch.from_numpy(score2))
        sd = {"predictor.predictor." + k: v
              for k, v in tmodel.state_dict().items()}

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mmtrack_tpu.models.convert import convert_kys_checkpoint, load_into
    from mmtrack_tpu.models.kys import ResponsePredictor

    fpred = ResponsePredictor(state_dim=8, conf_measure="max")

    def init_fn(m):
        st = m.init_state(jnp.asarray(label[:, 0]))
        return m(jnp.asarray(cv1), st, jnp.asarray(score1[:, 0]))

    zeros = fpred.init(jax.random.PRNGKey(0), method=init_fn)
    converted = convert_kys_checkpoint(sd)["predictor"]
    params, missing, unexpected = load_into(zeros["params"], converted)
    assert not missing and not unexpected, (missing, unexpected)
    params = {"params": params}

    st0 = fpred.apply(params, jnp.asarray(label[:, 0]),
                      method=ResponsePredictor.init_state)
    f1, s1, a1 = fpred.apply(params, jnp.asarray(cv1), st0,
                             jnp.asarray(score1[:, 0]))
    f2, s2, a2 = fpred.apply(params, jnp.asarray(cv2), s1,
                             jnp.asarray(score2[:, 0]))

    def diff(a, t_nchw):
        return float(np.max(np.abs(np.asarray(a) - t_nchw)))

    # torch state is NCHW; flax NHWC
    results = {
        "fused_frame2": diff(f1, fused1[:, 0].numpy()),
        "state_frame2": diff(s1, st1.permute(0, 2, 3, 1).numpy()),
        "fused_frame3": diff(f2, fused2[:, 0].numpy()),
        "state_frame3": diff(s2, st2.permute(0, 2, 3, 1).numpy()),
        "propagation_conf": diff(a2["propagation_conf"],
                                 aux2["propagation_conf"][:, 0].numpy()),
        "is_target_new": diff(a2["is_target_new"],
                              aux2["is_target_new"][:, 0].numpy()),
    }
    ok = all(v <= TOL for v in results.values())
    return {"ok": ok, "tol": TOL, "max_abs_diff": results,
            "n_params": sum(int(np.prod(v.shape))
                            for v in sd.values())}


def main():
    if not reference_available():
        print(json.dumps({"ok": None, "skipped": "reference unavailable"}))
        return 0
    out = run()
    print(json.dumps(out, indent=2))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
