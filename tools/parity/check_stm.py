"""STM torch->flax parity check.

Reference: RGBD/models/keep_track_vot2021/pytracking/tracker/stm/model.py
(the fork's vendored Oh et al. STM). Instantiates the reference's own
torch module (torchvision resnet50 patched to skip the pretrained-weight
download — no egress here; random init is what we compare), converts the
actual state_dict with convert_stm_checkpoint, and compares:

  - memorize: the memory key/value maps for a frame + mask,
  - segment: the single-object probability map read against a 2-frame
    memory (the full attention read + decoder; for K=2 the reference's
    soft-aggregation round-trip is the identity on the object
    probability, modulo its 1e-7 clamp).

Run: python tools/parity/check_stm.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (patch_cuda_to_cpu, reference_available,  # noqa: E402
                                  reference_path)

TOL = {"key": 1e-4, "value": 1e-4, "prob": 1e-4}
S = 192  # divisible by 16 -> pad_divide_by is a no-op


def run(seed: int = 0) -> dict:
    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six
    # torchvision is the parity SHIM (tools/parity/shim/torchvision): its
    # resnet50 implements the public torchvision trunk and ignores the
    # reference's hardcoded pretrained=True (no egress here; random init
    # is what the parity compares)
    if True:
        with reference_path("RGBD/models/keep_track_vot2021"):
            stm_model = importlib.import_module("pytracking.tracker.stm.model")
            torch.manual_seed(seed)
            tmodel = stm_model.STM()
            tmodel.eval()

            rng = np.random.RandomState(seed)
            f1 = rng.rand(1, 3, S, S).astype(np.float32)
            f2 = rng.rand(1, 3, S, S).astype(np.float32)
            yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
            m = (np.exp(-0.5 * (((yy - 90) / 30) ** 2
                                + ((xx - 80) / 25) ** 2)) > 0.5)
            masks = np.zeros((1, 2, S, S), np.float32)
            masks[0, 1] = m
            masks[0, 0] = 1.0 - m

            with torch.no_grad():
                k1, v1 = tmodel.memorize(torch.from_numpy(f1),
                                         torch.from_numpy(masks),
                                         torch.tensor([1]))
                # (1, K, C, 1, h, w); object slot 1
                k2, v2 = tmodel.memorize(torch.from_numpy(f2),
                                         torch.from_numpy(masks),
                                         torch.tensor([1]))
                keys = torch.cat([k1, k2], dim=3)
                values = torch.cat([v1, v2], dim=3)
                logit = tmodel.segment(torch.from_numpy(f2), keys, values,
                                       torch.tensor([1]))
                prob_t = torch.softmax(logit, dim=1)[0, 1].numpy()

            sd = {k: v for k, v in tmodel.state_dict().items()}
            k1_t = k1[0, 1, :, 0].numpy()   # (kd, h, w)
            v1_t = v1[0, 1, :, 0].numpy()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mmtrack_tpu.models.convert import convert_stm_checkpoint, load_into
    from mmtrack_tpu.models.stm import build_stm

    fmodel = build_stm()
    zeros = jax.jit(lambda k: fmodel.init(
        k, jnp.zeros((1, S, S, 3)), jnp.zeros((1, S, S))))(
        jax.random.PRNGKey(0))
    converted = convert_stm_checkpoint(sd)
    params, missing, unexpected = load_into(zeros["params"], converted)
    # layer4 of both trunks is unused by STM (model.py taps end at res4)
    bad_missing = [k for k in missing if "layer4" not in ".".join(k)]
    diag = {"missing_non_layer4": [".".join(k) for k in bad_missing],
            "unexpected": [".".join(k) for k in unexpected]}
    params = {"params": params}

    f1j = jnp.asarray(f1.transpose(0, 2, 3, 1))
    f2j = jnp.asarray(f2.transpose(0, 2, 3, 1))
    mj = jnp.asarray(masks[0, 1])[None]
    kf1, vf1 = fmodel.apply(params, f1j, mj, method="memorize")
    kf2, vf2 = fmodel.apply(params, f2j, mj, method="memorize")
    keys_f = jnp.concatenate([kf1, kf2], axis=0)
    vals_f = jnp.concatenate([vf1, vf2], axis=0)
    prob_f = fmodel.apply(params, f2j, keys_f, vals_f,
                          jnp.ones((2,)), method="segment")

    results = {
        "key": float(np.abs(np.asarray(kf1[0])
                            - k1_t.transpose(1, 2, 0)).max()),
        "value": float(np.abs(np.asarray(vf1[0])
                              - v1_t.transpose(1, 2, 0)).max()),
        "prob": float(np.abs(np.asarray(prob_f) - prob_t).max()),
    }
    ok = (not bad_missing and not unexpected
          and all(v <= TOL[k] for k, v in results.items()))
    return {"ok": ok, "tol": TOL, "max_abs_diff": results, **diag,
            "n_params": sum(int(np.prod(v.shape)) for v in sd.values())}


def main():
    if not reference_available():
        print(json.dumps({"ok": None, "skipped": "reference unavailable"}))
        return 0
    out = run()
    print(json.dumps(out, indent=2))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
