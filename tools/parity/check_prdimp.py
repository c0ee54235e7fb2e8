"""PrDiMP-50 torch->flax parity check.

Reference model: klcedimpnet50 (the AR fork ships both the builder —
keep_track_vot2021/SPT external AR ltr/models/tracking/dimpnet.py — and
the canonical train settings + tracker parameters:
SPT/external/AR/ltr/train_settings/dimp/prdimp50.py,
SPT/external/AR/pytracking/parameter/dimp/prdimp50.py). Compares every
tracking-time stage on identical inputs after converting the actual
torch state_dict through convert_prdimp_checkpoint: backbone +
classification features, the initialized filter, the KL-divergence
NEWTON-optimized filter with sample weights (the piece that differs from
check_dimp.py's DiMP optimizer), the softmax-preprocessed scores the
tracker localizes on, and IoUNet modulation/prediction.

Run: python tools/parity/check_prdimp.py
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (  # noqa: E402
    patch_cuda_to_cpu,
    reference_available,
    reference_path,
)

TOL = {"layer2": 5e-4, "layer3": 5e-4, "clf_feat": 1e-5,
       "filter_init": 1e-5, "filter_newton": 1e-4, "scores": 1e-4,
       "scores_softmax": 1e-6, "mod3": 1e-4, "mod4": 1e-4, "iou": 1e-3}

S_IM = 22 * 16  # image_sample_size (prdimp50.py:12)


def run(seed: int = 0) -> dict:
    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/SPT/external/AR"):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        dimpnet = importlib.import_module("ltr.models.tracking.dimpnet")
        torch.manual_seed(seed)
        # prdimp50 train settings: gauss_sigma = (1/4)/5 * 18 = 0.9
        model = dimpnet.klcedimpnet50(
            filter_size=4, optim_iter=5, backbone_pretrained=False,
            clf_feat_norm=True, clf_feat_blocks=0, final_conv=True,
            out_feature_dim=512, optim_init_step=1.0, optim_init_reg=0.05,
            optim_min_reg=0.05, gauss_sigma=0.9, alpha_eps=0.05,
            normalize_label=True, init_initializer="zero")
        model.eval()

        rng = np.random.RandomState(seed)
        N = 3
        train = rng.uniform(-2, 2, (N, 3, S_IM, S_IM)).astype(np.float32)
        test = rng.uniform(-2, 2, (1, 3, S_IM, S_IM)).astype(np.float32)
        bb = rng.uniform(80, 240, (N, 4)).astype(np.float32)
        sw = rng.uniform(0.1, 1.0, (N,)).astype(np.float32)
        sw /= sw.sum()
        props = rng.uniform(60, 300, (1, 8, 4)).astype(np.float32)

        with torch.no_grad():
            bf_tr = model.extract_backbone_features(torch.from_numpy(train))
            bf_te = model.extract_backbone_features(torch.from_numpy(test))
            cf_tr = model.extract_classification_feat(bf_tr)
            cf_te = model.extract_classification_feat(bf_te)
            w0 = model.classifier.filter_initializer(cf_tr,
                                                     torch.from_numpy(bb))
            w, _, _ = model.classifier.get_filter(
                cf_tr, torch.from_numpy(bb),
                sample_weight=torch.from_numpy(sw), num_iter=5)
            scores_t = model.classifier.classify(w, cf_te)
            sm_t = torch.softmax(scores_t.reshape(-1), dim=0).reshape(
                scores_t.shape)
            mod = model.bb_regressor.get_modulation(
                [bf_tr["layer2"][:1], bf_tr["layer3"][:1]],
                torch.from_numpy(bb[:1]))
            iou_feat = model.bb_regressor.get_iou_feat(
                [bf_te["layer2"], bf_te["layer3"]])
            iou_t = model.bb_regressor.predict_iou(mod, iou_feat,
                                                   torch.from_numpy(props))

        state_dict = {kk: v.detach().cpu().numpy()
                      for kk, v in model.state_dict().items()}
        n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import (convert_prdimp_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.dimp import DiMPNet, build_prdimp50

    net = build_prdimp50()
    tr = jnp.asarray(train.transpose(0, 2, 3, 1))
    te = jnp.asarray(test.transpose(0, 2, 3, 1))
    bbj = jnp.asarray(bb)
    propsj = jnp.asarray(props)

    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, te,
                            bbj, propsj)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_prdimp_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    bf_tr_f = net.apply(P, tr, method=DiMPNet.extract_backbone)
    bf_te_f = net.apply(P, te, method=DiMPNet.extract_backbone)
    cf_tr_f = net.apply(P, bf_tr_f, method=DiMPNet.extract_classification_feat)
    cf_te_f = net.apply(P, bf_te_f, method=DiMPNet.extract_classification_feat)
    w0_f = net.apply(P, cf_tr_f, bbj, method=DiMPNet.get_filter)
    w_f = net.apply(P, w0_f, cf_tr_f, bbj, jnp.asarray(sw), 5,
                    method=DiMPNet.optimize_filter)
    scores_f = net.apply(P, w_f, cf_te_f, method=DiMPNet.classify)
    sm_f = jax.nn.softmax(jnp.asarray(scores_f).reshape(-1)).reshape(
        np.asarray(scores_f).shape)
    mod_f = net.apply(P, [bf_tr_f["layer2"][:1], bf_tr_f["layer3"][:1]],
                      bbj[:1],
                      method=lambda m, f, b: m.bb_regressor.get_modulation(f, b))
    iou_feat_f = net.apply(P, [bf_te_f["layer2"], bf_te_f["layer3"]],
                           method=lambda m, f: m.bb_regressor.get_iou_feat(f))
    iou_f = net.apply(P, mod_f, iou_feat_f, propsj,
                      method=lambda m, a, b, c: m.bb_regressor.predict_iou(a, b, c))

    def nchw(a):
        return np.asarray(a).transpose(0, 3, 1, 2)

    diffs = {
        "layer2": float(np.abs(nchw(bf_tr_f["layer2"])
                               - bf_tr["layer2"].numpy()).max()),
        "layer3": float(np.abs(nchw(bf_tr_f["layer3"])
                               - bf_tr["layer3"].numpy()).max()),
        "clf_feat": float(np.abs(nchw(cf_tr_f) - cf_tr.numpy()).max()),
        "filter_init": float(np.abs(
            np.asarray(w0_f).transpose(2, 0, 1) - w0.numpy()[0]).max()),
        "filter_newton": float(np.abs(
            np.asarray(w_f).transpose(2, 0, 1) - w.numpy()[0]).max()),
        "scores": float(np.abs(
            np.asarray(scores_f)
            - scores_t.numpy().reshape(np.asarray(scores_f).shape)).max()),
        "scores_softmax": float(np.abs(
            np.asarray(sm_f)
            - sm_t.numpy().reshape(np.asarray(sm_f).shape)).max()),
        "mod3": float(np.abs(np.asarray(mod_f[0])
                             - mod[0].numpy().reshape(1, -1)).max()),
        "mod4": float(np.abs(np.asarray(mod_f[1])
                             - mod[1].numpy().reshape(1, -1)).max()),
        "iou": float(np.abs(np.asarray(iou_f) - iou_t.numpy()).max()),
    }
    return {
        "family": "prdimp50",
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "unexpected_torch_keys": [".".join(kk) for kk in unexpected],
        "pass": all(v <= TOL[kk] for kk, v in diffs.items()),
        "tol": TOL,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0
    res = run(args.seed)
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
