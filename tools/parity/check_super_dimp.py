"""super_dimp_hinge (KeepTrack base network) torch->flax parity check.

Reference model: keep_track_vot2021/ltr/models/tracking/dimpnet.py:216-268
(dimpnet50_hinge — ResNet-50, residual_bottleneck clf features,
FilterInitializerLinear, GNSteepestDescent + LinearFilterHinge with
score_act='relu', AtomIoUNet) at the keep_track/release.py tracker
hyper-parameters (hinge_threshold 0.05). Compares every tracking-time
stage on identical inputs after converting the actual torch state_dict
through convert_super_dimp_checkpoint: backbone + classification
features, the initialized filter, the HINGE-residual GN-optimized filter
driven by tracker-style Gaussian labels and sample weights (the piece
that differs from check_dimp.py's DiMP optimizer), classification
scores, and IoUNet modulation/prediction.

Run: python tools/parity/check_super_dimp.py
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
       "filter_init": 1e-5, "filter_hinge": 1e-4, "scores": 1e-4,
       "mod3": 1e-4, "mod4": 1e-4, "iou": 1e-3}


def run(seed: int = 0) -> dict:
    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/keep_track_vot2021"):
        shim_pp = importlib.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        dimpnet = importlib.import_module("ltr.models.tracking.dimpnet")
        torch.manual_seed(seed)
        model = dimpnet.dimpnet50_hinge(
            filter_size=4, optim_iter=6, backbone_pretrained=False,
            out_feature_dim=512, hinge_threshold=0.05, score_act="relu")
        model.eval()

        rng = np.random.RandomState(seed)
        N = 3
        S, Sf, So = 480, 30, 31
        train = rng.uniform(-2, 2, (N, 3, S, S)).astype(np.float32)
        test = rng.uniform(-2, 2, (1, 3, S, S)).astype(np.float32)
        bb = rng.uniform(100, 300, (N, 4)).astype(np.float32)
        # tracker-style Gaussian labels on the 31x31 end-padded grid
        k = np.arange(So, dtype=np.float32) - (Sf - 1) / 2
        centers = rng.uniform(-5, 5, (N, 2)).astype(np.float32)
        sig = 2.0
        labels = np.exp(-0.5 * ((k[None, :, None] - centers[:, 0, None, None])
                                ** 2 + (k[None, None, :]
                                        - centers[:, 1, None, None]) ** 2)
                        / sig ** 2).astype(np.float32)
        sw = rng.uniform(0.1, 1.0, (N,)).astype(np.float32)
        sw /= sw.sum()
        props = rng.uniform(60, 400, (1, 8, 4)).astype(np.float32)

        # torch>=2 rejects list SUBCLASSES (pytracking's TensorList) in
        # autograd.grad's overrides dispatch; coerce to plain lists — a
        # version-compat shim, not a math change
        real_grad = torch.autograd.grad

        def compat_grad(outputs, inputs, grad_outputs=None, **kw):
            def fix(a):
                return list(a) if isinstance(a, list) else a
            return real_grad(fix(outputs), fix(inputs), fix(grad_outputs),
                             **kw)

        torch.autograd.grad = compat_grad

        with torch.no_grad():
            bf_tr = model.extract_backbone_features(torch.from_numpy(train))
            bf_te = model.extract_backbone_features(torch.from_numpy(test))
            cf_tr = model.extract_classification_feat(bf_tr)
            cf_te = model.extract_classification_feat(bf_te)
            w0 = model.classifier.filter_initializer(cf_tr,
                                                     torch.from_numpy(bb))
            w, _, _ = model.classifier.get_filter(
                cf_tr, torch.from_numpy(bb),
                train_label=torch.from_numpy(labels[:, None]),
                sample_weight=torch.from_numpy(sw.reshape(-1, 1, 1, 1)),
                num_iter=6)
            scores_t = model.classifier.classify(w, cf_te)
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

    from mmtrack_tpu.models.convert import (convert_super_dimp_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.dimp import DiMPNet, build_super_dimp50

    net = build_super_dimp50()
    assert net.optimizer_type == "hinge"
    tr = jnp.asarray(train.transpose(0, 2, 3, 1))
    te = jnp.asarray(test.transpose(0, 2, 3, 1))
    bbj = jnp.asarray(bb)
    propsj = jnp.asarray(props)

    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, te,
                            bbj, propsj)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                         shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_super_dimp_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    bf_tr_f = net.apply(P, tr, method=DiMPNet.extract_backbone)
    bf_te_f = net.apply(P, te, method=DiMPNet.extract_backbone)
    cf_tr_f = net.apply(P, bf_tr_f, method=DiMPNet.extract_classification_feat)
    cf_te_f = net.apply(P, bf_te_f, method=DiMPNet.extract_classification_feat)
    w0_f = net.apply(P, cf_tr_f, bbj, method=DiMPNet.get_filter)
    w_f = net.apply(P, w0_f, cf_tr_f, jnp.asarray(labels), jnp.asarray(sw),
                    6, method=DiMPNet.optimize_filter_hinge)
    scores_f = net.apply(P, w_f, cf_te_f, method=DiMPNet.classify)
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
        "filter_hinge": float(np.abs(
            np.asarray(w_f).transpose(2, 0, 1) - w.numpy()[0]).max()),
        "scores": float(np.abs(
            np.asarray(scores_f)
            - scores_t.numpy().reshape(np.asarray(scores_f).shape)).max()),
        "mod3": float(np.abs(np.asarray(mod_f[0])
                             - mod[0].numpy().reshape(1, -1)).max()),
        "mod4": float(np.abs(np.asarray(mod_f[1])
                             - mod[1].numpy().reshape(1, -1)).max()),
        "iou": float(np.abs(np.asarray(iou_f) - iou_t.numpy()).max()),
    }
    return {
        "family": "super_dimp_hinge",
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
