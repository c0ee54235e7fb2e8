"""DiMP-50 / DeT torch->flax weight-conversion parity check.

Reference model: RGBD/models/DeT/ltr/models/tracking/dimpnet.py
(dimpnet50 / dimp50_DeT at the published dimp50 hyper-parameters: ResNet-50
backbones, 512-d classification features, filter size 4, 100 distance bins,
steepest-descent GN optimizer, AtomIoUNet). Compares every tracking-time
stage on identical inputs after converting the actual torch state_dict:
backbone features (incl. the DeT merge), classification features, the
initialized filter, the GN-optimized filter, classification scores, and
IoUNet modulation/prediction.

Run: python tools/parity/check_dimp.py [--merge max|none]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.parity.refload import load_dimp_reference, reference_available  # noqa: E402

# Raw backbone activations are O(10-100) after 50 conv layers, so their
# absolute fp32 noise is larger (relative ~1e-6); everything the tracker
# consumes (normalized clf features, scores, IoU) stays tight.
TOL = {"layer2": 5e-4, "layer3": 5e-4, "clf_feat": 1e-5, "filter_init": 1e-5,
       "filter_opt": 1e-4, "scores": 1e-4, "mod3": 1e-4, "mod4": 1e-4,
       "iou": 1e-3}


def run(merge: str | None = "max", seed: int = 0) -> dict:
    import torch

    model = load_dimp_reference(merge)
    rng = np.random.RandomState(seed)
    C_in = 6 if merge else 3
    train = rng.uniform(-2, 2, (2, C_in, 288, 288)).astype(np.float32)
    test = rng.uniform(-2, 2, (1, C_in, 288, 288)).astype(np.float32)
    bb = np.asarray([[96.0, 96.0, 96.0, 96.0],
                     [84.0, 100.0, 110.0, 80.0]], np.float32)
    props = rng.uniform(60, 180, (1, 8, 4)).astype(np.float32)

    with torch.no_grad():
        bf_tr = model.extract_backbone_features(torch.from_numpy(train))
        bf_te = model.extract_backbone_features(torch.from_numpy(test))
        cf_tr = model.extract_classification_feat(bf_tr)
        cf_te = model.extract_classification_feat(bf_te)
        w0 = model.classifier.filter_initializer(cf_tr, torch.from_numpy(bb))
        w, _, _ = model.classifier.get_filter(cf_tr, torch.from_numpy(bb),
                                              num_iter=5)
        scores_t = model.classifier.classify(w, cf_te)
        iou_bf = [bf_te["layer2"], bf_te["layer3"]]
        mod = model.bb_regressor.get_modulation(
            [bf_tr["layer2"][:1], bf_tr["layer3"][:1]],
            torch.from_numpy(bb[:1]))
        iou_feat = model.bb_regressor.get_iou_feat(iou_bf)
        iou_t = model.bb_regressor.predict_iou(mod, iou_feat,
                                               torch.from_numpy(props))

    state_dict = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in state_dict.values())

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.models.convert import convert_dimp_checkpoint, load_into
    from mmtrack_tpu.models.dimp import DiMPNet

    net = DiMPNet(merge_type=merge)
    tr = jnp.asarray(train.transpose(0, 2, 3, 1))
    te = jnp.asarray(test.transpose(0, 2, 3, 1))
    bbj = jnp.asarray(bb)
    propsj = jnp.asarray(props)

    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), tr, te,
                            bbj, propsj)
    zeros = jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), shapes)["params"]
    params, missing, unexpected = load_into(
        zeros, convert_dimp_checkpoint(state_dict))
    if missing:
        raise AssertionError(f"unconverted flax leaves: {missing[:8]}")
    P = {"params": params}

    bf_tr_f = net.apply(P, tr, method=DiMPNet.extract_backbone)
    bf_te_f = net.apply(P, te, method=DiMPNet.extract_backbone)
    cf_tr_f = net.apply(P, bf_tr_f, method=DiMPNet.extract_classification_feat)
    cf_te_f = net.apply(P, bf_te_f, method=DiMPNet.extract_classification_feat)
    w0_f = net.apply(P, cf_tr_f, bbj, method=DiMPNet.get_filter)
    w_f = net.apply(P, w0_f, cf_tr_f, bbj, None, 5,
                    method=DiMPNet.optimize_filter)
    scores_f = net.apply(P, w_f, cf_te_f, method=DiMPNet.classify)
    mod_f = net.apply(P, [bf_tr_f["layer2"][:1], bf_tr_f["layer3"][:1]],
                      bbj[:1], method=lambda m, f, b: m.bb_regressor.get_modulation(f, b))
    iou_feat_f = net.apply(P, [bf_te_f["layer2"], bf_te_f["layer3"]],
                           method=lambda m, f: m.bb_regressor.get_iou_feat(f))
    iou_f = net.apply(P, mod_f, iou_feat_f, propsj,
                      method=lambda m, a, b, c: m.bb_regressor.predict_iou(a, b, c))

    def nchw(x):
        return np.asarray(x).transpose(0, 3, 1, 2)

    diffs = {
        "layer2": float(np.abs(nchw(bf_tr_f["layer2"]) - bf_tr["layer2"].numpy()).max()),
        "layer3": float(np.abs(nchw(bf_tr_f["layer3"]) - bf_tr["layer3"].numpy()).max()),
        "clf_feat": float(np.abs(nchw(cf_tr_f) - cf_tr.numpy()).max()),
        "filter_init": float(np.abs(
            np.asarray(w0_f).transpose(2, 0, 1) - w0.numpy()[0]).max()),
        "filter_opt": float(np.abs(
            np.asarray(w_f).transpose(2, 0, 1) - w.numpy()[0]).max()),
        "scores": float(np.abs(np.asarray(scores_f) -
                               scores_t.numpy().reshape(np.asarray(scores_f).shape)).max()),
        "mod3": float(np.abs(np.asarray(mod_f[0]) - mod[0].numpy().reshape(1, -1)).max()),
        "mod4": float(np.abs(np.asarray(mod_f[1]) - mod[1].numpy().reshape(1, -1)).max()),
        "iou": float(np.abs(np.asarray(iou_f) - iou_t.numpy()).max()),
    }
    return {
        "family": "dimp50" if merge is None else f"det_dimp50_{merge}",
        "torch_params": n_params,
        "max_abs_diff": diffs,
        "unexpected_torch_keys": [".".join(k) for k in unexpected],
        "pass": all(v <= TOL[k] for k, v in diffs.items()),
        "tol": TOL,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--merge", default="max")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0
    merge = None if args.merge in ("none", "None") else args.merge
    res = run(merge, args.seed)
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
