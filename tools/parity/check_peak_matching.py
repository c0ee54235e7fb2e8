"""KeepTrack peak-matching network torch->flax parity check.

Reference modules: RGBD/models/keep_track_vot2021/ltr/models/
memory_learning/peak_matching.py — DescriptorExtractor (4x4 conv gathered
at score-map peak cells, lines 453-474) and the SuperGlue matcher
(KeypointEncoder + 18-layer AttentionalGNN + log-Sinkhorn OT + mutual-max
filtering, lines 259-403). Instantiates the reference's own torch modules
with the peak_matching_net constructor shapes (descriptor_dim 256, layer3
feat dim 1024, sinkhorn 50 iters), converts the actual state_dict with
convert_peak_matching_checkpoint, and compares descriptors, the full
log-assignment matrix, and the filtered mutual-max matches on random
inputs with K0 != K1 peaks.

The flax rebuild pads peak sets to fixed K with a validity mask; with all
slots valid its Sinkhorn marginals reduce exactly to the reference's
(valid counts == slot counts), which this check exercises.

Run: python tools/parity/check_peak_matching.py
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

TOL = 1e-4  # 50 sinkhorn iters + 18 GNN layers accumulate f32 noise


def run(seed: int = 0) -> dict:
    import torch

    H = W = 22          # layer3 map of a 352 crop; score grid is 23x23
    K0, K1 = 7, 5
    D, C = 256, 1024
    rng = np.random.RandomState(seed)

    feat0 = rng.randn(1, C, H, W).astype(np.float32)
    feat1 = rng.randn(1, C, H, W).astype(np.float32)
    # score-map cells in [0, H] INCLUSIVE (23x23 grid over the 22x22 map)
    cells0 = rng.randint(0, H + 1, size=(1, K0, 2)).astype(np.float32)
    cells1 = rng.randint(0, H + 1, size=(1, K1, 2)).astype(np.float32)
    kpts0 = (rng.rand(1, K0, 2) * 288.0).astype(np.float32)  # image px (x, y)
    kpts1 = (rng.rand(1, K1, 2) * 288.0).astype(np.float32)
    sc0 = rng.rand(1, K0).astype(np.float32)
    sc1 = rng.rand(1, K1).astype(np.float32)
    size_wh = np.asarray([[288.0, 288.0]], np.float32)

    with reference_path("RGBD/models/keep_track_vot2021"):
        pm = importlib.import_module("ltr.models.memory_learning.peak_matching")

        torch.manual_seed(seed)
        tdesc = pm.DescriptorExtractor(backbone_feat_dim=C, descriptor_dim=D,
                                       kernel_size=4)
        tmatch = pm.SuperGlue(conf={"skip_gnn": False})
        tdesc.eval(), tmatch.eval()

        with torch.no_grad():
            d0 = tdesc.get_descriptors(torch.from_numpy(feat0),
                                       torch.from_numpy(cells0))
            d1 = tdesc.get_descriptors(torch.from_numpy(feat1),
                                       torch.from_numpy(cells1))
            pred = tmatch({
                "descriptors0": d0, "descriptors1": d1,
                "keypoints0": torch.from_numpy(kpts0),
                "keypoints1": torch.from_numpy(kpts1),
                "keypoint_scores0": torch.from_numpy(sc0),
                "keypoint_scores1": torch.from_numpy(sc1),
                "image_size0": torch.from_numpy(size_wh),
                "image_size1": torch.from_numpy(size_wh),
            })

        sd = {}
        sd.update({"descriptor_extractor." + k: v
                   for k, v in tdesc.state_dict().items()})
        sd.update({"matcher." + k: v for k, v in tmatch.state_dict().items()})

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mmtrack_tpu.models.convert import (convert_peak_matching_checkpoint,
                                            load_into)
    from mmtrack_tpu.models.peak_matching import (DescriptorExtractor,
                                                  PeakMatcher)

    conv = convert_peak_matching_checkpoint(sd)

    fdesc = DescriptorExtractor(D)
    dz = fdesc.init(jax.random.PRNGKey(0),
                    jnp.zeros((H, W, C)), jnp.zeros((K0, 2)))
    dp, miss, unexp = load_into(dz["params"], conv["desc"]["params"])
    assert not miss and not unexp, (miss, unexp)

    # flax feat is HWC; coords are (y, x) = the torch (row, col) cells
    fd0 = fdesc.apply({"params": dp}, jnp.asarray(feat0[0].transpose(1, 2, 0)),
                      jnp.asarray(cells0[0]))
    fd1 = fdesc.apply({"params": dp}, jnp.asarray(feat1[0].transpose(1, 2, 0)),
                      jnp.asarray(cells1[0]))

    fmatch = PeakMatcher(descriptor_dim=D, sinkhorn_iters=50)
    K = max(K0, K1)

    def pad(a, k, fill=0.0):
        out = np.full((1, k) + a.shape[2:], fill, np.float32)
        out[:, :a.shape[1]] = a
        return jnp.asarray(out)

    v0 = jnp.asarray(np.arange(K)[None] < K0)
    v1 = jnp.asarray(np.arange(K)[None] < K1)
    mz = fmatch.init(jax.random.PRNGKey(0),
                     pad(np.zeros((1, K0, D), np.float32), K), pad(kpts0, K),
                     pad(sc0, K), v0,
                     pad(np.zeros((1, K1, D), np.float32), K), pad(kpts1, K),
                     pad(sc1, K), v1)
    mp, miss, unexp = load_into(mz["params"], conv["matcher"]["params"])
    assert not miss and not unexp, (miss, unexp)
    ms, miss, unexp = load_into(mz["batch_stats"],
                                conv["matcher"]["batch_stats"])
    assert not miss and not unexp, (miss, unexp)

    out = fmatch.apply({"params": mp, "batch_stats": ms},
                       pad(np.asarray(fd0)[None], K), pad(kpts0, K),
                       pad(sc0, K), v0,
                       pad(np.asarray(fd1)[None], K), pad(kpts1, K),
                       pad(sc1, K), v1)

    Zt = pred["log_assignment"].numpy()               # (1, K0+1, K1+1)
    Zf = np.asarray(out["log_assignment"])            # (1, K+1,  K+1)
    # flax pads to K: valid rows/cols 0..K0-1 / 0..K1-1, dustbin at K
    Zf_core = np.concatenate([
        np.concatenate([Zf[:, :K0, :K1], Zf[:, :K0, K:]], axis=2),
        np.concatenate([Zf[:, K:, :K1], Zf[:, K:, K:]], axis=2)], axis=1)

    mt = pred["matches0"].numpy()[0]
    mf = np.asarray(out["matches0"])[0, :K0]
    st = pred["match_scores0"].numpy()[0]
    sf = np.asarray(out["match_scores0"])[0, :K0]

    results = {
        "descriptors0": float(np.max(np.abs(
            np.asarray(fd0) - d0[0].numpy().T))),
        "descriptors1": float(np.max(np.abs(
            np.asarray(fd1) - d1[0].numpy().T))),
        "log_assignment": float(np.max(np.abs(Zf_core - Zt))),
        "match_scores0": float(np.max(np.abs(sf - st))),
    }
    ok = all(v <= TOL for v in results.values()) and bool(
        np.array_equal(mf, mt))
    return {"ok": ok, "tol": TOL, "max_abs_diff": results,
            "matches0_equal": bool(np.array_equal(mf, mt)),
            "matches0": mf.tolist(),
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
