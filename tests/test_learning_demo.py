"""Guards for the end-to-end learning demo surface (tools/learning_demo.py).

The demo itself (driver artifact docs/artifacts/learning_demo.json) trains
for minutes; these tests pin the pieces it depends on so regressions show
up in the fast suite: the modality-split synthetic corpora, the demo
config geometry plumbing (EMBED_DIM/DEPTH/NUM_HEADS through
build_viptrack), the --full_tune / --init train-CLI surface, and the
held-out OPE evaluator.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- corpora

def test_synthetic_modality_split():
    """rgb_only leaves aux = pure background; aux_only hides the target
    from RGB (the ViPT new-modality setting, depth_utils.py:71-132's X
    channels carry the object)."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    kw = dict(n_frames=3, height=60, width=80, box0=(20.0, 15.0, 24.0, 18.0),
              velocity=(2.0, 1.0), seed=3)
    frames_rgb, gt = make_synthetic_sequence(**kw, target_aux=None)
    frames_aux, _ = make_synthetic_sequence(**kw, target_rgb=None)
    frames_both, _ = make_synthetic_sequence(**kw)

    x, y, w, h = (int(round(v)) for v in gt[0])
    inside = np.s_[0, y:y + h, x:x + w]

    # background everywhere stays < 80 (rng.randint(0, 80)); a drawn
    # target is 220/180 ± 20 texture
    assert frames_rgb[inside][..., :3].mean() > 150      # target in RGB
    assert frames_rgb[inside][..., 3:].max() < 80        # aux = background
    assert frames_aux[inside][..., 3:].mean() > 120      # target in aux
    assert frames_aux[inside][..., :3].max() < 80        # RGB = background
    # the default draw is unchanged by the split feature (RNG stream
    # compatibility with every golden fixture)
    assert frames_both[inside][..., :3].mean() > 150
    assert frames_both[inside][..., 3:].mean() > 120


def test_synthetic_distractor():
    """distractor=True adds an identical-looking square on the mirrored
    trajectory (the KYS propagation setting) without touching the default
    RNG stream: the base frames and ground truth are bit-identical, and
    the extra pixels form a second bright region away from the target."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    kw = dict(n_frames=5, height=120, width=160,
              box0=(20.0, 15.0, 24.0, 18.0), velocity=(2.0, 1.0), seed=5)
    base, gt = make_synthetic_sequence(**kw)
    dist, gt_d = make_synthetic_sequence(**kw, distractor=True)
    np.testing.assert_array_equal(gt, gt_d)

    x, y, w, h = (int(round(v)) for v in gt[0])
    # target untouched (drawn last, wins overlaps)
    np.testing.assert_array_equal(dist[0, y:y + h, x:x + w],
                                  base[0, y:y + h, x:x + w])
    # mirrored start: a second bright square where base has background
    mx, my = 160 - 20 - 24, 120 - 15 - 18
    assert base[0, my:my + h, mx:mx + w, :3].max() < 80
    assert dist[0, my:my + h, mx:mx + w, :3].mean() > 150
    # everything outside the two squares is the same background
    mask = np.ones((120, 160), bool)
    mask[y:y + h, x:x + w] = False
    mask[my:my + h, mx:mx + w] = False
    np.testing.assert_array_equal(dist[0][mask], base[0][mask])


def test_synthetic_dataset_modality_plumbs_through():
    from mmtrack_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_sequences=1, n_frames=2, modality="aux_only")
    frames, gt = ds.get_frames(0, [0])
    x, y, w, h = (int(round(float(v))) for v in gt[0])
    assert frames[0][y:y + h, x:x + w, :3].max() < 80
    assert frames[0][y:y + h, x:x + w, 3:].mean() > 120


# ------------------------------------------------------- config geometry

def test_demo_config_builds_small_vit():
    """configs/demo/tiny_synthetic.yaml must produce a genuinely small
    model through the SAME build path as production (EMBED_DIM/DEPTH/
    NUM_HEADS override, round 4)."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.config import vipt_default_config
    from mmtrack_tpu.models.vipt import build_viptrack, generate_ctr_mask

    cfg = vipt_default_config()
    assert cfg.MODEL.BACKBONE.EMBED_DIM == 768   # ViT-B default untouched
    cfg.merge_from_yaml(os.path.join(REPO, "configs", "demo",
                                     "tiny_synthetic.yaml"))
    assert cfg.MODEL.BACKBONE.EMBED_DIM == 128
    model = build_viptrack(cfg)
    z = jnp.zeros((1, 64, 64, 6))
    x = jnp.zeros((1, 128, 128, 6))
    mask_z = generate_ctr_mask(4, cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE)
    params = jax.eval_shape(lambda r: model.init(r, z, x, mask_z, ()),
                            jax.random.PRNGKey(0))
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    assert n < 5e6, f"demo model should be tiny, got {n / 1e6:.1f}M"


# -------------------------------------------------------- train CLI args

def test_train_cli_full_tune_and_modality_args():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), "--help"],
        capture_output=True, text=True, cwd=REPO, check=True).stdout
    assert "--full_tune" in out
    assert "--synthetic_modality" in out
    assert "rgb_only" in out and "aux_only" in out
    assert "--channels" in out  # kys/lwl 3-ch fork recipe vs 6-ch graft


def test_evaluate_factory_init_mask():
    """with_init_mask hands the tracker an exact rectangle mask (the
    LWL/STM init protocol; the synthetic target IS a rectangle)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import learning_demo as ld

    seen = []

    class Probe:
        def initialize(self, frame, info):
            seen.append(info)
            self._b = list(info["init_bbox"])

        def track(self, frame):
            return {"target_bbox": self._b}

    ld.evaluate_factory(Probe, with_init_mask=True)
    assert len(seen) == len(ld.HELDOUT)
    for info, spec in zip(seen, ld.HELDOUT):
        m = info["init_mask"]
        x, y, w, h = (int(round(v)) for v in spec["box0"])
        assert m.shape == (120, 160)
        assert m.sum() == m[max(y, 0):y + h, max(x, 0):x + w].sum() > 0


# --------------------------------------------------------- demo evaluator

def test_evaluate_factory_perfect_tracker_scores_one():
    """A tracker that echoes ground truth must score IoU=AUC=SR=1; one
    that sits still must score near zero — the held-out metric is real."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import learning_demo as ld

    class Echo:
        def __init__(self, gts):
            self._g, self._t = gts, 0

        def initialize(self, frame, info):
            pass

        def track(self, frame):
            self._t += 1
            return {"target_bbox": self._g[self._t].tolist()}

    from mmtrack_tpu.data.synthetic import make_synthetic_sequence

    gts = {tuple(s["box0"]): make_synthetic_sequence(
        n_frames=ld.N_FRAMES, height=120, width=160, **s)[1]
        for s in ld.HELDOUT}
    it = iter([gts[tuple(s["box0"])] for s in ld.HELDOUT])
    res = ld.evaluate_factory(lambda: Echo(next(it)))
    assert res["mean_iou"] > 0.999 and res["sr50"] == 1.0

    class Still:
        def initialize(self, frame, info):
            self._b = list(info["init_bbox"])

        def track(self, frame):
            return {"target_bbox": self._b}

    res = ld.evaluate_factory(Still)
    assert res["mean_iou"] < 0.35 and res["sr50"] < 0.5


def test_learning_demo_artifact_recorded():
    """The driver-facing artifact must exist and show both stages learned
    (regenerate with `python tools/learning_demo.py`)."""
    import json

    p = os.path.join(REPO, "docs", "artifacts", "learning_demo.json")
    if not os.path.exists(p):
        pytest.skip("artifact not generated in this checkout")
    with open(p) as f:
        r = json.load(f)
    assert r["stage1_improved"] and r["prompt_tuning_improved"]
    assert r["stage1"]["after"]["auc"] > r["stage1"]["before"]["auc"] + 0.05
    s2 = r["stage2_prompt_only"]
    assert s2["after"]["auc"] > s2["before"]["auc"] + 0.02
