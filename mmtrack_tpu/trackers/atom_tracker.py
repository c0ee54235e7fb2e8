"""ATOM online tracker — factorized-convolution classifier optimized by
Gauss-Newton CG + IoUNet refinement.

Rebuild of RGBD/models/DeT/pytracking/tracker/atom/{atom.py,optim.py} with
the default.py / DeT_ATOM_* parameters:
  - classification features = raw backbone layer3 (ResNet-18, 256-d),
    projected to 64-d by a 1x1 matrix P learned ONLINE;
  - first frame: augmented sample set (ops/augment.py), joint (filter,
    projection) optimization of the FactorizedConvProblem residuals
    (optim.py:6-45) by Gauss-Newton CG (init_GN_iter=6, 60 CG total);
  - per frame: response = mlu(conv(x P, f)); ATOM advanced localization
    (shared with DiMP, dimp_tracker._localize_advanced); IoUNet box
    refinement (shared _refine_box); sample memory of PROJECTED features +
    Gaussian labels (atom.py init_memory/update_memory);
  - updates: ConvProblem CG on the filter only (CG_iter=5 every
    train_skipping-th frame, hard_negative_CG_iter=5 + lr 0.02 on hard
    negatives) through ops/optimization.gauss_newton_cg(num_gn=1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.atom import ATOMNet
from mmtrack_tpu.models.dimp import apply_filter
from mmtrack_tpu.ops.augment import dimp_init_augmentations
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.ops.optimization import gauss_newton_cg, mlu
from mmtrack_tpu.ops.window import gauss_label_2d
from mmtrack_tpu.trackers.dimp_tracker import (
    DiMPRuntime,
    FLAG_HARD_NEG,
    FLAG_NOT_FOUND,
    FLAG_UNCERTAIN,
    _get_iounet_box,
    _localize_advanced,
    _normalize,
    _refine_box,
    _sample_geometry,
)


@dataclass(frozen=True)
class ATOMRuntime(DiMPRuntime):
    """default.py numbers on top of the shared DiMP geometry/localization
    fields (image_sample_size 288, scale 5, kernel 4, thresholds etc.)."""
    feat_dim: int = 256                 # resnet18 layer3
    compressed_dim: int = 64            # default.py:45
    filter_reg: float = 1e-1            # :46
    projection_reg: float = 1e-4        # :47
    init_gn_iter: int = 6               # :28
    init_cg_per_gn: int = 10            # :27 (60 CG total over 6 GN steps)
    update_cg_iter: int = 5             # :26
    hard_negative_cg_iter: int = 5      # :84
    output_sigma_factor: float = 0.25   # :37
    response_act_param: float = 0.05    # :74 ('mlu', 0.05)
    sample_memory_size: int = 250       # :40
    train_skipping: int = 10            # :41
    # ATOM's larger augmentation set (default.py:58-63)
    aug_rotate: tuple = (5, -5, 10, -10, 20, -20, 30, -30, 45, -45, -60, 60)
    aug_blur: tuple = ((2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2))
    aug_dropout_num: int = 7
    aug_dropout_prob: float = 0.2

    @property
    def num_init_samples(self) -> int:
        from mmtrack_tpu.ops.augment import num_image_augmentations
        return num_image_augmentations(
            blur_sigmas=self.aug_blur,
            rotate_angles=self.aug_rotate) + self.aug_dropout_num


def _sigma(rt: ATOMRuntime, base_target_sz):
    """Label sigma in score-map cells (atom.py init_learning)."""
    return rt.output_sigma_factor * jnp.sqrt(
        jnp.prod(base_target_sz)) / rt.feat_stride


def _label(rt: ATOMRuntime, sigma, center_yx):
    """Gaussian label on the score grid, center relative to grid center."""
    S = rt.score_sz
    return gauss_label_2d(S, S, sigma, sigma, center_yx[0], center_yx[1])


def _residuals_joint(rt: ATOMRuntime, fp, samples, y, sw):
    """FactorizedConvProblem residuals (optim.py:20-45)."""
    f, P = fp
    comp = samples @ P                           # 1x1 projection
    resp = mlu(apply_filter(comp, f), rt.response_act_param)
    data = jnp.sqrt(sw)[:, None, None] * (resp - y)
    return {"data": data,
            "f": jnp.sqrt(rt.filter_reg) * f,
            "P": jnp.sqrt(rt.projection_reg) * P}


def _residuals_filter(rt: ATOMRuntime, f, comp, y, sw):
    """ConvProblem residuals over the filter only (optim.py:71-94)."""
    resp = mlu(apply_filter(comp, f), rt.response_act_param)
    data = jnp.sqrt(sw)[:, None, None] * (resp - y)
    return {"data": data, "f": jnp.sqrt(rt.filter_reg) * f}


def _update_memory_atom(rt: ATOMRuntime, state, comp, label, lr):
    """Min-weight sample replacement on (projected feature, label) pairs
    (atom.py update_memory / update_sample_weights — same scheme as DiMP's,
    dimp.py:433-510)."""
    sw = state["sample_weights"]
    num = state["num_stored"]
    prev = state["prev_replace_ind"]
    num_init = rt.num_init_samples

    cand = jnp.where(jnp.arange(rt.sample_memory_size) >= num_init, sw, jnp.inf)
    r_min = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num < rt.sample_memory_size, num, r_min)

    first = prev < 0
    sw1 = jnp.where(first, sw / (1 - lr), sw)
    new_w = jnp.where(first, lr, sw1[jnp.maximum(prev, 0)] / (1 - lr))
    sw1 = sw1.at[r_ind].set(new_w)
    sw1 = sw1 / sw1.sum()
    init_sum = sw1[:num_init].sum()
    need = init_sum < rt.init_samples_minimum_weight
    rest = sw1[num_init:].sum()
    sw2 = sw1 / (rt.init_samples_minimum_weight + rest)
    sw2 = sw2.at[:num_init].set(rt.init_samples_minimum_weight / num_init)
    sw1 = jnp.where(need, sw2, sw1)

    return {
        **state,
        "memory_comp": state["memory_comp"].at[r_ind].set(comp),
        "memory_y": state["memory_y"].at[r_ind].set(label),
        "sample_weights": sw1,
        "num_stored": jnp.minimum(num + 1, rt.sample_memory_size),
        "prev_replace_ind": r_ind,
    }


def atom_init_state(rt: ATOMRuntime, model: ATOMNet, params,
                    frame: jnp.ndarray, init_box_xywh: jnp.ndarray) -> dict:
    x, y_, w, h = init_box_xywh
    pos = jnp.stack([y_ + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])
    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    rng = jax.random.PRNGKey(0)
    rng, rng_shift, rng_proj, rng_drop = jax.random.split(rng, 4)

    S_im = rt.image_sample_size
    S_e = S_im * rt.augmentation_expansion_factor
    # init sample centered at pos.round(), target box in crop coords uses
    # sample_scale = target_scale exactly (generate_init_samples semantics)
    init_sample_pos = jnp.round(pos)
    szl_e, tl_e, _, _ = _sample_geometry(
        rt, init_sample_pos, target_scale, out_size=S_e)
    expanded = _normalize(crop_at(frame, init_sample_pos, szl_e, S_e,
                                  origin_yx=tl_e))
    patches, shifts = dimp_init_augmentations(
        expanded, S_im, rng_shift, random_shift_factor=rt.random_shift_factor,
        blur_sigmas=rt.aug_blur, rotate_angles=rt.aug_rotate)

    bfeat = model.apply(params, patches, method=ATOMNet.extract_backbone)
    feats = bfeat["layer3"]                       # (N, S, S, 256)
    # feature-space dropout copies of the identity sample (default.py:63)
    from mmtrack_tpu.ops.augment import feature_dropout

    drop = feature_dropout(feats[0], rng_drop, rt.aug_dropout_num,
                           rt.aug_dropout_prob)
    feats = jnp.concatenate([feats, drop], axis=0)
    shifts = jnp.concatenate(
        [shifts, jnp.zeros((rt.aug_dropout_num, 2), jnp.float32)], axis=0)
    N = feats.shape[0]

    # Gaussian labels per augmented sample (init_label_function): the target
    # sits at the crop center shifted by each transform's translation
    sigma = _sigma(rt, base_target_sz)
    centers = shifts / rt.feat_stride            # (N, 2) score-grid offsets
    y0 = jax.vmap(lambda c: _label(rt, sigma, c))(centers)

    sw = jnp.full((N,), 1.0 / N)
    # joint filter+projection optimization (proj_init_method='randn')
    P0 = jax.random.normal(rng_proj, (rt.feat_dim, rt.compressed_dim)) \
        / jnp.sqrt(rt.feat_dim)
    f0 = jnp.zeros((rt.kernel_size, rt.kernel_size, rt.compressed_dim))
    f, P = gauss_newton_cg(
        partial(_residuals_joint, rt, samples=feats, y=y0, sw=sw),
        (f0, P0), rt.init_gn_iter, rt.init_cg_per_gn)

    mod3, mod4 = model.apply(
        params, [bfeat["layer2"][:1], bfeat["layer3"][:1]],
        _get_iounet_box(rt, pos, target_sz, init_sample_pos,
                        target_scale)[None],
        method=lambda m, ff, b: m.bb_regressor.get_modulation(ff, b))

    comp_init = feats @ P
    M = rt.sample_memory_size
    S = rt.score_sz
    memory_comp = jnp.zeros((M,) + comp_init.shape[1:], jnp.float32
                            ).at[:N].set(comp_init)
    memory_y = jnp.zeros((M, S, S), jnp.float32).at[:N].set(y0)
    sample_weights = jnp.zeros((M,), jnp.float32).at[:N].set(1.0 / N)

    return {
        "pos": pos, "target_sz": target_sz,
        "target_scale": target_scale, "base_target_sz": base_target_sz,
        "filter": f, "projection": P,
        "memory_comp": memory_comp, "memory_y": memory_y,
        "sample_weights": sample_weights,
        "num_stored": jnp.asarray(N, jnp.int32),
        "prev_replace_ind": jnp.asarray(-1, jnp.int32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "iou_mod3": mod3[0], "iou_mod4": mod4[0],
        "rng": rng,
    }


def atom_track_step(rt: ATOMRuntime, model: ATOMNet, params, state: dict,
                    frame: jnp.ndarray):
    """One tracked frame (atom.py track())."""
    H, W = frame.shape[0], frame.shape[1]
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}

    crop_sz, tl, sample_pos, sample_scale = _sample_geometry(
        rt, state["pos"], state["target_scale"])
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    bfeat = model.apply(params, patch[None], method=ATOMNet.extract_backbone)
    comp = bfeat["layer3"] @ state["projection"]
    scores = mlu(apply_filter(comp, state["filter"]),
                 rt.response_act_param)[0]

    translation, flag, max_score = _localize_advanced(
        rt, scores, state, sample_pos, sample_scale)
    found = flag != FLAG_NOT_FOUND

    new_pos = sample_pos + translation
    inside_offset = (rt.target_inside_ratio - 0.5) * state["target_sz"]
    img_sz = jnp.asarray([H, W], jnp.float32)
    new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                          inside_offset)
    state = {**state, "pos": jnp.where(found, new_pos, state["pos"])}

    ref_pos, ref_sz, ref_scale, ref_ok = _refine_box(
        rt, model, params, bfeat, state, sample_pos, sample_scale, rng_refine)
    apply_ref = found & ref_ok
    state = {
        **state,
        "pos": jnp.where(apply_ref, ref_pos, state["pos"]),
        "target_sz": jnp.where(apply_ref, ref_sz, state["target_sz"]),
        "target_scale": jnp.where(apply_ref, ref_scale, state["target_scale"]),
    }

    update_ok = (flag != FLAG_NOT_FOUND) & (flag != FLAG_UNCERTAIN)
    hard_neg = flag == FLAG_HARD_NEG
    lr = jnp.where(hard_neg, rt.hard_negative_learning_rate, rt.learning_rate)

    # label for the new sample: target center in this crop's score grid
    score_center = (state["pos"] - sample_pos) / (sample_scale * rt.feat_stride)
    sigma = _sigma(rt, state["base_target_sz"])
    label = _label(rt, sigma, score_center)

    updated = _update_memory_atom(rt, state, comp[0], label, lr)
    state = jax.tree.map(lambda a, b: jnp.where(update_ok, a, b), updated, state)

    # reference atom.py:287-290: the periodic re-optimization is OUTSIDE
    # the `if update_flag:` block — it runs on the train_skipping cadence
    # even when the frame is not_found/uncertain (only the memory update
    # above is gated); hard negatives trigger the longer CG run.
    num_cg = jnp.where(hard_neg, rt.hard_negative_cg_iter,
                       jnp.where((state["frame_num"] - 1) % rt.train_skipping == 0,
                                 rt.update_cg_iter, 0))
    # lax.cond keeps the GN linearize/VJP over the 250-sample memory off
    # the hot path on the ~9/10 frames where num_cg == 0
    new_f = jax.lax.cond(
        num_cg > 0,
        lambda f: gauss_newton_cg(
            partial(_residuals_filter, rt, comp=state["memory_comp"],
                    y=state["memory_y"], sw=state["sample_weights"]),
            f, 1, num_cg),
        lambda f: f,
        state["filter"])
    state = {**state, "filter": new_f}

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, max_score


class ATOMTracker:
    """OO facade (BaseTracker API)."""

    def __init__(self, model: ATOMNet, params,
                 runtime: ATOMRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or ATOMRuntime()
        self._init_fn = jax.jit(partial(atom_init_state, self.rt, self.model))
        self._step_fn = jax.jit(partial(atom_track_step, self.rt, self.model))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box)

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
