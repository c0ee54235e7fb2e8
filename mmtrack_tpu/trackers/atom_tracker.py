"""ATOM online tracker — factorized-convolution classifier optimized by
Gauss-Newton CG + IoUNet refinement.

Rebuild of RGBD/models/DeT/pytracking/tracker/atom/{atom.py,optim.py} with
the default.py / DeT_ATOM_* parameters:
  - classification features = raw backbone layer3 (ResNet-18, 256-d),
    projected to 64-d by a 1x1 matrix P learned ONLINE;
  - first frame: augmented sample set (ops/augment.py), joint (filter,
    projection) optimization of the FactorizedConvProblem residuals
    (optim.py:6-68) by Gauss-Newton CG (init_GN_iter=6, 60 CG total),
    preconditioned by M1 = diag([filter_reg, projection_reg])^-1
    (optim.py:18,67-68), from the reference's randn inits
    (filter_init_method='randn' ~ N(0, 1/numel), proj_init_method='randn'
    ~ N(0, 1/sqrt(in_dim)); atom.py:150-159, 620-623);
  - per frame: response = mlu(conv_same(x P, f)) on the 18x18 feature grid
    (operation.conv2d mode='same' drops the trailing row/col for even
    kernels, libs/operation.py:17-21), Fourier-interpolated to the
    288x288 output grid (localize_target, atom.py:375-388: cfft2 / HW,
    shift_fs by pi*(1 - (ksz%2)/sz), sample_fs at
    score_upsample_factor * img_support_sz) where ATOM's advanced
    localization runs (atom.py:427-484 — displacement norms are ABSOLUTE
    crop-center offsets, unlike DiMP's previous-position-relative ones);
  - IoUNet box refinement (shared dimp_tracker._refine_box); sample
    memory of PROJECTED features + Gaussian labels on the 18x18 grid with
    the (pos - pos.round()) sub-cell and the +0.5 even-kernel label
    offsets (init_label_function / get_label_function, atom.py:628-647,
    719-726);
  - updates: ConvProblem CG on the filter only (CG_iter=5 every
    train_skipping-th frame, hard_negative_CG_iter=5 + lr 0.02 on hard
    negatives) through ops/optimization.gauss_newton_cg(num_gn=1,
    fletcher_reeves=False) — the reference's single-linearization
    ConjugateGradient with the Polak-Ribiere beta (default.py:31).

ATOM ignores sample_patch's internal crop rounding: every coordinate
mapping (localization, labels, IoU boxes) uses sample_pos = pos.round()
and sample_scale = target_scale (atom.py:309-311), not the actual crop
geometry — replicated here on purpose.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.atom import ATOMNet
from mmtrack_tpu.models.dimp import apply_filter
from mmtrack_tpu.ops.augment import dimp_init_augmentations
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.ops.fourier import cfft2, sample_scores, shift_spectrum
from mmtrack_tpu.ops.optimization import gauss_newton_cg, mlu
from mmtrack_tpu.ops.window import gauss_label_2d
from mmtrack_tpu.trackers.dimp_tracker import (
    FLAG_HARD_NEG,
    FLAG_NORMAL,
    FLAG_NOT_FOUND,
    FLAG_UNCERTAIN,
    _get_iounet_box,
    _max2d,
    _normalize,
    _refine_box,
    _sample_geometry,
    DiMPRuntime,
)


@dataclass(frozen=True)
class ATOMRuntime(DiMPRuntime):
    """default.py numbers on top of the shared DiMP geometry/refinement
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
    score_upsample_factor: int = 1      # :55 (output grid = 1 * 288)
    # featurebase.py:60-63 via default.py:102 normalize_power=2: the
    # classification feature is power-normalized per sample; the IoUNet
    # consumes the RAW backbone clones captured before normalization
    # (deep.py ATOMResNet18.extract:226-232)
    feat_normalize_power: int | None = 2
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

    @property
    def output_sz(self) -> int:
        """Fourier-interpolated score grid (atom.py:86)."""
        return self.score_upsample_factor * self.image_sample_size


def _normalize_feat(rt: ATOMRuntime, feat: jnp.ndarray) -> jnp.ndarray:
    """Per-sample power normalization (featurebase.py get_feature:60-63):
    feat /= (sum(|feat|^p) / numel + 1e-10)^(1/p). feat: (N, S, S, C)."""
    p = rt.feat_normalize_power
    if p is None:
        return feat
    numel = feat.shape[1] * feat.shape[2] * feat.shape[3]
    s = jnp.sum(jnp.abs(feat) ** p, axis=(1, 2, 3), keepdims=True) / numel
    return feat / (s + 1e-10) ** (1.0 / p)


def _apply_filter_same(rt: ATOMRuntime, comp, f):
    """operation.conv2d(..., mode='same'): even kernels pad k//2 on both
    sides and drop the trailing row/col (operation.py:17-21), so the
    response lives on the feat_sz grid."""
    resp = apply_filter(comp, f)
    if rt.kernel_size % 2 == 0:
        resp = resp[:, :-1, :-1]
    return resp


def _sigma(rt: ATOMRuntime, base_target_sz):
    """Label sigma in feature-grid cells (atom.py:632-634)."""
    return rt.output_sigma_factor * jnp.sqrt(
        jnp.prod(base_target_sz)) / rt.feat_stride


def _label(rt: ATOMRuntime, sigma, center_yx):
    """Gaussian label on the feat_sz grid; center relative to the grid
    center, INCLUDING the caller-supplied +0.5 even-kernel offset."""
    S = rt.feat_sz
    return gauss_label_2d(S, S, sigma, sigma, center_yx[0], center_yx[1])


def _kernel_offset(rt: ATOMRuntime) -> float:
    """0.5 * ((ksz+1) % 2) label-center shift (atom.py:641,724)."""
    return 0.5 * ((rt.kernel_size + 1) % 2)


def _residuals_joint(rt: ATOMRuntime, fp, samples, y, sw):
    """FactorizedConvProblem residuals (optim.py:20-46)."""
    f, P = fp
    comp = samples @ P                           # 1x1 projection
    resp = mlu(_apply_filter_same(rt, comp, f), rt.response_act_param)
    data = jnp.sqrt(sw)[:, None, None] * (resp - y)
    return {"data": data,
            "f": math.sqrt(rt.filter_reg) * f,
            "P": math.sqrt(rt.projection_reg) * P}


def _residuals_filter(rt: ATOMRuntime, f, comp, y, sw):
    """ConvProblem residuals over the filter only (optim.py:71-94)."""
    resp = mlu(_apply_filter_same(rt, comp, f), rt.response_act_param)
    data = jnp.sqrt(sw)[:, None, None] * (resp - y)
    return {"data": data, "f": math.sqrt(rt.filter_reg) * f}


def _interpolate_scores(rt: ATOMRuntime, raw: jnp.ndarray) -> jnp.ndarray:
    """Fourier interpolation of the raw response onto the output grid
    (localize_target, atom.py:375-388): centered spectrum / HW, shifted by
    pi*(1 - (ksz % 2)/sz) so the zero-displacement peak recenters, sampled
    at output_sz and fftshifted so index G//2 is zero displacement."""
    N = raw.shape[-1]
    G = rt.output_sz
    sf = cfft2(raw) / (N * N)
    shift = math.pi * (1.0 - (rt.kernel_size % 2) / N)
    sf = shift_spectrum(sf, jnp.asarray([shift, shift], jnp.float32))
    sc = sample_scores(sf, G)                    # index 0 = zero disp
    return jnp.roll(sc, (G // 2, G // 2), axis=(-2, -1))


def _localize_atom(rt: ATOMRuntime, scores, state, sample_scale):
    """ATOM advanced localization on the interpolated output grid
    (atom.py:427-484). Unlike DiMP's (dimp.py:239-304, shared
    _localize_advanced), the displacement norms are absolute offsets from
    the crop center — no previous-position subtraction. Returns
    (translation_yx, flag, max_score)."""
    G = rt.output_sz
    center = G // 2
    scale_fac = (rt.image_sample_size / G) * sample_scale

    max1, disp1 = _max2d(scores)
    target_disp1 = disp1 - center
    trans1 = target_disp1 * scale_fac

    # mask the target neighborhood (atom.py:451-457): round() bounds with
    # the asymmetric +1 bottom/right edge, clamped to the map
    neigh = rt.target_neighborhood_scale * state["target_sz"] / sample_scale
    iy = jnp.arange(G, dtype=jnp.float32)[:, None]
    ix = jnp.arange(G, dtype=jnp.float32)[None, :]
    top = jnp.maximum(jnp.round(disp1[0] - neigh[0] / 2), 0.0)
    bottom = jnp.minimum(jnp.round(disp1[0] + neigh[0] / 2 + 1), float(G))
    left = jnp.maximum(jnp.round(disp1[1] - neigh[1] / 2), 0.0)
    right = jnp.minimum(jnp.round(disp1[1] + neigh[1] / 2 + 1), float(G))
    inside = ((iy >= top) & (iy < bottom)) & ((ix >= left) & (ix < right))
    masked = jnp.where(inside, 0.0, scores)
    max2, disp2 = _max2d(masked)
    target_disp2 = disp2 - center
    trans2 = target_disp2 * scale_fac

    disp_norm1 = jnp.sqrt((target_disp1 ** 2).sum())
    disp_norm2 = jnp.sqrt((target_disp2 ** 2).sum())
    disp_thresh = rt.displacement_scale * math.sqrt(G * G) / 2

    not_found = max1 < rt.target_not_found_threshold
    distractor = max2 > rt.distractor_threshold * max1
    hn_d1 = distractor & (disp_norm2 > disp_thresh) & (disp_norm1 < disp_thresh)
    hn_d2 = distractor & (disp_norm2 < disp_thresh) & (disp_norm1 > disp_thresh)
    uncertain_d = distractor & ~hn_d1 & ~hn_d2
    hard_neg2 = (~distractor & (max2 > rt.hard_negative_threshold * max1)
                 & (max2 > rt.target_not_found_threshold))

    flag = jnp.where(
        not_found, FLAG_NOT_FOUND,
        jnp.where(hn_d1, FLAG_HARD_NEG,
                  jnp.where(hn_d2, FLAG_HARD_NEG,
                            jnp.where(uncertain_d, FLAG_UNCERTAIN,
                                      jnp.where(hard_neg2, FLAG_HARD_NEG,
                                                FLAG_NORMAL)))))
    translation = jnp.where(hn_d2 & ~not_found, trans2, trans1)
    return translation, flag.astype(jnp.int32), max1


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


def atom_assemble_init_state(rt: ATOMRuntime, model: ATOMNet, params,
                             clf_feats: jnp.ndarray, bfeat_id: dict,
                             shifts: jnp.ndarray,
                             pos, target_sz, target_scale, base_target_sz,
                             rng, f0=None, P0=None) -> dict:
    """Build the tracker state from already-extracted init features
    (init_projection_matrix + init_label_function + init_memory +
    init_optimization + init_iou_net, atom.py:121-293). Split out so the
    trajectory parity harness can feed the REFERENCE'S own recorded init
    patches / randn (filter, P) inits through our state machine.

    clf_feats: (N, S, S, 256) power-normalized layer3 over the N
    augmented samples (identity first, dropout copies last); bfeat_id:
    {'layer2','layer3'} RAW identity-sample features for the IoU
    modulation; shifts: (N, 2) content shifts in sample px.
    """
    feats = clf_feats
    N = feats.shape[0]
    rng, rng_proj, rng_filt = jax.random.split(rng, 3)

    init_sample_pos = jnp.round(pos)
    # label centers (init_label_function, atom.py:628-647): sub-cell
    # target offset + even-kernel half-cell + per-transform shift
    sigma = _sigma(rt, base_target_sz)
    tcn = (pos - init_sample_pos) / (target_scale * rt.feat_stride)
    centers = tcn[None] + _kernel_offset(rt) + shifts / rt.feat_stride
    y0 = jax.vmap(lambda c: _label(rt, sigma, c))(centers)

    sw = jnp.full((N,), 1.0 / N)
    # joint filter+projection optimization from the reference's randn
    # inits (atom.py:150-159 filter_init_method, :620-623 proj randn),
    # preconditioned by FactorizedConvProblem.M1 (optim.py:18,67-68)
    if P0 is None:
        P0 = jax.random.normal(rng_proj, (rt.feat_dim, rt.compressed_dim)) \
            / jnp.sqrt(rt.feat_dim)
    if f0 is None:
        k = rt.kernel_size
        numel = k * k * rt.compressed_dim
        f0 = jax.random.normal(rng_filt, (k, k, rt.compressed_dim)) / numel
    f, P = gauss_newton_cg(
        partial(_residuals_joint, rt, samples=feats, y=y0, sw=sw),
        (f0, P0), rt.init_gn_iter, rt.init_cg_per_gn,
        precond=lambda t: (t[0] / rt.filter_reg, t[1] / rt.projection_reg))

    mod3, mod4 = model.apply(
        params, [bfeat_id["layer2"][:1], bfeat_id["layer3"][:1]],
        _get_iounet_box(rt, pos, target_sz, init_sample_pos,
                        target_scale)[None],
        method=lambda m, ff, b: m.bb_regressor.get_modulation(ff, b))

    comp_init = feats @ P
    M = rt.sample_memory_size
    S = rt.feat_sz
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


def atom_init_state(rt: ATOMRuntime, model: ATOMNet, params,
                    frame: jnp.ndarray, init_box_xywh: jnp.ndarray) -> dict:
    x, y_, w, h = init_box_xywh
    pos = jnp.stack([y_ + (h - 1) / 2, x + (w - 1) / 2])
    target_sz = jnp.stack([h, w])
    search_area = jnp.prod(target_sz * rt.search_area_scale)
    target_scale = jnp.sqrt(search_area) / rt.image_sample_size
    base_target_sz = target_sz / target_scale

    rng = jax.random.PRNGKey(0)
    rng, rng_shift, rng_drop = jax.random.split(rng, 3)

    S_im = rt.image_sample_size
    S_e = S_im * rt.augmentation_expansion_factor
    # init sample centered at the UNROUNDED pos (generate_init_samples,
    # atom.py:587 — sample_patch truncates internally); the label/box
    # mappings use pos.round() (init_label_function / init_iou_net)
    szl_e, tl_e, _, _ = _sample_geometry(rt, pos, target_scale,
                                         out_size=S_e)
    expanded = _normalize(crop_at(frame, pos, szl_e, S_e, origin_yx=tl_e))
    patches, shifts = dimp_init_augmentations(
        expanded, S_im, rng_shift, random_shift_factor=rt.random_shift_factor,
        blur_sigmas=rt.aug_blur, rotate_angles=rt.aug_rotate)

    bfeat = model.apply(params, patches, method=ATOMNet.extract_backbone)
    clf = _normalize_feat(rt, bfeat["layer3"])
    if rt.aug_dropout_num > 0:
        # feature-space dropout copies of the identity sample, made from
        # the NORMALIZED feature (generate_init_samples runs after
        # get_feature's normalization, atom.py:594-600)
        from mmtrack_tpu.ops.augment import feature_dropout

        drop = feature_dropout(clf[0], rng_drop, rt.aug_dropout_num,
                               rt.aug_dropout_prob)
        clf = jnp.concatenate([clf, drop], axis=0)
        shifts = jnp.concatenate(
            [shifts, jnp.zeros((rt.aug_dropout_num, 2), jnp.float32)], axis=0)

    return atom_assemble_init_state(
        rt, model, params, clf, {k: v[:1] for k, v in bfeat.items()},
        shifts, pos, target_sz, target_scale, base_target_sz, rng)


def atom_track_step(rt: ATOMRuntime, model: ATOMNet, params, state: dict,
                    frame: jnp.ndarray):
    """One tracked frame (atom.py track())."""
    # ATOM maps everything through (round(pos), target_scale) — atom.py
    # ignores sample_patch's internal rounding (see module docstring)
    sample_pos = jnp.round(state["pos"])
    sample_scale = state["target_scale"]
    crop_sz, tl, _, _ = _sample_geometry(rt, state["pos"],
                                         state["target_scale"])
    patch = _normalize(crop_at(frame, state["pos"], crop_sz,
                               rt.image_sample_size, origin_yx=tl))
    im_hw = (frame.shape[0], frame.shape[1])
    return atom_step_from_patch(rt, model, params, state, patch,
                                sample_pos, sample_scale, im_hw)


def atom_step_from_patch(rt: ATOMRuntime, model: ATOMNet, params,
                         state: dict, patch: jnp.ndarray,
                         sample_pos, sample_scale, im_hw):
    """The step from an already-normalized (S_im, S_im, C) patch and
    forced sample geometry — the trajectory parity harness feeds the
    reference's own recorded crops through this. Localization runs on the
    RAW conv response (atom.py:314 apply_filter has no response
    activation; 'mlu' only shapes the TRAINING residuals, optim.py)."""
    H, W = im_hw
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, rng_refine = jax.random.split(state["rng"])
    state = {**state, "rng": rng}

    bfeat = model.apply(params, patch[None], method=ATOMNet.extract_backbone)
    comp = _normalize_feat(rt, bfeat["layer3"]) @ state["projection"]
    raw = _apply_filter_same(rt, comp, state["filter"])
    scores = _interpolate_scores(rt, raw[0])

    translation, flag, max_score = _localize_atom(rt, scores, state,
                                                  sample_scale)
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

    # label for the new sample (get_label_function, atom.py:719-726):
    # post-refinement pos, init-frame sigma, even-kernel half-cell offset
    score_center = (state["pos"] - sample_pos) / (sample_scale * rt.feat_stride) \
        + _kernel_offset(rt)
    sigma = _sigma(rt, state["base_target_sz"])
    label = _label(rt, sigma, score_center)

    updated = _update_memory_atom(rt, state, comp[0], label, lr)
    state = jax.tree.map(lambda a, b: jnp.where(update_ok, a, b), updated, state)

    # reference atom.py:355-359: the periodic re-optimization is OUTSIDE
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
            f, 1, num_cg, fletcher_reeves=False),
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
