"""ECO online tracker — factorized Fourier-domain correlation filters.

Rebuild of RGBD/models/keep_track_vot2021/pytracking/tracker/eco/
{eco.py,optim.py} with parameter/eco/default.py constants (the same ECO
every AR-external fork ships). Two feature blocks from one
resnet18_vggmconv1 pass (vggconv1 @ stride 4 via avg-pool 2, layer3 @
stride 16), each l2-power-normalized, PCA-projected (96->16 / 256->64)
and correlated in the Fourier domain against per-block filters:

  - init (eco.py:25-177): 23 augmented crops + 7 feature-dropout copies,
    PCA projection init, joint (filter, projection) Gauss-Newton-CG on the
    FactorizedConvProblem residuals (optim.py:8-118) with the reference's
    diagonal preconditioner, then compressed sample memory;
  - per frame (eco.py:181-241): 5-scale crops, per-block score spectra
    fused by 'weightedsum' (0.4/0.6) on the common grid, wraparound
    localization at output_sz = img_support_sz, Fourier-shifted train
    sample into a 200-slot memory (min-weight replacement,
    eco.py:346-370), preconditioned CG on the filter every
    train_skipping=10 frames (FilterOptim, optim.py:121-208).

Spectra are full centered complex series (see ops/fourier.py for why this
is exactly the reference's half-spectrum math); the joint init solve
reuses ops/optimization.gauss_newton_cg and the online FilterOptim runs
ops/optimization.conjugate_gradient_stateful with the reference's exact
iteration — Polak-Ribiere beta (default.py:28) and the previous conjugate
direction carried across periodic optimizations, decayed by
(1 - max(lr))**CG_forgetting_rate (eco.py:93-95; "cg_state" in the
tracker state) — so the whole per-frame update is ONE jitted step.
Remaining deviation: init augmentations are windowed from one expanded 2x
crop (ops/augment.py) instead of zero-rolled inside a single crop — the
hann window zeroes the affected 6 px borders anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.backbones import ResNetVGGm1
from mmtrack_tpu.ops.crop import crop_at
from mmtrack_tpu.ops.fourier import (
    bicubic_interp_spectrum,
    cfft2,
    conj_symmetrize,
    embed_spectrum,
    gauss_label_spectrum,
    max2d_wrapped,
    reg_filter,
    sample_scores,
    shift_spectrum,
)
from mmtrack_tpu.ops.optimization import (
    cg_state_init,
    conjugate_gradient_stateful,
    gauss_newton_cg,
)
from mmtrack_tpu.ops.window import hann2d

# ImageNet statistics (features/deep.py:10-11)
_MEAN3 = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD3 = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class ECORuntime:
    """parameter/eco/default.py constants. Two feature blocks:
    index 0 = shallow (vggconv1), index 1 = deep (layer3)."""
    search_area_scale: float = 4.5          # default.py:21
    min_image_sample_size: int = 200 ** 2   # :20
    max_image_sample_size: int = 250 ** 2   # :19
    strides: tuple = (4, 16)                # vggconv1*pool2, layer3
    blocks: tuple = ("vggconv1", "layer3")   # backbone taps, per stride
    feat_dims: tuple = (96, 256)
    compressed_dims: tuple = (16, 64)       # :71-72
    learning_rates: tuple = (0.025, 0.0075)  # :33-34
    output_sigma_factors: tuple = (1 / 16, 1 / 4)  # :35-36
    translation_weights: tuple = (0.4, 0.6)  # :49-50
    sample_memory_size: int = 200           # :39
    train_skipping: int = 10                # :40
    cg_iter: int = 5                        # :24
    init_cg_iter: int = 100                 # :25
    init_gn_iter: int = 10                  # :26
    post_init_cg_iter: int = 0              # :27
    precond_data_param: float = 0.3         # :30
    precond_reg_param: float = 0.15         # :31
    precond_proj_param: float = 35.0        # :32
    projection_reg: float = 5e-8            # :69
    num_scales: int = 5                     # :44 (1.02^(-2..2))
    scale_step: float = 1.02
    interp_bicubic_a: float = -0.75         # :76
    reg_window_min: tuple = (1e-4, 10e-4)   # :83,89
    reg_window_edge: tuple = (10e-3, 50e-3)  # :84,90
    reg_window_power: float = 2.0           # :85,91
    reg_sparsity_threshold: tuple = (0.05, 0.1)  # :86,92
    target_inside_ratio: float = 0.2        # eco.py:378
    # init augmentation (default.py:53-57); shifts are absolute pixels
    aug_shifts: tuple = ((6, 6), (-6, 6), (6, -6), (-6, -6))
    aug_rotate: tuple = (5, -5, 10, -10, 20, -20, 30, -30, 45, -45, -60, 60)
    aug_blur: tuple = ((2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2))
    aug_dropout_num: int = 7
    aug_dropout_prob: float = 0.2
    # CCOT mode (trackers/ccot_tracker.py): full-dimensional filters (no
    # projection) updated EVERY frame (ccot.py:146-150 runs FilterOptim
    # unconditionally; ECO's schedule gates on train_skipping)
    use_projection: bool = True
    train_every_frame: bool = False
    # C-COT's update_sample_weights second-sample branch differs from
    # ECO's (ccot.py:185-190 vs eco.py:358-363) — see
    # _update_weights_ccot
    ccot_weight_update: bool = False
    # online CG beta/carry (default.py:28,30): Polak-Ribiere with the
    # previous conjugate direction persisted across periodic
    # optimizations, decayed by (1 - max(lr))**CG_forgetting_rate
    # (eco.py:93-95)
    fletcher_reeves: bool = False           # :28
    cg_forgetting_rate: int = 75            # :30

    @property
    def n_blocks(self) -> int:
        return len(self.strides)

    @property
    def direction_forget_factor(self) -> float:
        return (1.0 - max(self.learning_rates)) ** self.cg_forgetting_rate

    @property
    def scale_factors(self) -> np.ndarray:
        e = np.arange(self.num_scales) - (self.num_scales - 1) // 2
        return (self.scale_step ** e).astype(np.float32)

    @property
    def num_init_samples(self) -> int:
        return (1 + len(self.aug_shifts) + 1 + len(self.aug_blur)
                + len(self.aug_rotate) + self.aug_dropout_num)


@dataclass(frozen=True)
class ECOGeom:
    """Per-sequence static shapes (eco.py:57-70): jit specializes on these
    (sample_sz is 208 or 240 for the default search-area bounds)."""
    sample_sz: int
    feat_sz: tuple
    filt_sz: tuple


def eco_geometry(rt: ECORuntime, target_hw) -> tuple[ECOGeom, dict]:
    """Host-side per-sequence geometry (eco.py:47-88). Returns the static
    shape record and the constant-array pytree (windows, interpolation and
    label spectra, sparsified regularization kernels, init scale)."""
    ts = np.asarray(target_hw, np.float64)
    search_area = float(np.prod(ts * rt.search_area_scale))
    if search_area > rt.max_image_sample_size:
        scale = np.sqrt(search_area / rt.max_image_sample_size)
    elif search_area < rt.min_image_sample_size:
        scale = np.sqrt(search_area / rt.min_image_sample_size)
    else:
        scale = 1.0
    base = ts / scale
    S = int(round(np.sqrt(np.prod(base * rt.search_area_scale))))
    S += max(rt.strides) - S % (2 * max(rt.strides))

    feat_sz = tuple(S // s for s in rt.strides)
    filt_sz = tuple(f + (f + 1) % 2 for f in feat_sz)
    sigmas = [(F / S) * np.sqrt(np.prod(base)) * osf
              for F, osf in zip(filt_sz, rt.output_sigma_factors)]

    regs = []
    for b in range(rt.n_blocks):
        args = ((S, S), base, rt.reg_window_min[b], rt.reg_window_edge[b],
                rt.reg_window_power, rt.reg_sparsity_threshold[b])
        try:
            rk = reg_filter(*args, pad_to=15)
        except ValueError:   # pathological aspect ratio: accept a re-jit
            rk = reg_filter(*args)
        regs.append(rk)      # numpy: stays host-side until jit consumes it

    consts = {
        "target_scale": np.float32(scale),
        "base_target_sz": jnp.asarray(base, jnp.float32),
        "windows": tuple(hann2d(f) for f in feat_sz),
        # real/imag pair: complex64 cannot cross the axon host<->device
        # boundary (transfer UNIMPLEMENTED); _to_spectrum recomposes it
        # on device with lax.complex
        "interp": tuple(
            np.stack([k.real, k.imag], -1).astype(np.float32)
            for k in (bicubic_interp_spectrum(F, rt.interp_bicubic_a)
                      for F in filt_sz)),
        "yf": tuple(gauss_label_spectrum(F, sg, sg)
                    for F, sg in zip(filt_sz, sigmas)),
        "reg": tuple(jnp.asarray(r) for r in regs),
        "reg_energy": tuple(np.float32(np.sum(r ** 2)) for r in regs),
    }
    return ECOGeom(S, feat_sz, filt_sz), consts


def _norm3(patches: jnp.ndarray) -> jnp.ndarray:
    return (patches / 255.0 - jnp.asarray(_MEAN3)) / jnp.asarray(_STD3)


def _crop(frame, pos, side, out_sz: int):
    """sample_patch integer geometry (preprocessing.py: pos.long() center,
    rounded side, tl = posl - (szl-1)//2), shared with the DiMP family."""
    szl = jnp.maximum(jnp.round(side), 2.0)
    posl = jnp.trunc(pos)
    tl = posl - (szl - 1) // 2
    return crop_at(frame, pos, szl, out_sz, origin_yx=tl)


def _extract_features(model, params, patches,
                      blocks=("vggconv1", "layer3")):
    """Backbone taps -> the ECO feature blocks (featurebase.py
    get_feature: avg-pool vggconv1 by pool_stride 2, then per-sample
    power-2 normalization of each block). `blocks` names the taps; the
    default is the two-block ECO configuration (CCOT's layer3-only A/B
    passes a single tap)."""
    out = model.apply(params, _norm3(patches),
                      out_layers=tuple(dict.fromkeys(blocks)))
    feats = []
    for name in blocks:
        f = out[name]
        if name == "vggconv1":   # pool_stride 2 (features/deep.py)
            f = jax.lax.reduce_window(
                f, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
        n = jnp.sum(f * f, axis=(1, 2, 3), keepdims=True) / \
            (f.shape[1] * f.shape[2] * f.shape[3])
        feats.append(f / jnp.sqrt(n + 1e-10))
    return tuple(feats)


def _to_spectrum(feat, window, interp_ri):
    """window -> centered Fourier series -> interpolation
    (eco.py preprocess_sample): (n, h, w, c) -> (n, c, F, F) complex.
    `interp_ri` is the kernel as an (F, F, 2) real/imag pair (complex64
    cannot cross the axon host<->device boundary)."""
    x = (feat * window[None, :, :, None]).transpose(0, 3, 1, 2)
    return cfft2(x) * _cplx(interp_ri)[None, None]


def _ri(h):
    return jnp.stack([h.real, h.imag], axis=-1)


def _cplx(h_ri):
    return jax.lax.complex(h_ri[..., 0], h_ri[..., 1])


def _reg_residual(h_ri, reg_k):
    """Full linear convolution of the filter spectrum with the (real,
    symmetric) regularization kernel — the spatial-regularization residual
    (optim.py:51-69 in full-spectrum form; the plain sum of squares over
    the full conv output equals the reference's padded-half-spectrum
    accounting by conjugate symmetry; the kernel's static zero padding
    only adds zero border rows)."""
    C, F = h_ri.shape[0], h_ri.shape[1]
    R0, R1 = reg_k.shape
    x = h_ri.transpose(0, 3, 1, 2).reshape(C * 2, F, F, 1)
    k = reg_k[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(R0 - 1, R0 - 1), (R1 - 1, R1 - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _apply_filter_spectrum(X, h_ri):
    """sum_c h_c * X_c (eco.py apply_filter): X (n, c, F, F) complex,
    h (c, F, F, 2) real -> (n, F, F) complex."""
    return jnp.einsum("ncyx,cyx->nyx", X, _cplx(h_ri))


def _joint_residuals_block(rt: ECORuntime, hp, X, yf, sw, reg_k):
    """FactorizedConvProblem residuals for ONE block (optim.py:34-74):
    data term + filter spatial regularization + projection regularization,
    all real-valued so ops/optimization's GN-CG drives them directly. The
    reference's ip_input pairs (filter_b, P_b) under one per-block scalar
    (optim.py:77-91 concat structure) and never couples the blocks, so
    the joint solve is two independent GN-CG problems."""
    h, P = hp
    comp = jnp.einsum("ndyx,dc->ncyx", X, P.astype(jnp.complex64))
    r = _apply_filter_spectrum(comp, h) - yf[None]
    return {"data": _ri(jnp.sqrt(sw)[:, None, None] * r),
            "reg": _reg_residual(h, reg_k),
            "proj": np.sqrt(rt.projection_reg) * P}


def _filter_residuals_block(rt: ECORuntime, h, mem, yf, sw, reg_k):
    """FilterOptim's quadratic for ONE feature block (optim.py:142-200):
    data over the compressed sample memory + spatial regularization. The
    blocks never couple (per-entry TensorList scalars in the reference's
    CG), so each is its own least-squares problem."""
    r = _apply_filter_spectrum(mem, h) - yf[None]
    return {"data": _ri(jnp.sqrt(sw)[:, None, None] * r),
            "reg": _reg_residual(h, reg_k)}


def _filter_precond(rt: ECORuntime, sample_energy, reg_energy):
    """The reference's diagonal preconditioner M1 (optim.py:25-28,157-158):
    divide each filter coefficient by the blended data/reg energy."""
    diags = []
    for b in range(rt.n_blocks):
        se = sample_energy[b]
        diag = (1 - rt.precond_reg_param) * (
            rt.precond_data_param * se
            + (1 - rt.precond_data_param) * se.mean(axis=0, keepdims=True)
        ) + rt.precond_reg_param * reg_energy[b]
        diags.append(diag[..., None])
    return diags


def pca_projection(feat, cdim: int):
    """PCA init of the projection matrix (eco.py:109-113): top-cdim
    eigenvectors of the channel covariance of the (mean-centered) spatial
    features; jnp.linalg.eigh replaces torch.svd (same subspace)."""
    d = feat.shape[-1]
    mat = feat.reshape(-1, d)
    mat = mat - mat.mean(axis=0, keepdims=True)
    cov = mat.T @ mat
    _, vecs = jnp.linalg.eigh(cov)          # ascending eigenvalues
    return vecs[:, ::-1][:, :cdim]


def eco_init_state(rt: ECORuntime, model, st: ECOGeom, params, consts: dict,
                   frame: jnp.ndarray, init_box_xywh: jnp.ndarray) -> dict:
    """First-frame optimization (eco.py initialize)."""
    from mmtrack_tpu.ops.augment import dimp_init_augmentations, feature_dropout

    S = st.sample_sz
    x0, y0, w, h = init_box_xywh
    pos = jnp.stack([y0 + (h - 1) / 2, x0 + (w - 1) / 2])
    target_scale = consts["target_scale"]
    base_target_sz = consts["base_target_sz"]

    rng = jax.random.PRNGKey(0)
    rng, rng_d0, rng_d1 = jax.random.split(rng, 3)

    # expanded 2S crop -> the 23-sample augmentation set; ECO's shift augs
    # are absolute pixels, expressed here relative to the S/2 half-side
    expanded = _crop(frame, pos, 2.0 * S * target_scale, 2 * S)
    rel_shifts = tuple((sy / (S / 2), sx / (S / 2)) for sy, sx in rt.aug_shifts)
    patches, shifts = dimp_init_augmentations(
        expanded, S, rng, random_shift_factor=0.0,
        relative_shifts=rel_shifts, blur_sigmas=rt.aug_blur,
        rotate_angles=rt.aug_rotate)

    feats = _extract_features(model, params, patches, rt.blocks)
    # feature-space dropout copies of the identity sample (both blocks use
    # augmentation; default.py:62-66 + eco.py:330-334)
    feats = tuple(
        jnp.concatenate([f, feature_dropout(f[0], rd, rt.aug_dropout_num,
                                            rt.aug_dropout_prob)], axis=0)
        for f, rd in zip(feats, (rng_d0, rng_d1)))
    N = feats[0].shape[0]
    all_shifts = jnp.concatenate(
        [shifts, jnp.zeros((rt.aug_dropout_num, 2), jnp.float32)], axis=0)

    P_init = tuple(pca_projection(f, c)
                   for f, c in zip(feats, rt.compressed_dims))

    # full (uncompressed) training spectra; compensate the augmentation
    # shifts (eco.py:119-125) and the global sub-pixel shift (:127-129)
    sub_px = 2 * jnp.pi * (pos - jnp.round(pos)) / (target_scale * S)
    X_full = []
    for b in range(rt.n_blocks):
        X = _to_spectrum(feats[b], consts["windows"][b], consts["interp"][b])
        shift = 2 * jnp.pi * all_shifts / S + sub_px[None]
        X_full.append(shift_spectrum(X, shift[:, None, :]))
    X_full = tuple(X_full)

    # sample energy with the PCA projection (optim.py:17-18): FilterOptim
    # inherits this as its preconditioner seed (eco.py:168)
    sample_energy = tuple(
        jnp.mean(jnp.abs(jnp.einsum("ndyx,dc->ncyx", X,
                                    P.astype(jnp.complex64))) ** 2, axis=0)
        for X, P in zip(X_full, P_init))

    sw = jnp.full((N,), 1.0 / N)
    h0 = tuple(jnp.zeros((c, F, F, 2), jnp.float32)
               for c, F in zip(rt.compressed_dims, st.filt_sz))

    # joint preconditioner: filter part from the PCA-projected energy,
    # projection part from the label energy (optim.py:21-31)
    diags = _filter_precond(rt, sample_energy, consts["reg_energy"])
    proj_diag = tuple(
        rt.precond_proj_param *
        (2 * jnp.sum(consts["yf"][b] ** 2) / rt.feat_dims[b]
         + rt.projection_reg)
        for b in range(rt.n_blocks))

    cg_per_gn = max(rt.init_cg_iter // max(rt.init_gn_iter, 1), 1)
    hs, Ps = [], []
    for b in range(rt.n_blocks):
        diag, pdiag = diags[b], proj_diag[b]
        h_b, P_b = gauss_newton_cg(
            partial(_joint_residuals_block, rt, X=X_full[b],
                    yf=consts["yf"][b], sw=sw, reg_k=consts["reg"][b]),
            (h0[b], P_init[b]), rt.init_gn_iter, cg_per_gn,
            precond=lambda hp: (hp[0] / diag, hp[1] / pdiag))
        hs.append(h_b)
        Ps.append(P_b)
    hs = tuple(_ri(conj_symmetrize(_cplx(hh))) for hh in hs)
    Ps = tuple(Ps)

    # compressed sample memory with the OPTIMIZED projection (eco.py:160-163)
    M = rt.sample_memory_size
    memory, sws = [], []
    for b in range(rt.n_blocks):
        comp = jnp.einsum("ndyx,dc->ncyx", X_full[b],
                          Ps[b].astype(jnp.complex64))
        memory.append(jnp.zeros((M,) + comp.shape[1:],
                                jnp.complex64).at[:N].set(comp))
        sws.append(jnp.zeros((M,), jnp.float32).at[:N].set(1.0 / N))

    return {
        "pos": pos,
        "target_scale": jnp.asarray(target_scale, jnp.float32),
        "target_sz": base_target_sz * target_scale,
        "base_target_sz": base_target_sz,
        "filters": hs, "projections": Ps,
        "memory": tuple(memory), "sample_weights": tuple(sws),
        "prev_replace_ind": (jnp.int32(-1), jnp.int32(-1)),
        "num_stored": jnp.int32(N),
        "sample_energy": sample_energy,
        "frame_num": jnp.int32(1),
        # carried conjugate direction of the ONLINE FilterOptim; fresh at
        # init: with update_projection_matrix the reference runs no
        # filter-only CG in initialize (post_init_CG_iter=0, eco.py:170-175).
        # One state PER BLOCK (the reference's TensorList-entry scalars)
        "cg_state": tuple(cg_state_init(h) for h in hs),
    }


def _update_weights_eco(rt: ECORuntime, sw, prev_ind, num_stored, lr):
    """ECO's min-weight replacement (eco.py:346-370) — unlike DiMP/ATOM
    there is no protected init-sample mass."""
    slot = jnp.arange(rt.sample_memory_size)
    cand = jnp.where(slot < num_stored, sw, jnp.inf)
    r_ind = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num_stored < rt.sample_memory_size,
                      num_stored, r_ind)

    first = prev_ind < 0
    sw1 = jnp.where(first, sw / (1 - lr), sw)
    new_w = jnp.where(first, lr, sw1[jnp.maximum(prev_ind, 0)] / (1 - lr))
    sw1 = sw1.at[r_ind].set(new_w)
    return sw1 / sw1.sum(), r_ind


def _update_weights_ccot(rt: ECORuntime, sw, prev_ind, num_stored, lr):
    """C-COT's min-weight replacement (ccot.py:178-196): the steady-state
    branch matches ECO's (sw[new] = sw[prev] / (1 - lr), renormalize), but
    the SECOND sample is set explicitly to {prev: 1-lr, new: lr} — ECO's
    rescale-then-normalize form gives a slightly different split there.
    Init (num_stored == 0) seeds slot 0 with weight 1 in ccot_init_state,
    so only num_stored >= 1 reaches here."""
    slot = jnp.arange(rt.sample_memory_size)
    cand = jnp.where(slot < num_stored, sw, jnp.inf)
    r_ind = jnp.argmin(cand).astype(jnp.int32)
    r_ind = jnp.where(num_stored < rt.sample_memory_size, num_stored, r_ind)

    second = num_stored == 1
    base = jnp.where(second, sw.at[prev_ind].set(1 - lr), sw)
    new_w = jnp.where(second, lr, sw[prev_ind] / (1 - lr))
    sw1 = base.at[r_ind].set(new_w)
    return sw1 / sw1.sum(), r_ind


def eco_track_step(rt: ECORuntime, model, st: ECOGeom, params, consts: dict,
                   state: dict, frame: jnp.ndarray):
    """One tracked frame (eco.py track())."""
    S = st.sample_sz
    sample_scales = state["target_scale"] * jnp.asarray(rt.scale_factors)
    patches = jnp.stack([
        _crop(frame, state["pos"], sample_scales[i] * S, S)
        for i in range(rt.num_scales)])
    return eco_step_from_patches(rt, model, st, params, consts, state,
                                 patches, (frame.shape[0], frame.shape[1]))


def eco_step_from_patches(rt: ECORuntime, model, st: ECOGeom, params,
                          consts: dict, state: dict, patches: jnp.ndarray,
                          img_hw):
    """The post-crop step body, on (num_scales, S, S, 3) patches in
    [0, 255]. Split out so the trajectory A/B can feed the reference's own
    sample_patch outputs (tools/parity/check_trajectory_eco.py)."""
    S = st.sample_sz
    H, W = img_hw
    state = {**state, "frame_num": state["frame_num"] + 1}

    sample_pos = jnp.round(state["pos"])
    sfac = jnp.asarray(rt.scale_factors)
    sample_scales = state["target_scale"] * sfac

    feats = _extract_features(model, params, patches, rt.blocks)

    # project spatially, then window/fft/interp (eco.py:293-309);
    # CCOT keeps the full channel dimension (no projection)
    test_X = tuple(
        _to_spectrum(feats[b] @ state["projections"][b]
                     if rt.use_projection else feats[b],
                     consts["windows"][b], consts["interp"][b])
        for b in range(rt.n_blocks))

    # weightedsum score fusion on the common (shallow) grid (eco.py:247-252)
    F_out = max(st.filt_sz)
    sf = jnp.zeros((rt.num_scales, F_out, F_out), jnp.complex64)
    for b in range(rt.n_blocks):
        resp = _apply_filter_spectrum(test_X[b], state["filters"][b])
        sf = sf + embed_spectrum(rt.translation_weights[b] * resp, F_out)
    scores = sample_scores(sf, S)               # output_sz = img_support_sz

    max_vals, disp = max2d_wrapped(scores)
    scale_ind = jnp.argmax(max_vals)
    max_score = max_vals[scale_ind]
    translation = disp[scale_ind] * state["target_scale"] * sfac[scale_ind]

    # update position and scale (eco.py:202-203, 372-380)
    min_sf = jnp.max(10.0 / state["base_target_sz"])
    max_sf = jnp.min(jnp.asarray([H, W], jnp.float32)
                     / state["base_target_sz"])
    new_scale = jnp.clip(state["target_scale"] * sfac[scale_ind],
                         min_sf, max_sf)
    target_sz = state["base_target_sz"] * new_scale
    new_pos = sample_pos + translation
    inside_offset = (rt.target_inside_ratio - 0.5) * target_sz
    img_sz = jnp.asarray([H, W], jnp.float32)
    new_pos = jnp.maximum(jnp.minimum(new_pos, img_sz - inside_offset),
                          inside_offset)
    state = {**state, "pos": new_pos, "target_scale": new_scale,
             "target_sz": target_sz}

    # train sample: the winning scale, re-centered on the new position
    # (eco.py:222-227), into the per-block memory (:229-230, 339-343)
    shift = 2 * jnp.pi * (new_pos - sample_pos) / (sample_scales[scale_ind] * S)
    mem_new, sw_new, prev_new, se_new = [], [], [], []
    for b in range(rt.n_blocks):
        xf = shift_spectrum(test_X[b][scale_ind], shift[None])
        update_w = (_update_weights_ccot if rt.ccot_weight_update
                    else _update_weights_eco)
        sw1, r_ind = update_w(
            rt, state["sample_weights"][b], state["prev_replace_ind"][b],
            state["num_stored"], rt.learning_rates[b])
        mem_new.append(state["memory"][b].at[r_ind].set(xf))
        sw_new.append(sw1)
        prev_new.append(r_ind)
        # precond energy EMA advances on training frames only
        # (optim.py:146-151); computed here, committed by the cond below
        se_new.append(
            (1 - rt.learning_rates[b]) * state["sample_energy"][b]
            + rt.learning_rates[b] * jnp.abs(xf) ** 2)
    state = {**state, "memory": tuple(mem_new),
             "sample_weights": tuple(sw_new),
             "prev_replace_ind": tuple(prev_new),
             "num_stored": jnp.minimum(state["num_stored"] + 1,
                                       rt.sample_memory_size)}

    # periodic filter-only optimization (eco.py:232-235); CCOT trains
    # unconditionally every frame (ccot.py:150)
    do_train = jnp.asarray(True) if rt.train_every_frame \
        else (state["frame_num"] % rt.train_skipping) == 1

    def run_cg(operand):
        hs, se, cgs = operand
        diags = _filter_precond(rt, se, consts["reg_energy"])

        # FilterOptim (optim.py:144-208): the residuals are linear in the
        # filter, so one linearization gives the exact normal equations;
        # CG runs with Polak-Ribiere beta and the conjugate direction
        # carried from the previous optimization, decayed by the
        # direction forget factor (run_CG entry, optimization.py:135-138).
        # The reference's ip is the per-TensorList-entry inner_prod_fs, so
        # rho/alpha/beta are SEPARATE scalars per feature block — the two
        # blocks are independent CG problems solved in lockstep, not one
        # joint Krylov space; mirror that with a per-block solve.
        new_hs, new_cgs = [], []
        for b in range(rt.n_blocks):
            res_fn = partial(_filter_residuals_block, rt,
                             mem=state["memory"][b], yf=consts["yf"][b],
                             sw=state["sample_weights"][b],
                             reg_k=consts["reg"][b])
            r0, jvp_fn = jax.linearize(res_fn, hs[b])
            _, vjp_fn = jax.vjp(res_fn, hs[b])
            rhs = jax.tree.map(lambda g: -g, vjp_fn(r0)[0])
            diag = diags[b]
            dx, cg_b = conjugate_gradient_stateful(
                lambda u: vjp_fn(jvp_fn(u))[0], rhs,
                jnp.zeros_like(hs[b]), rt.cg_iter, cgs[b],
                precond=lambda x: x / diag,
                fletcher_reeves=rt.fletcher_reeves,
                direction_forget_factor=rt.direction_forget_factor)
            new_hs.append(_ri(conj_symmetrize(_cplx(hs[b] + dx))))
            new_cgs.append(cg_b)
        return (tuple(new_hs), se, tuple(new_cgs))

    new_filters, new_se, new_cgs = jax.lax.cond(
        do_train, run_cg,
        # the EMA only advances when FilterOptim.run actually executes
        # with a new sample (optim.py:146-151) — on skipped frames the
        # stored energy is untouched
        lambda op: (op[0], state["sample_energy"], op[2]),
        (state["filters"], tuple(se_new), state["cg_state"]))
    state = {**state, "filters": new_filters, "sample_energy": new_se,
             "cg_state": new_cgs}

    box = jnp.concatenate([
        (state["pos"] - (state["target_sz"] - 1) / 2)[::-1],
        state["target_sz"][::-1],
    ])
    return state, box, max_score


class ECOTracker:
    """OO facade (BaseTracker API). Per-sequence geometry is computed on
    the host; jitted functions specialize per static geometry (sample
    size 208/240 for the default search-area bounds)."""

    def __init__(self, model: ResNetVGGm1, params,
                 runtime: ECORuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or ECORuntime()
        self._fns = {}
        self.state = None
        self.geom = None
        self.consts = None

    def _get_fns(self, st: ECOGeom, reg_shapes):
        key = (st, reg_shapes)
        if key not in self._fns:
            self._fns[key] = (
                jax.jit(partial(eco_init_state, self.rt, self.model, st)),
                jax.jit(partial(eco_track_step, self.rt, self.model, st)),
            )
        return self._fns[key]

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = np.asarray(info["init_bbox"], np.float32)
        self.geom, self.consts = eco_geometry(self.rt, (box[3], box[2]))
        reg_shapes = tuple(r.shape for r in self.consts["reg"])
        init_fn, _ = self._get_fns(self.geom, reg_shapes)
        self.state = init_fn(self.params, self.consts, jnp.asarray(image),
                             jnp.asarray(box))

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        reg_shapes = tuple(r.shape for r in self.consts["reg"])
        _, step_fn = self._get_fns(self.geom, reg_shapes)
        self.state, box, score = step_fn(self.params, self.consts, self.state,
                                         jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
