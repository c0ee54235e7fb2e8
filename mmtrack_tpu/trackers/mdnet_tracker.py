"""MDNet online tracking protocol — candidate scoring with on-device fc
fine-tuning and hard-minibatch mining.

Rebuild of RGBE/models/pyMDNet/tracking/run_tracker.py:24-117 with the
canonical constants of tracking/options.yaml (same set in APFNet
tracking/option.py:16-64): 107^2 input, 256 candidates (trans 0.6 -> 1.5 on
failure, scale 1.05), init training 50 iters lr 5e-4 on 500 pos / 5000 neg,
online updates 15 iters lr 1e-3 on ring buffers of 50 pos x 100 frames and
200 neg x 30 frames (short-term window 20 on failure, long-term every 10
frames), hard negative mining 96-of-1024, ridge bbox regression on 1000 init
samples.

TPU-first: candidate crops are one vmapped bilinear gather; the SGD(momentum)
fine-tuning loop, the miner, memory ring buffers and the ridge solve all run
inside jit; per-frame branching (success / update cadence) is masked state
arithmetic, so a whole sequence is a scan over one compiled step.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.mdnet import MDNet


@dataclass(frozen=True)
class MDNetRuntime:
    img_size: int = 107
    padding: int = 16
    batch_test: int = 256
    n_samples: int = 256             # per-frame candidates (MANet: 512)
    trans: float = 0.6
    trans_f_expand: float = 1.5
    scale_f: float = 1.05
    n_init_pos: int = 500
    n_init_neg: int = 5000           # pyMDNet tracking/options.yaml (500/5000)
    extract_chunk: int = 512         # patch batches >chunk embed via lax.map
    overlap_pos: tuple = (0.7, 1.0)
    overlap_neg: tuple = (0.0, 0.5)
    init_iters: int = 50
    update_iters: int = 15
    lr_init: float = 5e-4
    lr_update: float = 1e-3
    lr_mult_fc6: float = 10.0
    momentum: float = 0.9
    weight_decay: float = 5e-4
    batch_pos: int = 32
    batch_neg: int = 96
    batch_neg_cand: int = 1024
    grad_clip: float = 10.0          # options.yaml:60, torch clip_grad_norm_
    # training-example sampling (options.yaml:24-29)
    trans_pos: float = 0.1
    scale_pos: float = 1.3
    trans_neg_init: float = 1.0
    scale_neg_init: float = 1.6
    trans_neg: float = 2.0
    scale_neg: float = 1.3
    n_pos_update: int = 50
    n_neg_update: int = 200
    n_frames_long: int = 100
    n_frames_short: int = 30         # options.yaml:56 (RGBE fork; classic 20)
    long_interval: int = 10
    n_bbreg: int = 1000
    trans_bbreg: float = 0.3
    scale_bbreg: float = 1.6
    aspect_bbreg: float = 1.1
    bbreg_scale_range: tuple = (1.0, 2.0)   # bbreg.py:9 scale=[1,2] filter
    bbreg_overlap: tuple = (0.6, 1.0)
    bbreg_lambda: float = 1000.0
    success_thr: float = 0.0
    topk: int = 5
    # VITAL adversarial masking (pyVITAL run_tracker.py train():83-151 +
    # g_pretrain at init): the GNet proposes (3,3) feature drop masks; the
    # classifier trains on masked positives, G trains to minimize the
    # classifier's positive score.
    # MANet failure semantics (RGBE/models/MANet/tracking/run_tracker.py):
    # the reported AND sampling boxes revert to the previous frame's result
    # at failure (:252-256), and the candidate spread is hard-set to
    # trans_f_expand (:239) instead of pyMDNet's gradual 1.1x expand walk.
    revert_on_failure: bool = False
    hard_trans_expand: bool = False
    # MANet's BinaryLoss is the raw SUM of per-sample BCE terms
    # (MANet3x1x1_IC.py:308-317) where pyMDNet's BCELoss divides by the
    # combined count (model.py:162-170) — with grad_clip at 10 the sum
    # saturates the clip nearly every step, so the two are NOT equivalent.
    loss_sum: bool = False
    # pyVITAL's BCELoss is focal-style with gamma=1 — (1-p) * (-log p) per
    # sample on both the target and background terms, combined-count mean
    # (pyVITAL modules/model.py:159-171) — used for its init AND online
    # updates, not just the adversarial phase.
    loss_focal: bool = False
    # MANet seeds the update memories with the FIRST n_pos_update /
    # n_neg_update rows of the init training sets (run_tracker.py:180-181:
    # pos_feats_all = [pos_feats[:50]]) — pyMDNet keeps the full 500-row
    # init entry and draws a fresh 200-negative update set.
    manet_seed_memory: bool = False
    # MANet's BBRegressor.predict (tracking/bbreg.py:35-55) REVERTS refined
    # boxes whose overlap/scale vs the pre-refine box falls outside the
    # trainer's filter ranges, then clamps; pyMDNet's predict only clamps.
    bbreg_reject: bool = False
    vital: bool = False
    vital_drop_cells: int = 3      # lowest-G cells dropped (lines 113-127)
    vital_feat_hw: int = 3
    vital_feat_dim: int = 512
    g_pretrain_iters: int = 20     # g_pretrain.py supervised warmup
    g_update_iters: int = 2        # G SGD steps per classifier update
    lr_g: float = 1e-3


# ---------------------------------------------------------------- sampling

def _finish_samples(centers, wh, img_hw):
    """SampleGenerator._gen_samples tail (sample_generator.py:46-56,
    valid=False as every tracking-time generator is constructed): clip wh
    to [10, img-10] per axis, clip CENTERS to [0, img], convert to xywh."""
    H, W = img_hw
    img = jnp.asarray([W, H], jnp.float32)
    wh = jnp.clip(wh, 10.0, img - 10.0)
    centers = jnp.clip(centers, 0.0, img)
    return jnp.concatenate([centers - wh / 2, wh], axis=1)


def _aspect_wh(rng, w, h, n, aspect):
    """Aspect-ratio jitter applied BEFORE trans/scale
    (sample_generator.py:25-28)."""
    wh = jnp.stack([w, h]) * jnp.ones((n, 2))
    if aspect is None:
        return wh
    return wh * aspect ** (jax.random.uniform(rng, (n, 2)) * 2 - 1)


def _gaussian_boxes(rng, box, n, trans, scale, img_hw, aspect=None):
    """SampleGenerator('gaussian') analog (pyMDNet modules/sample_generator
    .py:30-33): center jitter trans*mean(wh)*clip(0.5*randn,-1,1), scale
    jitter scale**clip(0.5*randn,-1,1)."""
    x, y, w, h = box[0], box[1], box[2], box[3]
    c = jnp.stack([x + w / 2, y + h / 2])
    r1, r2, r3 = jax.random.split(rng, 3)
    m = jnp.mean(jnp.stack([w, h]))
    wh = _aspect_wh(r3, w, h, n, aspect)
    centers = c + trans * m * jnp.clip(
        0.5 * jax.random.normal(r1, (n, 2)), -1.0, 1.0)
    wh = wh * scale ** jnp.clip(0.5 * jax.random.normal(r2, (n, 1)),
                                -1.0, 1.0)
    return _finish_samples(centers, wh, img_hw)


def _uniform_boxes(rng, box, n, trans, scale, img_hw, aspect=None):
    """SampleGenerator('uniform') analog (sample_generator.py:35-37)."""
    x, y, w, h = box[0], box[1], box[2], box[3]
    c = jnp.stack([x + w / 2, y + h / 2])
    r1, r2, r3 = jax.random.split(rng, 3)
    m = jnp.mean(jnp.stack([w, h]))
    wh = _aspect_wh(r3, w, h, n, aspect)
    centers = c + trans * m * (jax.random.uniform(r1, (n, 2)) * 2 - 1)
    wh = wh * scale ** (jax.random.uniform(r2, (n, 1)) * 2 - 1)
    return _finish_samples(centers, wh, img_hw)


def _whole_boxes(rng, box, n, scale, img_hw):
    """SampleGenerator('whole') analog (sample_generator.py:39-44): centers
    on a permuted uniform grid spanning the image, scale jitter only."""
    w, h = box[2], box[3]
    H, W = img_hw
    r1, r2 = jax.random.split(rng)
    m = int(2 * np.sqrt(n))
    lin = jnp.linspace(0.0, 1.0, m)
    gx, gy = jnp.meshgrid(lin, lin)
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)  # (m*m, 2)
    xy = jax.random.permutation(r1, xy)[:n]
    img = jnp.asarray([W, H], jnp.float32)
    centers = jnp.stack([w, h]) / 2 + xy * (img - jnp.stack([w, h]) / 2 - 1)
    wh = jnp.stack([w, h]) * scale ** (jax.random.uniform(r2, (n, 1)) * 2 - 1)
    return _finish_samples(centers, wh, img_hw)


def _iou(a, b):
    x1 = jnp.maximum(a[:, 0], b[0])
    y1 = jnp.maximum(a[:, 1], b[1])
    x2 = jnp.minimum(a[:, 0] + a[:, 2], b[0] + b[2])
    y2 = jnp.minimum(a[:, 1] + a[:, 3], b[1] + b[3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = a[:, 2] * a[:, 3] + b[2] * b[3] - inter
    return inter / jnp.maximum(union, 1e-9)


def _sample_filtered(rng, gen, gt_box, n, iou_range, oversample=4):
    """Draw oversample*n, keep those inside the IoU range, fill n slots
    (replaces the reference's python rejection loop with fixed shapes)."""
    boxes = gen(rng, oversample * n)
    ious = _iou(boxes, gt_box)
    ok = (ious >= iou_range[0]) & (ious <= iou_range[1])
    order = jnp.argsort(~ok)  # valid first, stable
    idx = order[:n]
    picked_ok = ok[idx]
    # fallback: invalid slots get the gt box itself (rare; keeps shapes fixed)
    return jnp.where(picked_ok[:, None], boxes[idx], gt_box[None])


# ---------------------------------------------------------------- features

def _crop_image2_dev(rt: MDNetRuntime, frame, b):
    """Device twin of crop_image2 (pyMDNet modules/utils.py:29-91): the
    padded box (w + 2*padding*w/img_size, likewise h) is warped
    ANISOTROPICALLY onto img_size^2 by cv2.warpPerspective's inverse map
    src = (dst - img_size/2) * (w'/img_size) + cx at INTEGER dst coords,
    bilinear, constant border 128. Float bilinear here vs cv2's 5-bit
    fixed-point + uint8 rounding: sub-LSB deviation (<1 on the 0..255
    scale), checked in tools/parity/check_trajectory_mdnet.py."""
    n = rt.img_size
    x, y, w, h = b[0], b[1], b[2], b[3]
    cx, cy = x + w / 2, y + h / 2
    wp = w + 2 * rt.padding * w / n
    hp = h + 2 * rt.padding * h / n
    d = jnp.arange(n, dtype=jnp.float32) - n / 2.0
    xs = d * (wp / n) + cx
    ys = d * (hp / n) + cy
    H, W = frame.shape[0], frame.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    img = frame.astype(jnp.float32)

    # cv2 quirk reproduced exactly: a SCALAR borderValue=128 becomes
    # Scalar(128,0,0,...) — only channel 0 of each RGB image is padded
    # with 128, the rest with 0 (utils.py:84; verified against cv2).
    # Multi-modal frames are two stacked RGB crops, so the pattern
    # repeats every 3 channels.
    C = frame.shape[-1]
    border = jnp.where(jnp.arange(C) % 3 == 0, 128.0, 0.0)

    def tap(yi, xi):
        inb = (((yi >= 0) & (yi < H))[:, None, None]
               & ((xi >= 0) & (xi < W))[None, :, None])
        v = img[jnp.clip(yi, 0, H - 1)][:, jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, border)

    return ((1 - fy) * (1 - fx) * tap(y0, x0)
            + (1 - fy) * fx * tap(y0, x0 + 1)
            + fy * (1 - fx) * tap(y0 + 1, x0)
            + fy * fx * tap(y0 + 1, x0 + 1))


def _extract_patches(rt: MDNetRuntime, model, params, frame, boxes):
    """Crop each box with 16px context and embed (RegionExtractor analog).

    Batches larger than rt.extract_chunk are embedded chunk-by-chunk via
    lax.map so the 5000-negative init draw (options.yaml) never
    materializes all 107x107 patches + conv activations at once — device
    memory stays bounded without shrinking the hard-negative pool."""
    def one(b):
        patch = _crop_image2_dev(rt, frame, b)
        # reference input convention: raw uint8 float - 128
        # (pyMDNet tracking/data_prov.py:50 and pretrain/data_prov.py:91);
        # the scale matters — LRN sits right after conv1
        return patch - 128.0

    def embed(bs):
        patches = jax.vmap(one)(bs)
        # type(model) keeps the protocol polymorphic over chassis variants
        # (MDNet modes, APFNet, DAFNet, MaCNet share extract_features/score)
        return model.apply(params, patches,
                           method=type(model).extract_features)

    n, chunk = boxes.shape[0], rt.extract_chunk
    if n <= chunk:
        return embed(boxes)
    pad = (-n) % chunk
    padded = boxes if pad == 0 else jnp.concatenate(
        [boxes, jnp.broadcast_to(boxes[:1], (pad, boxes.shape[1]))])
    out = jax.lax.map(embed, padded.reshape(-1, chunk, boxes.shape[1]))
    return out.reshape(n + pad, *out.shape[2:])[:n]


# ---------------------------------------------------------------- fc training

def _score_fn(model, params, fc_params, feats, branch=0, rng=None, train=False):
    merged = {"params": {**params["params"], **fc_params}}
    return model.apply(merged, feats, branch, train, rng,
                       method=type(model).score)


def _vital_drop_mask(rt: MDNetRuntime, gnet, g_params, pos_batch):
    """Per-sample hard drop mask: zero the rt.vital_drop_cells cells with the
    LOWEST GNet response (run_tracker.py:107-133; implemented per sample —
    the reference's python loop overwrote the mask batch-wide)."""
    B = pos_batch.shape[0]
    flat = pos_batch.sum(axis=1)  # streams summed (vis + event, line 109)
    scores = gnet.apply(g_params, flat).reshape(B, -1)
    _, low = jax.lax.top_k(-scores, rt.vital_drop_cells)
    drop = jax.nn.one_hot(low, scores.shape[1]).sum(axis=1)
    return (1.0 - drop).reshape(B, rt.vital_feat_hw, rt.vital_feat_hw)


def _apply_cell_mask(rt: MDNetRuntime, feats, mask):
    """feats (B, streams, D) with D = hw*hw*C (NHWC flatten); mask (B,h,w)."""
    B, S = feats.shape[0], feats.shape[1]
    f = feats.reshape(B, S, rt.vital_feat_hw, rt.vital_feat_hw,
                      rt.vital_feat_dim)
    return (f * mask[:, None, :, :, None]).reshape(B, S, -1)


def _fc_train(rt: MDNetRuntime, model, params, fc_params, momentum,
              pos_feats, pos_valid, neg_feats, neg_valid, n_iter, lr, rng,
              gnet=None, g_state=None, inject_idx=None, dropout=True,
              vital_active=True, inject_masks=None):
    """SGD+momentum fine-tuning with hard-negative mining (pyMDNet train(),
    run_tracker.py:52-117). pos/neg_feats: (Np, S, D)/(Nn, S, D) with
    validity masks; n_iter may be traced (0 = no-op).

    torch-SGD order per step (optim/sgd + run_tracker.py:110-116): data
    gradient -> clip_grad_norm_(grad_clip) -> + weight_decay*param ->
    momentum buffer -> per-group lr (fc6 x lr_mult).

    inject_idx: optional (pos_idx (T, batch_pos), neg_cand_idx
    (T, batch_neg_cand)) arrays replacing the random batch draws — the
    parity harness feeds the reference train()'s own permutation walk;
    dropout=False disables fc dropout (the harness runs both sides
    deterministic). With rt.vital (gnet + g_state given), positives are
    adversarially masked by GNet before the classifier loss, and G takes
    its own SGD steps against the updated classifier afterwards — but ONLY
    when vital_active (a traced bool): the reference engages model_g on
    LONG-TERM updates alone (pyVITAL run_tracker.py:373 passes None on the
    short-term/failure path, :382 passes model_g on the long-term path).
    inject_masks ((T, batch_pos, hw, hw), parity harness) replaces the
    GNet-derived drop masks with the reference's own captured ASDN masks.
    Returns (fc, momentum, rng, g_state)."""
    use_vital = rt.vital and gnet is not None and g_state is not None

    def loss_fn(fc, pos_idx, neg_idx, drop_rng, g_params, iter_mask):
        pf = pos_feats[pos_idx]
        if inject_masks is not None:
            pf = _apply_cell_mask(rt, pf, iter_mask)
        elif use_vital:
            mask = _vital_drop_mask(rt, gnet, g_params, pf)
            mask = jnp.where(vital_active, mask, jnp.ones_like(mask))
            pf = _apply_cell_mask(rt, pf, mask)
        nf = neg_feats[neg_idx]
        r1, r2 = jax.random.split(drop_rng)
        pos_logits = _score_fn(model, params, fc, pf, rng=r1, train=dropout)
        neg_logits = _score_fn(model, params, fc, nf, rng=r2, train=dropout)
        # binary cross-entropy over (bg, target) logits; the reference
        # BCELoss normalizes by the COMBINED count (model.py:162-170:
        # (pos.sum()+neg.sum())/(Npos+Nneg)) — per-set means would weight
        # each positive 3x a negative at the canonical 32/96 batch
        pos_lp = -jax.nn.log_softmax(pos_logits)[:, 1]
        neg_lp = -jax.nn.log_softmax(neg_logits)[:, 0]
        if rt.loss_focal:   # pyVITAL: (1-p) * (-log p), gamma-1 focal
            pos_lp = (1.0 - jax.nn.softmax(pos_logits)[:, 1]) * pos_lp
            neg_lp = (1.0 - jax.nn.softmax(neg_logits)[:, 0]) * neg_lp
        pos_l, neg_l = pos_lp.sum(), neg_lp.sum()
        if rt.loss_sum:   # MANet BinaryLoss: raw sum, no normalization
            return pos_l + neg_l
        n = pos_logits.shape[0] + neg_logits.shape[0]
        return (pos_l + neg_l) / n

    def lr_tree(fc):
        return jax.tree.map_with_path(
            lambda path, _: lr * (rt.lr_mult_fc6 if "fc6" in str(path[0]) else 1.0),
            fc)

    def body(i, carry):
        fc, mom, rng, g_st = carry
        rng, r_pos, r_neg, r_mine, r_drop = jax.random.split(rng, 5)
        if inject_idx is not None:
            pos_idx = inject_idx[0][i]
            cand_idx = inject_idx[1][i]
        else:
            pos_p = pos_valid / jnp.maximum(pos_valid.sum(), 1)
            pos_idx = jax.random.choice(r_pos, pos_feats.shape[0],
                                        (rt.batch_pos,), p=pos_p)
            neg_p = neg_valid / jnp.maximum(neg_valid.sum(), 1)
            cand_idx = jax.random.choice(r_mine, neg_feats.shape[0],
                                         (rt.batch_neg_cand,), p=neg_p)
        # hard mining: score the candidate pool, keep the top batch_neg
        cand_scores = _score_fn(model, params, fc, neg_feats[cand_idx])[:, 1]
        _, top = jax.lax.top_k(cand_scores, rt.batch_neg)
        neg_idx = cand_idx[top]

        g_params = g_st["g"] if use_vital else None
        iter_mask = inject_masks[i] if inject_masks is not None else None
        grads = jax.grad(loss_fn)(fc, pos_idx, neg_idx, r_drop, g_params,
                                  iter_mask)
        # clip_grad_norm_ over the data gradient, THEN weight decay — the
        # torch order (run_tracker.py:115 clips before optimizer.step,
        # which adds wd inside)
        gnorm = jnp.sqrt(sum((g ** 2).sum() for g in jax.tree.leaves(grads)))
        clip = jnp.minimum(1.0, rt.grad_clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * clip, grads)
        grads = jax.tree.map(lambda g, p: g + rt.weight_decay * p,
                             grads, fc)
        lrs = lr_tree(fc)
        mom = jax.tree.map(lambda m, g: rt.momentum * m + g, mom, grads)
        fc = jax.tree.map(lambda p, m, l: p - l * m, fc, mom, lrs)
        return fc, mom, rng, g_st

    if g_state is None:
        g_state = {}
    fc_params, momentum, rng, g_state = jax.lax.fori_loop(
        0, n_iter, body, (fc_params, momentum, rng, g_state))

    if use_vital:
        # adversarial G step against the updated classifier
        # (run_tracker.py:181-191): minimize positive score under G's mask
        def g_objective(g_params, pos_idx):
            pf = pos_feats[pos_idx]
            flat = pf.sum(axis=1)
            mask = gnet.apply(g_params, flat)
            masked = jax.vmap(
                lambda f, m: _apply_cell_mask(rt, f[None], m[None])[0]
            )(pf, mask)
            return _score_fn(model, params, fc_params, masked)[:, 1].mean()

        def g_body(i, carry):
            g_st, rng = carry
            rng, r = jax.random.split(rng)
            pos_p = pos_valid / jnp.maximum(pos_valid.sum(), 1)
            idx = jax.random.choice(r, pos_feats.shape[0], (rt.batch_pos,),
                                    p=pos_p)
            grads = jax.grad(g_objective)(g_st["g"], idx)
            g_mom = jax.tree.map(lambda m, g: rt.momentum * m + g,
                                 g_st["g_mom"], grads)
            g = jax.tree.map(lambda p, m: p - rt.lr_g * m, g_st["g"], g_mom)
            return {"g": g, "g_mom": g_mom}, rng

        # G only steps on long-term updates (run_tracker.py:382)
        g_iters = jnp.where((n_iter > 0) & jnp.asarray(vital_active),
                            rt.g_update_iters, 0)
        g_state, rng = jax.lax.fori_loop(0, g_iters, g_body, (g_state, rng))

    return fc_params, momentum, rng, g_state


# ---------------------------------------------------------------- bbox regression

def _bbreg_targets(boxes, gt):
    cx = boxes[:, 0] + boxes[:, 2] / 2
    cy = boxes[:, 1] + boxes[:, 3] / 2
    gcx, gcy = gt[0] + gt[2] / 2, gt[1] + gt[3] / 2
    return jnp.stack([
        (gcx - cx) / boxes[:, 2],
        (gcy - cy) / boxes[:, 3],
        jnp.log(gt[2] / boxes[:, 2]),
        jnp.log(gt[3] / boxes[:, 3]),
    ], axis=1)


def _bbreg_apply(boxes, deltas, img_hw):
    """BBRegressor.predict (bbreg.py:35-48) incl. its clamps: xy >= 0 and
    wh <= img - OLD top-left."""
    cx = boxes[:, 0] + boxes[:, 2] / 2 + deltas[:, 0] * boxes[:, 2]
    cy = boxes[:, 1] + boxes[:, 3] / 2 + deltas[:, 1] * boxes[:, 3]
    w = boxes[:, 2] * jnp.exp(deltas[:, 2])
    h = boxes[:, 3] * jnp.exp(deltas[:, 3])
    H, W = img_hw
    x = jnp.maximum(cx - w / 2, 0.0)
    y = jnp.maximum(cy - h / 2, 0.0)
    w = jnp.minimum(w, W - boxes[:, 0])
    h = jnp.minimum(h, H - boxes[:, 1])
    return jnp.stack([x, y, w, h], axis=1)


def _bbreg_apply_manet(rt, boxes, deltas, img_hw):
    """MANet BBRegressor.predict (MANet tracking/bbreg.py:35-55): refine
    WITHOUT clamps, revert any box whose IoU with the pre-refine box leaves
    rt.bbreg_overlap or whose (old area / new area) ratio leaves
    rt.bbreg_scale_range, then clamp xy >= 0 and wh <= img - OLD top-left."""
    cx = boxes[:, 0] + boxes[:, 2] / 2 + deltas[:, 0] * boxes[:, 2]
    cy = boxes[:, 1] + boxes[:, 3] / 2 + deltas[:, 1] * boxes[:, 3]
    w = boxes[:, 2] * jnp.exp(deltas[:, 2])
    h = boxes[:, 3] * jnp.exp(deltas[:, 3])
    ref = jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=1)
    x1 = jnp.maximum(boxes[:, 0], ref[:, 0])
    y1 = jnp.maximum(boxes[:, 1], ref[:, 1])
    x2 = jnp.minimum(boxes[:, 0] + boxes[:, 2], ref[:, 0] + ref[:, 2])
    y2 = jnp.minimum(boxes[:, 1] + boxes[:, 3], ref[:, 1] + ref[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = boxes[:, 2] * boxes[:, 3] + ref[:, 2] * ref[:, 3] - inter
    r = inter / jnp.maximum(union, 1e-9)
    s = (boxes[:, 2] * boxes[:, 3]) / jnp.maximum(ref[:, 2] * ref[:, 3], 1e-9)
    keep = ((r >= rt.bbreg_overlap[0]) & (r <= rt.bbreg_overlap[1])
            & (s >= rt.bbreg_scale_range[0]) & (s <= rt.bbreg_scale_range[1]))
    out = jnp.where(keep[:, None], ref, boxes)
    H, W = img_hw
    xy = jnp.maximum(out[:, :2], 0.0)
    wh = jnp.minimum(out[:, 2:], jnp.stack(
        [W - boxes[:, 0], H - boxes[:, 1]], axis=1))
    return jnp.concatenate([xy, wh], axis=1)


def _ridge_fit(X, Y, lam, valid=None):
    """Centered dual ridge == sklearn Ridge(alpha=lam) with its default
    fit_intercept=True (bbreg.py:14): fit on mean-centered X/Y, predict
    (q - mu_x) @ Xc^T @ A + mu_y. `valid` masks filtered-out samples
    (zero weight in the means and a masked kernel row/col)."""
    if valid is None:
        valid = jnp.ones(X.shape[0])
    nv = jnp.maximum(valid.sum(), 1.0)
    mu_x = (X * valid[:, None]).sum(0) / nv
    mu_y = (Y * valid[:, None]).sum(0) / nv
    Xc = (X - mu_x) * valid[:, None]
    Yc = (Y - mu_y) * valid[:, None]
    K = Xc @ Xc.T
    # masked-out rows contribute identity rows -> alpha rows solve to 0
    # against Yc's zero rows
    A = jnp.linalg.solve(K + lam * jnp.eye(X.shape[0]), Yc)
    return A, Xc, mu_x, mu_y


# ---------------------------------------------------------------- runtime

def mdnet_init_state(rt: MDNetRuntime, model: MDNet, params, frame,
                     init_box, rng, gnet=None) -> dict:
    H, W = frame.shape[0], frame.shape[1]
    img_hw = (H, W)
    rngs = jax.random.split(rng, 8)

    pos_boxes = _sample_filtered(
        rngs[0], lambda r, n: _gaussian_boxes(r, init_box, n, rt.trans_pos,
                                              rt.scale_pos, img_hw),
        init_box, rt.n_init_pos, rt.overlap_pos)
    # init negatives: half uniform, half whole-image grid
    # (run_tracker.py:150-154)
    r_nu, r_nw = jax.random.split(rngs[1])
    neg_boxes = jnp.concatenate([
        _sample_filtered(
            r_nu, lambda r, n: _uniform_boxes(r, init_box, n,
                                              rt.trans_neg_init,
                                              rt.scale_neg_init, img_hw),
            init_box, rt.n_init_neg // 2, rt.overlap_neg),
        _sample_filtered(
            r_nw, lambda r, n: _whole_boxes(r, init_box, n, 1.0, img_hw),
            init_box, rt.n_init_neg - rt.n_init_neg // 2, rt.overlap_neg),
    ])

    pos_feats = _extract_patches(rt, model, params, frame, pos_boxes)
    neg_feats = _extract_patches(rt, model, params, frame, neg_boxes)
    S, D = pos_feats.shape[1], pos_feats.shape[2]

    fc_params = {k: params["params"][k] for k in params["params"]
                 if k.startswith("fc")}
    momentum = jax.tree.map(jnp.zeros_like, fc_params)
    fc_params, momentum, _, _ = _fc_train(
        rt, model, params, fc_params, momentum,
        pos_feats, jnp.ones(rt.n_init_pos), neg_feats, jnp.ones(rt.n_init_neg),
        rt.init_iters, rt.lr_init, rngs[2])
    # the reference's update_optimizer is a SEPARATE torch SGD from
    # init_optimizer (run_tracker.py:139-141): online updates start with
    # fresh momentum buffers, not the init optimizer's
    momentum = jax.tree.map(jnp.zeros_like, momentum)

    g_state = {}
    if rt.vital and gnet is not None:
        # g_pretrain (pyVITAL g_pretrain.py + run_tracker.py:251): supervised
        # warmup — G learns to flag the cells whose removal hurts the freshly
        # trained classifier most (lowest output at the most damaging cells).
        n_cells = rt.vital_feat_hw * rt.vital_feat_hw
        g_params = gnet.init(rngs[5], jnp.zeros(
            (1, n_cells * rt.vital_feat_dim)))
        g_mom = jax.tree.map(jnp.zeros_like, g_params)
        one_cell = 1.0 - jnp.eye(n_cells).reshape(n_cells, rt.vital_feat_hw,
                                                  rt.vital_feat_hw)

        def damage(pf):
            def one(mask):
                masked = _apply_cell_mask(
                    rt, pf, jnp.tile(mask[None], (pf.shape[0], 1, 1)))
                logits = _score_fn(model, params, fc_params, masked)
                # reference ranks by softmax positive probability
                # (g_pretrain.py:44 out_layer='fc6_softmax')
                return jax.nn.softmax(logits, axis=-1)[:, 1].mean()
            return jax.vmap(one)(one_cell)  # (D,) lower = more damaging

        def pre_body(i, carry):
            g, mom_g, rng_g = carry
            rng_g, r = jax.random.split(rng_g)
            idx = jax.random.choice(r, rt.n_init_pos, (rt.batch_pos,))
            pf = pos_feats[idx]
            dmg = damage(pf)
            _, worst = jax.lax.top_k(-dmg, rt.vital_drop_cells)
            target = 1.0 - jax.nn.one_hot(worst, n_cells).sum(axis=0)

            def pre_loss(gp):
                pred = gnet.apply(gp, pf.sum(axis=1)).reshape(pf.shape[0],
                                                              n_cells)
                return ((pred - target[None]) ** 2).mean()

            grads = jax.grad(pre_loss)(g)
            mom_g = jax.tree.map(lambda m, gr: rt.momentum * m + gr, mom_g, grads)
            g = jax.tree.map(lambda p, m: p - rt.lr_g * m, g, mom_g)
            return g, mom_g, rng_g

        g_params, g_mom, _ = jax.lax.fori_loop(
            0, rt.g_pretrain_iters, pre_body, (g_params, g_mom, rngs[6]))
        g_state = {"g": g_params, "g_mom": g_mom}

    # ridge bbox regressor on init samples (run_tracker.py:165-171):
    # uniform draw with aspect jitter, overlap filter at sampling time,
    # then BBRegressor.train's own overlap AND scale-range re-filter
    # (bbreg.py:24-29); features are the vis+event STREAM SUM
    # (run_tracker.py:169 bbreg_feats = vis + event)
    bb_boxes = _sample_filtered(
        rngs[3], lambda r, n: _uniform_boxes(r, init_box, n, rt.trans_bbreg,
                                             rt.scale_bbreg, img_hw,
                                             aspect=rt.aspect_bbreg),
        init_box, rt.n_bbreg, rt.bbreg_overlap)
    bb_feats = _extract_patches(rt, model, params, frame, bb_boxes)
    Xb = bb_feats.sum(axis=1)
    Yb = _bbreg_targets(bb_boxes, init_box)
    ious = _iou(bb_boxes, init_box)
    s = (bb_boxes[:, 2] * bb_boxes[:, 3]) / (init_box[2] * init_box[3])
    bb_valid = ((ious >= rt.bbreg_overlap[0]) & (ious <= rt.bbreg_overlap[1])
                & (s >= rt.bbreg_scale_range[0])
                & (s <= rt.bbreg_scale_range[1])).astype(jnp.float32)
    bb_alpha, Xb_c, bb_mu_x, bb_mu_y = _ridge_fit(Xb, Yb, rt.bbreg_lambda,
                                                  valid=bb_valid)

    # memory ring buffers (per-frame sample batches). The positive pool's
    # first LIST entry is the full init batch — carried separately as
    # pos_init (run_tracker.py:184 pos_feats_all = [pos_feats]); the
    # negative pool's entry 0 is a FRESH n_neg_update draw with the
    # update generator at the init overlap range (run_tracker.py:182-183),
    # NOT the 5000 init-training negatives. The reference keeps exactly
    # n_frames_short frames of negatives (:272-274).
    pos_mem = jnp.zeros((rt.n_frames_long, rt.n_pos_update, S, D), jnp.float32)
    neg_mem = jnp.zeros((rt.n_frames_short, rt.n_neg_update, S, D), jnp.float32)
    if rt.manet_seed_memory:
        # MANet seeds both memories with slices of the init training sets
        # (run_tracker.py:180-181) — entry 0 is a normal n_pos_update-row
        # entry, not pyMDNet's full init batch
        pos_pool0 = pos_feats[:rt.n_pos_update]
        neg_mem = neg_mem.at[0].set(neg_feats[:rt.n_neg_update])
    else:
        pos_pool0 = pos_feats
        neg_upd_boxes = _sample_filtered(
            rngs[7], lambda r, n: _uniform_boxes(r, init_box, n, rt.trans_neg,
                                                 rt.scale_neg, img_hw),
            init_box, rt.n_neg_update, rt.overlap_neg)
        neg_mem = neg_mem.at[0].set(
            _extract_patches(rt, model, params, frame, neg_upd_boxes))

    return {
        "box": init_box.astype(jnp.float32),
        "report_box": init_box.astype(jnp.float32),
        "pos_init": pos_pool0,
        "fc": fc_params, "momentum": momentum,
        "pos_mem": pos_mem, "neg_mem": neg_mem,
        "pos_count": jnp.asarray(1, jnp.int32),
        "neg_count": jnp.asarray(1, jnp.int32),
        "trans_f": jnp.asarray(rt.trans, jnp.float32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "bbreg_X": Xb_c, "bbreg_alpha": bb_alpha,
        "bbreg_mu_x": bb_mu_x, "bbreg_mu_y": bb_mu_y,
        "rng": rngs[4],
        "g_state": g_state,
    }


def _mdnet_core(rt: MDNetRuntime, model: MDNet, params, state, cands, feats,
                img_hw, collect_fn, r_train, inject_idx=None, dropout=True,
                gnet=None, inject_masks=None):
    """Shared per-frame protocol given candidate boxes + features.

    `collect_fn(raw_box) -> (pos_f, neg_f)` supplies the update-sample
    features — device crops around the post-frame box in production,
    injected reference crops in the parity harness."""
    scores = _score_fn(model, params, state["fc"], feats)[:, 1]
    top_scores, top_idx = jax.lax.top_k(scores, rt.topk)
    mean_score = top_scores.mean()
    success = mean_score > rt.success_thr

    top_boxes = cands[top_idx]
    new_box = top_boxes.mean(axis=0)

    # ridge bbox refinement of the top candidates on success; features are
    # the stream sum (run_tracker.py:246 bbreg_feats = vis + event),
    # centered as sklearn Ridge's intercept does, clamps per sample
    # BEFORE the mean (bbreg.py predict -> run_tracker.py:248 .mean)
    Xq = feats[top_idx].sum(axis=1)
    deltas = (((Xq - state["bbreg_mu_x"]) @ state["bbreg_X"].T)
              @ state["bbreg_alpha"] + state["bbreg_mu_y"])
    refined = (_bbreg_apply_manet(rt, top_boxes, deltas, img_hw)
               if rt.bbreg_reject
               else _bbreg_apply(top_boxes, deltas, img_hw)).mean(axis=0)

    if rt.revert_on_failure:
        # MANet: both boxes revert to the previous frame's results at
        # failure (run_tracker.py:252-256)
        box = jnp.where(success, refined, state["report_box"])
        raw_box = jnp.where(success, new_box, state["box"])
    else:
        # pyMDNet overwrites the box with the top-5 mean even on failure
        # (run_tracker.py:234-237; bbreg skipped -> bbreg_bbox = target_bbox
        # at :255; same in pyVITAL:320 and APFNet Run.py:245)
        box = jnp.where(success, refined, new_box)
        raw_box = new_box
    # candidate spread on failure: hard set (MANet :239) or the gradual
    # expand walk (sample_generator.py:95 expand_trans: min(trans*1.1, cap))
    trans_fail = (rt.trans_f_expand if rt.hard_trans_expand
                  else jnp.minimum(state["trans_f"] * 1.1, rt.trans_f_expand))
    state = {**state, "box": raw_box, "report_box": box,
             "trans_f": jnp.where(success, rt.trans, trans_fail)}

    # collect samples on success (options.yaml: trans_pos/scale_pos,
    # trans_neg/scale_neg, overlap_neg_update)
    pos_f, neg_f = collect_fn(raw_box)

    # memory layout mirrors the reference's python lists
    # (run_tracker.py:182-186, 253-274): the POSITIVE pool's entry 0 is
    # the FULL 500-sample init batch, kept until n_frames_long frames
    # accumulate (and inside the short-term window only while the list is
    # shorter than n_frames_short); update frames are 50-sample entries.
    # pos_count counts LIST entries incl. init (starts 1), so update
    # frame k lands in ring slot k-1.
    pos_slot = (state["pos_count"] - 1) % state["pos_mem"].shape[0]
    neg_slot = state["neg_count"] % state["neg_mem"].shape[0]
    upd_pos_mem = state["pos_mem"].at[pos_slot].set(pos_f[:rt.n_pos_update])
    upd_neg_mem = state["neg_mem"].at[neg_slot].set(neg_f[:rt.n_neg_update])
    state = {
        **state,
        "pos_mem": jnp.where(success, upd_pos_mem, state["pos_mem"]),
        "neg_mem": jnp.where(success, upd_neg_mem, state["neg_mem"]),
        "pos_count": jnp.where(success, state["pos_count"] + 1, state["pos_count"]),
        "neg_count": jnp.where(success, state["neg_count"] + 1, state["neg_count"]),
    }

    # update cadence: short-term on failure, long-term every 10th frame
    long_update = (state["frame_num"] % rt.long_interval) == 0
    do_update = (~success) | long_update
    n_iter = jnp.where(do_update, rt.update_iters, 0)

    Lp = state["pos_mem"].shape[0]
    Ln = state["neg_mem"].shape[0]
    slots_p = jnp.arange(Lp)
    slots_n = jnp.arange(Ln)
    u = state["pos_count"] - 1            # update frames stored
    filled_p = slots_p < jnp.minimum(u, Lp)
    filled_n = slots_n < jnp.minimum(state["neg_count"], Ln)
    # short-term: the last n_frames_short list entries — update slot age
    # a = 0 for the newest write
    age = (u - 1 - slots_p) % Lp
    recent = age < rt.n_frames_short
    pos_sel = jnp.where(success, filled_p, filled_p & recent)
    # init entry validity: dropped from the list after n_frames_long
    # entries; inside the short-term window only while len <= n_frames_short
    init_long = state["pos_count"] <= rt.n_frames_long
    init_short = state["pos_count"] <= rt.n_frames_short
    init_valid = jnp.where(success, init_long, init_long & init_short)

    pos_flat = jnp.concatenate([
        state["pos_init"],
        state["pos_mem"].reshape(Lp * rt.n_pos_update,
                                 *state["pos_mem"].shape[2:])])
    neg_flat = state["neg_mem"].reshape(Ln * rt.n_neg_update,
                                        *state["neg_mem"].shape[2:])
    pos_valid = jnp.concatenate([
        init_valid.astype(jnp.float32)
        * jnp.ones(state["pos_init"].shape[0]),
        jnp.repeat(pos_sel.astype(jnp.float32), rt.n_pos_update)])
    neg_valid = jnp.repeat(filled_n.astype(jnp.float32), rt.n_neg_update)

    fc, mom, _, g_state = _fc_train(
        rt, model, params, state["fc"], state["momentum"],
        pos_flat, pos_valid, neg_flat, neg_valid,
        n_iter, rt.lr_update, r_train,
        gnet=gnet, g_state=state["g_state"] if state["g_state"] else None,
        inject_idx=inject_idx, dropout=dropout,
        vital_active=success & long_update, inject_masks=inject_masks)
    state = {**state, "fc": fc, "momentum": mom,
             "g_state": g_state if g_state else state["g_state"]}

    aux = {"scores": scores, "top_idx": top_idx, "success": success,
           "raw_box": raw_box, "deltas": deltas, "refined": refined,
           "do_update": do_update}
    return state, box, mean_score, aux


def mdnet_init_from_patches(rt: MDNetRuntime, model: MDNet, params,
                            init_box, pos_patches, neg_patches,
                            bbreg_patches, bbreg_boxes, neg_upd_patches,
                            rng, inject_idx=None, dropout=True):
    """Parity-harness init: the reference's own init pos/neg/bbreg crops
    and training index streams are injected; everything downstream (init
    SGD with mining + clip, centered ridge, memory seeding) is ours."""
    pos_feats = _embed_patches(rt, model, params, pos_patches)
    neg_feats = _embed_patches(rt, model, params, neg_patches)
    S, D = pos_feats.shape[1], pos_feats.shape[2]

    fc_params = {k: params["params"][k] for k in params["params"]
                 if k.startswith("fc")}
    momentum = jax.tree.map(jnp.zeros_like, fc_params)
    fc_params, momentum, _, _ = _fc_train(
        rt, model, params, fc_params, momentum,
        pos_feats, jnp.ones(pos_feats.shape[0]),
        neg_feats, jnp.ones(neg_feats.shape[0]),
        rt.init_iters, rt.lr_init, rng,
        inject_idx=inject_idx, dropout=dropout)
    momentum = jax.tree.map(jnp.zeros_like, momentum)  # fresh update optim

    bb_feats = _embed_patches(rt, model, params, bbreg_patches)
    Xb = bb_feats.sum(axis=1)
    Yb = _bbreg_targets(bbreg_boxes, init_box)
    ious = _iou(bbreg_boxes, init_box)
    s = (bbreg_boxes[:, 2] * bbreg_boxes[:, 3]) / (init_box[2] * init_box[3])
    bb_valid = ((ious >= rt.bbreg_overlap[0]) & (ious <= rt.bbreg_overlap[1])
                & (s >= rt.bbreg_scale_range[0])
                & (s <= rt.bbreg_scale_range[1])).astype(jnp.float32)
    bb_alpha, Xb_c, bb_mu_x, bb_mu_y = _ridge_fit(Xb, Yb, rt.bbreg_lambda,
                                                  valid=bb_valid)

    pos_mem = jnp.zeros((rt.n_frames_long, rt.n_pos_update, S, D),
                        jnp.float32)
    neg_mem = jnp.zeros((rt.n_frames_short, rt.n_neg_update, S, D),
                        jnp.float32)
    if rt.manet_seed_memory:
        pos_pool0 = pos_feats[:rt.n_pos_update]
        neg_mem = neg_mem.at[0].set(neg_feats[:rt.n_neg_update])
    else:
        pos_pool0 = pos_feats
        neg_mem = neg_mem.at[0].set(
            _embed_patches(rt, model, params, neg_upd_patches))

    return {
        "box": init_box.astype(jnp.float32),
        "report_box": init_box.astype(jnp.float32),
        "pos_init": pos_pool0,
        "fc": fc_params, "momentum": momentum,
        "pos_mem": pos_mem, "neg_mem": neg_mem,
        "pos_count": jnp.asarray(1, jnp.int32),
        "neg_count": jnp.asarray(1, jnp.int32),
        "trans_f": jnp.asarray(rt.trans, jnp.float32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "bbreg_X": Xb_c, "bbreg_alpha": bb_alpha,
        "bbreg_mu_x": bb_mu_x, "bbreg_mu_y": bb_mu_y,
        "rng": rng,
        "g_state": {},
    }


def mdnet_track_step(rt: MDNetRuntime, model: MDNet, params, state, frame,
                     gnet=None):
    """Production step: device crops for candidates and update samples."""
    H, W = frame.shape[0], frame.shape[1]
    img_hw = (H, W)
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, r_cand, r_pos, r_neg, r_train = jax.random.split(state["rng"], 5)
    state = {**state, "rng": rng}

    cands = _gaussian_boxes(r_cand, state["box"], rt.n_samples,
                            state["trans_f"], rt.scale_f, img_hw)
    feats = _extract_patches(rt, model, params, frame, cands)

    def collect_fn(raw_box):
        pos_boxes = _sample_filtered(
            r_pos, lambda r, n: _gaussian_boxes(r, raw_box, n, rt.trans_pos,
                                                rt.scale_pos, img_hw),
            raw_box, rt.n_pos_update, rt.overlap_pos)
        neg_boxes = _sample_filtered(
            r_neg, lambda r, n: _uniform_boxes(r, raw_box, n, rt.trans_neg,
                                               rt.scale_neg, img_hw),
            raw_box, rt.n_neg_update, (0.0, 0.3))
        return (_extract_patches(rt, model, params, frame, pos_boxes),
                _extract_patches(rt, model, params, frame, neg_boxes))

    state, box, mean_score, _ = _mdnet_core(
        rt, model, params, state, cands, feats, img_hw, collect_fn, r_train,
        gnet=gnet)
    return state, box, mean_score


def _embed_patches(rt: MDNetRuntime, model, params, patches):
    """Embed injected raw crops (N, 107, 107, C) on the 0..255 scale —
    the RegionExtractor path minus the crop (data_prov.py:50: float - 128)."""
    def embed(ps):
        return model.apply(params, ps - 128.0,
                           method=type(model).extract_features)
    n = patches.shape[0]
    if n <= rt.extract_chunk:
        return embed(patches)
    pad = (-n) % rt.extract_chunk
    padded = jnp.concatenate(
        [patches, jnp.zeros((pad, *patches.shape[1:]), patches.dtype)])
    chunks = padded.reshape(-1, rt.extract_chunk, *patches.shape[1:])
    out = jax.lax.map(embed, chunks)
    return out.reshape(-1, *out.shape[2:])[:n]


def mdnet_step_from_patches(rt: MDNetRuntime, model: MDNet, params, state,
                            cand_boxes, cand_patches, pos_patches,
                            neg_patches, im_hw, inject_idx=None,
                            dropout=True, inject_masks=None):
    """Parity-harness step: candidate boxes + raw crops and the update
    pos/neg crops are injected (the reference's own SampleGenerator draws
    and crop_image2 crops), as are the training batch index streams (and,
    for the VITAL check, the reference's own per-iter ASDN drop masks)."""
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, r_train = jax.random.split(state["rng"])
    state = {**state, "rng": rng}
    feats = _embed_patches(rt, model, params, cand_patches)

    def collect_fn(raw_box):
        return (_embed_patches(rt, model, params, pos_patches),
                _embed_patches(rt, model, params, neg_patches))

    return _mdnet_core(rt, model, params, state, cand_boxes, feats, im_hw,
                       collect_fn, r_train, inject_idx=inject_idx,
                       dropout=dropout, inject_masks=inject_masks)


class MDNetTracker:
    """OO facade (BaseTracker API) over the functional MDNet protocol."""

    def __init__(self, model: MDNet, params, runtime: MDNetRuntime | None = None,
                 seed: int = 0):
        self.model = model
        self.params = params
        self.rt = runtime or MDNetRuntime()
        self.seed = seed
        self.gnet = None
        if self.rt.vital:
            from mmtrack_tpu.models.vital import GNet

            self.gnet = GNet(feat_hw=self.rt.vital_feat_hw,
                             feat_dim=self.rt.vital_feat_dim)
        self._init_fn = jax.jit(partial(mdnet_init_state, self.rt, self.model,
                                        gnet=self.gnet))
        self._step_fn = jax.jit(partial(mdnet_track_step, self.rt, self.model,
                                        gnet=self.gnet))
        self.state = None

    def initialize(self, image: np.ndarray, info: dict) -> None:
        box = jnp.asarray(np.asarray(info["init_bbox"], np.float32))
        self.state = self._init_fn(self.params, jnp.asarray(image), box,
                                   jax.random.PRNGKey(self.seed))

    def track(self, image: np.ndarray, info: dict | None = None) -> dict:
        self.state, box, score = self._step_fn(self.params, self.state,
                                               jnp.asarray(image))
        return {"target_bbox": np.asarray(box).tolist(),
                "best_score": float(score)}
