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
from mmtrack_tpu.ops.crop import crop_at


@dataclass(frozen=True)
class MDNetRuntime:
    img_size: int = 107
    padding: int = 16
    batch_test: int = 256
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
    n_pos_update: int = 50
    n_neg_update: int = 200
    n_frames_long: int = 100
    n_frames_short: int = 20
    long_interval: int = 10
    n_bbreg: int = 1000
    bbreg_overlap: tuple = (0.6, 1.0)
    bbreg_lambda: float = 1000.0
    success_thr: float = 0.0
    topk: int = 5
    # VITAL adversarial masking (pyVITAL run_tracker.py train():83-151 +
    # g_pretrain at init): the GNet proposes (3,3) feature drop masks; the
    # classifier trains on masked positives, G trains to minimize the
    # classifier's positive score.
    vital: bool = False
    vital_drop_cells: int = 3      # lowest-G cells dropped (lines 113-127)
    vital_feat_hw: int = 3
    vital_feat_dim: int = 512
    g_pretrain_iters: int = 20     # g_pretrain.py supervised warmup
    g_update_iters: int = 2        # G SGD steps per classifier update
    lr_g: float = 1e-3


# ---------------------------------------------------------------- sampling

def _gaussian_boxes(rng, box, n, trans, scale, img_hw):
    """SampleGenerator('gaussian') analog (pyMDNet modules/sample_generator)."""
    x, y, w, h = box[0], box[1], box[2], box[3]
    c = jnp.stack([x + w / 2, y + h / 2])
    r1, r2 = jax.random.split(rng)
    m = jnp.mean(jnp.stack([w, h]))
    centers = c + trans * m * jnp.clip(
        0.5 * jax.random.normal(r1, (n, 2)), -1.0, 1.0)
    scales = scale ** jnp.clip(0.5 * jax.random.normal(r2, (n, 1)), -1.0, 1.0)
    wh = jnp.stack([w, h]) * scales
    H, W = img_hw
    centers = jnp.clip(centers, wh / 2, jnp.asarray([W, H]) - wh / 2)
    return jnp.concatenate([centers - wh / 2, wh], axis=1)


def _uniform_boxes(rng, box, n, trans, scale, img_hw):
    x, y, w, h = box[0], box[1], box[2], box[3]
    c = jnp.stack([x + w / 2, y + h / 2])
    r1, r2 = jax.random.split(rng)
    m = jnp.mean(jnp.stack([w, h]))
    centers = c + trans * m * (jax.random.uniform(r1, (n, 2)) * 2 - 1)
    scales = scale ** (jax.random.uniform(r2, (n, 1)) * 2 - 1)
    wh = jnp.stack([w, h]) * scales
    H, W = img_hw
    centers = jnp.clip(centers, wh / 2, jnp.asarray([W, H]) - wh / 2)
    return jnp.concatenate([centers - wh / 2, wh], axis=1)


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

def _extract_patches(rt: MDNetRuntime, model, params, frame, boxes):
    """Crop each box with 16px context and embed (RegionExtractor analog).

    Batches larger than rt.extract_chunk are embedded chunk-by-chunk via
    lax.map so the 5000-negative init draw (options.yaml) never
    materializes all 107x107 patches + conv activations at once — device
    memory stays bounded without shrinking the hard-negative pool."""
    def one(b):
        c = jnp.stack([b[1] + b[3] / 2, b[0] + b[2] / 2])  # (y, x)
        side = jnp.sqrt(b[2] * b[3]) * (rt.img_size + 2 * rt.padding) / rt.img_size
        patch = crop_at(frame, c, side, rt.img_size, border="replicate")
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
              gnet=None, g_state=None):
    """SGD+momentum fine-tuning with hard-negative mining (pyMDNet train(),
    run_tracker.py:52-117). pos/neg_feats: (Np, S, D)/(Nn, S, D) with
    validity masks; n_iter may be traced (0 = no-op).

    With rt.vital (gnet + g_state given), positives are adversarially
    masked by GNet before the classifier loss, and G takes its own SGD
    steps against the updated classifier afterwards. Returns
    (fc, momentum, rng, g_state)."""
    use_vital = rt.vital and gnet is not None and g_state is not None

    def loss_fn(fc, pos_idx, neg_idx, drop_rng, g_params):
        pf = pos_feats[pos_idx]
        if use_vital:
            pf = _apply_cell_mask(rt, pf, _vital_drop_mask(rt, gnet, g_params, pf))
        nf = neg_feats[neg_idx]
        r1, r2 = jax.random.split(drop_rng)
        pos_logits = _score_fn(model, params, fc, pf, rng=r1, train=True)
        neg_logits = _score_fn(model, params, fc, nf, rng=r2, train=True)
        # binary cross-entropy over (bg, target) logits; the reference
        # BCELoss normalizes by the COMBINED count (model.py:162-170:
        # (pos.sum()+neg.sum())/(Npos+Nneg)) — per-set means would weight
        # each positive 3x a negative at the canonical 32/96 batch
        pos_l = -jax.nn.log_softmax(pos_logits)[:, 1].sum()
        neg_l = -jax.nn.log_softmax(neg_logits)[:, 0].sum()
        n = pos_logits.shape[0] + neg_logits.shape[0]
        wd = 0.5 * rt.weight_decay * sum(
            (p ** 2).sum() for p in jax.tree.leaves(fc))
        return (pos_l + neg_l) / n + wd

    def lr_tree(fc):
        return jax.tree.map_with_path(
            lambda path, _: lr * (rt.lr_mult_fc6 if "fc6" in str(path[0]) else 1.0),
            fc)

    def body(i, carry):
        fc, mom, rng, g_st = carry
        rng, r_pos, r_neg, r_mine, r_drop = jax.random.split(rng, 5)
        pos_p = pos_valid / jnp.maximum(pos_valid.sum(), 1)
        pos_idx = jax.random.choice(r_pos, pos_feats.shape[0],
                                    (rt.batch_pos,), p=pos_p)
        # hard mining: score a random candidate pool, keep the top batch_neg
        neg_p = neg_valid / jnp.maximum(neg_valid.sum(), 1)
        cand_idx = jax.random.choice(r_mine, neg_feats.shape[0],
                                     (rt.batch_neg_cand,), p=neg_p)
        cand_scores = _score_fn(model, params, fc, neg_feats[cand_idx])[:, 1]
        _, top = jax.lax.top_k(cand_scores, rt.batch_neg)
        neg_idx = cand_idx[top]

        g_params = g_st["g"] if use_vital else None
        grads = jax.grad(loss_fn)(fc, pos_idx, neg_idx, r_drop, g_params)
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

        g_iters = jnp.where(n_iter > 0, rt.g_update_iters, 0)
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


def _bbreg_apply(boxes, deltas):
    cx = boxes[:, 0] + boxes[:, 2] / 2 + deltas[:, 0] * boxes[:, 2]
    cy = boxes[:, 1] + boxes[:, 3] / 2 + deltas[:, 1] * boxes[:, 3]
    w = boxes[:, 2] * jnp.exp(deltas[:, 2])
    h = boxes[:, 3] * jnp.exp(deltas[:, 3])
    return jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=1)


def _ridge_fit(X, Y, lam):
    """Dual ridge: alpha = (XX^T + lam I)^-1 Y; w implicit via stored X."""
    K = X @ X.T
    A = jnp.linalg.solve(K + lam * jnp.eye(X.shape[0]), Y)
    return A


# ---------------------------------------------------------------- runtime

def mdnet_init_state(rt: MDNetRuntime, model: MDNet, params, frame,
                     init_box, rng, gnet=None) -> dict:
    H, W = frame.shape[0], frame.shape[1]
    img_hw = (H, W)
    rngs = jax.random.split(rng, 8)

    pos_boxes = _sample_filtered(
        rngs[0], lambda r, n: _gaussian_boxes(r, init_box, n, 0.1, 1.2, img_hw),
        init_box, rt.n_init_pos, rt.overlap_pos)
    neg_boxes = _sample_filtered(
        rngs[1], lambda r, n: _uniform_boxes(r, init_box, n, 1.0, 1.6, img_hw),
        init_box, rt.n_init_neg, rt.overlap_neg)

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

    # ridge bbox regressor on init pos samples (run_tracker.py bbreg section)
    bb_boxes = _sample_filtered(
        rngs[3], lambda r, n: _uniform_boxes(r, init_box, n, 0.3, 1.6, img_hw),
        init_box, rt.n_bbreg, rt.bbreg_overlap)
    bb_feats = _extract_patches(rt, model, params, frame, bb_boxes)
    Xb = bb_feats.reshape(rt.n_bbreg, -1)
    Yb = _bbreg_targets(bb_boxes, init_box)
    bb_alpha = _ridge_fit(Xb, Yb, rt.bbreg_lambda)

    # memory ring buffers (per-frame sample batches)
    pos_mem = jnp.zeros((rt.n_frames_long, rt.n_pos_update, S, D), jnp.float32)
    neg_mem = jnp.zeros((rt.n_frames_short + 10, rt.n_neg_update, S, D), jnp.float32)
    pos_mem = pos_mem.at[0].set(pos_feats[:rt.n_pos_update])
    neg_mem = neg_mem.at[0].set(neg_feats[:rt.n_neg_update])

    return {
        "box": init_box.astype(jnp.float32),
        "fc": fc_params, "momentum": momentum,
        "pos_mem": pos_mem, "neg_mem": neg_mem,
        "pos_count": jnp.asarray(1, jnp.int32),
        "neg_count": jnp.asarray(1, jnp.int32),
        "trans_f": jnp.asarray(rt.trans, jnp.float32),
        "frame_num": jnp.asarray(1, jnp.int32),
        "bbreg_X": Xb, "bbreg_alpha": bb_alpha,
        "rng": rngs[4],
        "g_state": g_state,
    }


def mdnet_track_step(rt: MDNetRuntime, model: MDNet, params, state, frame,
                     gnet=None):
    H, W = frame.shape[0], frame.shape[1]
    img_hw = (H, W)
    state = {**state, "frame_num": state["frame_num"] + 1}
    rng, r_cand, r_pos, r_neg, r_train = jax.random.split(state["rng"], 5)
    state = {**state, "rng": rng}

    cands = _gaussian_boxes(r_cand, state["box"], rt.batch_test,
                            state["trans_f"], rt.scale_f, img_hw)
    feats = _extract_patches(rt, model, params, frame, cands)
    scores = _score_fn(model, params, state["fc"], feats)[:, 1]
    top_scores, top_idx = jax.lax.top_k(scores, rt.topk)
    mean_score = top_scores.mean()
    success = mean_score > rt.success_thr

    top_boxes = cands[top_idx]
    new_box = top_boxes.mean(axis=0)

    # ridge bbox refinement of the top candidates on success
    Xq = feats[top_idx].reshape(rt.topk, -1)
    deltas = (Xq @ state["bbreg_X"].T) @ state["bbreg_alpha"]
    refined = _bbreg_apply(top_boxes, deltas).mean(axis=0)

    box = jnp.where(success, refined, state["box"])
    raw_box = jnp.where(success, new_box, state["box"])
    state = {**state, "box": raw_box,
             "trans_f": jnp.where(success, rt.trans, rt.trans_f_expand)}

    # collect samples on success
    pos_boxes = _sample_filtered(
        r_pos, lambda r, n: _gaussian_boxes(r, raw_box, n, 0.1, 1.2, img_hw),
        raw_box, rt.n_pos_update, rt.overlap_pos)
    neg_boxes = _sample_filtered(
        r_neg, lambda r, n: _uniform_boxes(r, raw_box, n, 1.5, 1.2, img_hw),
        raw_box, rt.n_neg_update, (0.0, 0.3))
    pos_f = _extract_patches(rt, model, params, frame, pos_boxes)
    neg_f = _extract_patches(rt, model, params, frame, neg_boxes)

    pos_slot = state["pos_count"] % state["pos_mem"].shape[0]
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
    filled_p = slots_p < jnp.minimum(state["pos_count"], Lp)
    filled_n = slots_n < jnp.minimum(state["neg_count"], Ln)
    # short-term: restrict pos to the most recent n_frames_short slots
    recent = ((state["pos_count"] - 1 - slots_p) % Lp) < rt.n_frames_short
    pos_sel = jnp.where(success, filled_p, filled_p & recent)

    pos_flat = state["pos_mem"].reshape(Lp * rt.n_pos_update,
                                        *state["pos_mem"].shape[2:])
    neg_flat = state["neg_mem"].reshape(Ln * rt.n_neg_update,
                                        *state["neg_mem"].shape[2:])
    pos_valid = jnp.repeat(pos_sel.astype(jnp.float32), rt.n_pos_update)
    neg_valid = jnp.repeat(filled_n.astype(jnp.float32), rt.n_neg_update)

    fc, mom, _, g_state = _fc_train(
        rt, model, params, state["fc"], state["momentum"],
        pos_flat, pos_valid, neg_flat, neg_valid,
        n_iter, rt.lr_update, r_train,
        gnet=gnet, g_state=state["g_state"] if state["g_state"] else None)
    state = {**state, "fc": fc, "momentum": mom,
             "g_state": g_state if g_state else state["g_state"]}

    return state, box, mean_score


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
