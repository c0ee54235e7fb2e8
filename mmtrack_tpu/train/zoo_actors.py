"""Training objectives for the non-ViPT zoo: STARK, MixFormer, SiamFC,
MDNet/APFNet.

Reference recipes rebuilt per family:
  - STARK (SPT/lib/train, lib/train/actors/stark_s.py + stark_st.py):
    stage 'bbox' = GIoU(2.0) + L1(5.0) on the corner-decoded box; stage
    'score' = BCE on the classification head with positive (real) and
    negative (cross-sequence shuffled search) pairs, backbone frozen via an
    optimizer mask at the caller.
  - MixFormer (MixFormer_RGBD/lib/train, actors/mixformer.py): stage 'bbox'
    = GIoU + L1 on the corner head; stage 'score' = BCE on the SPM logit at
    the GT box (TRAIN_SCORE: true, SCORE_WEIGHT 1.0).
  - SiamFC (siamfc paper / RGBE's empty submodule): balanced logistic loss
    on the 17x17 response with radius-16px positive labels.
  - MDNet family (pyMDNet train/train_mdnet.py, APFNet train_stage{1,2,3}):
    binary CE over pos/neg 107^2 patches sampled around the target (the
    RegionExtractor + LocalSampler ported to device-side crop ops); APFNet
    staging reuses models/apfnet.stage_mask optimizer masks.

All steps consume the standard sampler batch (template (B,T,T,C), search
(B,S,S,C), search_anno (B,4) normalized xywh) and return (state, stats) —
same contract as train_step.make_train_step, so shard_train_step/Trainer
work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from mmtrack_tpu.data.processing import MEAN_6, STD_6
from mmtrack_tpu.ops.box import box_cxcywh_to_xyxy, box_xywh_to_xyxy
from mmtrack_tpu.ops.crop import crop_resize
from mmtrack_tpu.ops.losses import giou_loss, l1_loss
from mmtrack_tpu.train.train_step import TrainState


def _bce_logits(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def _apply_update(state: TrainState, tx, loss_grads):
    (loss, stats), grads = loss_grads
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=new_params,
                      opt_state=new_opt), stats


# ------------------------------------------------------------------ STARK

def make_stark_train_step(model, tx, stage: str = "bbox",
                          weights=(2.0, 5.0)):
    def train_step(state, batch, rng):
        def loss_fn(params):
            out = model.apply(params, batch["template"], batch["search"])
            gt_xyxy = jnp.clip(box_xywh_to_xyxy(batch["search_anno"]), 0, 1)
            pred_xyxy = box_cxcywh_to_xyxy(out["pred_boxes"])
            if stage == "bbox":
                g, iou = giou_loss(pred_xyxy, gt_xyxy)
                l1 = l1_loss(pred_xyxy, gt_xyxy)
                loss = weights[0] * g + weights[1] * l1
                return loss, {"Loss/total": loss, "Loss/giou": g,
                              "Loss/l1": l1, "IoU": iou}
            # score stage: negatives = batch-rolled searches (different
            # sequence -> target absent), labels 1/0 (stark_st stage 2)
            neg = jnp.roll(batch["search"], 1, axis=0)
            pos_out = out
            neg_out = model.apply(params, batch["template"], neg)
            logits = jnp.concatenate([
                _logit(pos_out["pred_scores"]), _logit(neg_out["pred_scores"])])
            labels = jnp.concatenate([
                jnp.ones(batch["search"].shape[0]),
                jnp.zeros(batch["search"].shape[0])])
            loss = _bce_logits(logits, labels)
            acc = ((logits > 0) == (labels > 0.5)).mean()
            return loss, {"Loss/total": loss, "Acc": acc}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


def _logit(p, eps=1e-6):
    p = jnp.clip(p, eps, 1 - eps)
    return jnp.log(p) - jnp.log1p(-p)


# --------------------------------------------------------------- MixFormer

def make_mixformer_train_step(model, tx, stage: str = "bbox",
                              weights=(2.0, 5.0), score_weight: float = 1.0):
    def train_step(state, batch, rng):
        def loss_fn(params):
            gt_xyxy = jnp.clip(box_xywh_to_xyxy(batch["search_anno"]), 0, 1)
            out = model.apply(params, batch["template"], batch["template"],
                              batch["search"], run_score_head=stage == "score",
                              score_box_xyxy=gt_xyxy if stage == "score" else None)
            pred_xyxy = box_cxcywh_to_xyxy(out["pred_boxes"])
            if stage == "bbox":
                g, iou = giou_loss(pred_xyxy, gt_xyxy)
                l1 = l1_loss(pred_xyxy, gt_xyxy)
                loss = weights[0] * g + weights[1] * l1
                return loss, {"Loss/total": loss, "Loss/giou": g,
                              "Loss/l1": l1, "IoU": iou}
            # TRAIN_SCORE: positives = true pair, negatives = rolled search
            neg = jnp.roll(batch["search"], 1, axis=0)
            neg_out = model.apply(params, batch["template"], batch["template"],
                                  neg, run_score_head=True,
                                  score_box_xyxy=gt_xyxy)
            logits = jnp.concatenate([out["score_logits"],
                                      neg_out["score_logits"]])
            labels = jnp.concatenate([
                jnp.ones(batch["search"].shape[0]),
                jnp.zeros(batch["search"].shape[0])])
            loss = score_weight * _bce_logits(logits, labels)
            acc = ((logits > 0) == (labels > 0.5)).mean()
            return loss, {"Loss/total": loss, "Acc": acc}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


# ------------------------------------------------------------------ SiamFC

def siamfc_response_labels(anno_xywh, search_size: int, response_sz: int,
                           total_stride: int, r_pos_px: float = 16.0):
    """+1 within r_pos of the target center on the response grid, -1 outside
    (SiamFC logistic labels). anno normalized to the search crop."""
    B = anno_xywh.shape[0]
    cx = (anno_xywh[:, 0] + anno_xywh[:, 2] / 2 - 0.5) * search_size
    cy = (anno_xywh[:, 1] + anno_xywh[:, 3] / 2 - 0.5) * search_size
    c = (response_sz - 1) / 2.0
    iy = jnp.arange(response_sz, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(response_sz, dtype=jnp.float32)[None, None, :]
    dy = (iy - c) * total_stride - cy[:, None, None]
    dx = (ix - c) * total_stride - cx[:, None, None]
    dist = jnp.sqrt(dy * dy + dx * dx)
    return jnp.where(dist <= r_pos_px, 1.0, -1.0)


def make_siamfc_train_step(model, tx, search_size: int = 255,
                           total_stride: int = 8):
    def train_step(state, batch, rng):
        # the SiamFC runtime feeds patches/255 (siamfc_tracker.py:73,86);
        # undo the loader's ImageNet normalization so train == serve
        c = batch["search"].shape[-1]
        z01 = batch["template"] * STD_6[:c] + MEAN_6[:c]
        x01 = batch["search"] * STD_6[:c] + MEAN_6[:c]

        def loss_fn(params):
            resp = model.apply(params, z01, x01)
            y = siamfc_response_labels(batch["search_anno"], search_size,
                                       resp.shape[-1], total_stride)
            # balanced logistic loss: log(1 + exp(-y * v))
            ll = jnp.logaddexp(0.0, -y * resp)
            pos = (y > 0).astype(jnp.float32)
            neg = 1.0 - pos
            loss = 0.5 * ((ll * pos).sum() / jnp.maximum(pos.sum(), 1)
                          + (ll * neg).sum() / jnp.maximum(neg.sum(), 1))
            return loss, {"Loss/total": loss,
                          "Resp/pos_mean": (resp * pos).sum() / jnp.maximum(pos.sum(), 1)}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


# ------------------------------------------------------------ MDNet family

def mdnet_training_patches(search_img, anno_xywh, rng, n_pos: int = 32,
                           n_neg: int = 96, patch_sz: int = 107):
    """Pos/neg 107^2 patches from a search crop (RegionExtractor +
    SampleGenerator, pyMDNet train path): positives are small gaussian
    jitters of the GT box, negatives are large uniform shifts/scales."""
    S = search_img.shape[0]
    box = anno_xywh * S  # pixels in the crop
    rp, rn = jax.random.split(rng)

    def jitter(r, n, pos_std, scale_std):
        rc, rs = jax.random.split(r)
        c_noise = jax.random.normal(rc, (n, 2)) * pos_std * jnp.mean(box[2:])
        s_noise = jnp.exp(jax.random.normal(rs, (n, 1)) * scale_std)
        wh = box[2:] * s_noise
        ctr = box[:2] + box[2:] / 2 + c_noise
        return jnp.concatenate([ctr - wh / 2, wh], axis=1)

    pos_boxes = jitter(rp, n_pos, 0.1, 0.1)
    neg_boxes = jitter(rn, n_neg, 1.0, 0.5)
    boxes = jnp.concatenate([pos_boxes, neg_boxes])

    def extract(b):
        # 16px context at the 107 crop size, like the runtime's
        # RegionExtractor geometry (side = sqrt(wh) * (107+2*16)/107)
        crop, _ = crop_resize(search_img, b, (patch_sz + 32) / patch_sz,
                              patch_sz)
        return crop

    patches = jax.vmap(extract)(boxes)
    labels = jnp.concatenate([jnp.ones(n_pos), jnp.zeros(n_neg)])
    return patches, labels


def make_mdnet_train_step(model, tx, n_pos: int = 32, n_neg: int = 96,
                          branch: int = 0):
    """Multi-domain offline training step: per-sample pos/neg patch sets,
    2-way softmax CE (train_mdnet.py BinaryLoss)."""
    def train_step(state, batch, rng):
        B = batch["search"].shape[0]
        rngs = jax.random.split(rng, B)

        # undo the loader's ImageNet normalization and feed the tracker's
        # (= reference's) convention: raw 0-255 float minus 128 — train
        # and serve must see the same input distribution
        c = batch["search"].shape[-1]
        raw = (batch["search"] * STD_6[:c] + MEAN_6[:c]) * 255.0

        def build(img, anno, r):
            return mdnet_training_patches(img, anno, r, n_pos, n_neg)

        patches, labels = jax.vmap(build)(raw, batch["search_anno"], rngs)
        patches = patches.reshape((-1,) + patches.shape[2:]) - 128.0
        labels = labels.reshape(-1)

        def loss_fn(params):
            logits = model.apply(params, patches, branch)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -(labels * logp[:, 1] + (1 - labels) * logp[:, 0]).mean()
            acc = ((logits[:, 1] > logits[:, 0]) == (labels > 0.5)).mean()
            return loss, {"Loss/total": loss, "Acc": acc}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


# ------------------------------------------------------------------- KYS

def make_kys_train_step(model, tx, clf_weight: float = 1.0,
                        is_target_weight: float = 0.25,
                        filter_optim_iter: int = 5):
    """KYS response-predictor training (MotionTrackerActor,
    keep_track_vot2021/ltr/actors/tracking_motion.py:10-163): the DiMP
    base is FROZEN (KYSNet.train, kysnet.py:18-28) and only the
    scene-propagation predictor learns, from pairs of consecutive search
    frames — frame 1 seeds the GRU state from its label, frame 2's fused
    response is supervised with the LBHinge classification loss plus BCE
    on the is_target auxiliary head. The reference ships no KYS train
    settings; loss weights are the actor's argument defaults in spirit
    (objective['test_clf'] + aux weights).

    Batch: train_images (B,S,S,3) + train_anno (B,4) crop-coord xywh for
    the filter, test_prev/test_cur (B,S,S,3), label_prev/label_cur
    (B,h,w) Gaussian labels on the feature grid. Pass tx masked to the
    predictor subtree for exact reference freezing semantics.
    """
    from mmtrack_tpu.ops.losses import lb_hinge_loss

    def train_step(state, batch, rng):
        def loss_fn(params):
            stop = jax.lax.stop_gradient

            def dimp_pass(im):
                bf = model.apply(params, im, method="extract_backbone")
                cf = model.apply(params, bf,
                                 method="extract_classification_feat")
                return bf, cf

            bf_tr, cf_tr = dimp_pass(batch["train_images"])
            bf_p, _ = dimp_pass(batch["test_prev"])
            bf_c, cf_c = dimp_pass(batch["test_cur"])
            S = batch["label_cur"].shape[-1]

            # one filter PER SEQUENCE from its own train frame (the
            # reference's (num_images, num_sequences) semantics — see
            # dimp_actor.per_sequence_scores), so the dimp score the
            # predictor learns to fuse is as sharp as at serve time
            def one(tc, te, bb):
                w0 = model.apply(params, tc[None], bb[None],
                                 method="get_filter")
                w = model.apply(params, w0, tc[None], bb[None], None,
                                filter_optim_iter, method="optimize_filter")
                return model.apply(params, w, te[None],
                                   method="classify")[0, :S, :S]

            score_cur = stop(jax.vmap(one)(cf_tr, cf_c,
                                           batch["train_anno"]))
            feat_p = stop(model.apply(params, bf_p, method="motion_feat"))
            feat_c = stop(model.apply(params, bf_c, method="motion_feat"))

            st0 = model.apply(params, batch["label_prev"],
                              method="init_motion_state")
            fused, st1, aux = model.apply(params, feat_p, feat_c, st0,
                                          score_cur,
                                          method="predict_response")
            loss_clf = lb_hinge_loss(fused, batch["label_cur"])
            is_tgt = (batch["label_cur"] > 0.25).astype(fused.dtype)
            loss_aux = optax.sigmoid_binary_cross_entropy(
                aux["is_target_new"], is_tgt).mean()
            loss = clf_weight * loss_clf + is_target_weight * loss_aux
            return loss, {"Loss/total": loss, "Loss/test_clf": loss_clf,
                          "Loss/is_target": loss_aux}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


# ------------------------------------------------------------------- LWL

def make_lwl_train_step(model, tx):
    """LWL offline training (SegmSeqActor, keep_track_vot2021/ltr/actors/
    segmentation.py:265-516, single-step form): learn the few-shot filter
    on the train frames' masks, segment the test frames, Lovász hinge on
    the decoded scores (lovasz_loss.py; use_lovasz_loss configurations).
    The GN learner is differentiated THROUGH (meta-learning the label
    encoder, residual weights and features), exactly like the reference's
    create_graph=True double-grad.

    Batch: train_images/test_images (B,S,S,3), train_masks/test_masks
    (B,S,S) in {0,1}.
    """
    from mmtrack_tpu.ops.losses import lovasz_hinge_loss

    def train_step(state, batch, rng):
        def loss_fn(params):
            seg = model.apply(params, batch["train_images"],
                              batch["test_images"], batch["train_masks"])
            loss = lovasz_hinge_loss(seg, batch["test_masks"])
            acc = (((seg > 0) == (batch["test_masks"] > 0.5))
                   .astype(jnp.float32).mean())
            # Loss/total is the Trainer's sync/telemetry key
            # (trainer.py::train_epoch) — its absence crashed the lwl CLI
            return loss, {"Loss/total": loss, "Loss/segm": loss, "Acc": acc}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


# ----------------------------------------------------------- Alpha-Refine

def make_ar_train_step(model, tx, corner_weight: float = 1.0,
                       mask_weight: float = 10000.0):
    """Alpha-Refine training (ARcm_Actor / ARmask_Actor, OSTrack/external/
    AR_VOT22/ltr/actors/ARcm.py:5-51 + train_settings/ARcm_seg/*): corner
    loss on the refined box (weight 1) + BCE on the sigmoid mask (weight
    10000 — the shipped ARcm_coco_seg_only_mask recipe trains the mask
    branch with nn.BCELoss). Samples without a mask annotation contribute
    only the corner term (the actor's mask_flag gating), signalled by
    batch['mask_valid'] in {0, 1}.

    Batch: template (B,t,t,3), template_anno (B,4) crop-px xywh, search
    (B,s,s,3), search_anno (B,4) [0,1]-normalized xywh, masks (B,s,s),
    mask_valid (B,).
    """
    def train_step(state, batch, rng):
        def loss_fn(params):
            boxes, mask_logits = model.apply(
                params, batch["template"], batch["template_anno"],
                batch["search"])
            # corner head outputs cxcywh in [0, 1]
            gt = batch["search_anno"]
            gt_xyxy = box_xywh_to_xyxy(gt)
            pred_xyxy = box_cxcywh_to_xyxy(boxes)
            loss_corner = jnp.abs(pred_xyxy - gt_xyxy).mean()

            m = mask_logits[..., 0] if mask_logits.ndim == 4 else mask_logits
            per_px = optax.sigmoid_binary_cross_entropy(m, batch["masks"])
            valid = batch["mask_valid"].reshape(-1, 1, 1)
            n_valid = jnp.maximum(batch["mask_valid"].sum(), 1.0)
            loss_mask = (per_px * valid).mean(axis=(1, 2)).sum() / n_valid
            loss = corner_weight * loss_corner + mask_weight * loss_mask
            return loss, {"Loss/total": loss, "loss_corner": loss_corner,
                          "loss_mask": loss_mask}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


def make_lwl_box_train_step(model, tx):
    """LWL box-encoder training (LWTLBoxActor, keep_track_vot2021/ltr/
    actors/segm_box.py:61-113): the learned box->mask-encoding is trained
    so its decoded mask matches the ground-truth mask (Lovász hinge, the
    use_lovasz_loss objective); everything else is frozen in the
    reference (pass tx masked to the box_label_encoder subtree).

    Batch: train_images (B,S,S,3), train_anno (B,4) image-coord xywh,
    train_masks (B,S,S) in {0,1}.
    """
    from mmtrack_tpu.ops.losses import lovasz_hinge_loss

    def train_step(state, batch, rng):
        def loss_fn(params):
            im = batch["train_images"]
            bf = model.apply(params, im, method="extract_backbone")
            tm = model.apply(params, bf,
                             method="extract_target_model_features")
            raw = model.apply(params, batch["train_anno"], tm, bf,
                              im.shape[1:3], method="mask_from_box")
            loss = lovasz_hinge_loss(raw, batch["train_masks"])
            acc = (((raw > 0) == (batch["train_masks"] > 0.5))
                   .astype(jnp.float32).mean())
            return loss, {"Loss/total": loss, "Stats/acc_box_train": acc}

        lg = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_update(state, tx, lg)

    return train_step


def kys_pair_adapt_batch(batch, S: int, tf: float, feat_stride: int = 16,
                         channels: int = 3):
    """Map a collate_pair batch (KYSPairProcessing: real prev/cur search
    frames sharing one serve-geometry crop) to the KYS train batch. This
    is the faithful form of the reference actor's data
    (tracking_motion.py:51-78: test_images split into [prev, cur], state
    seeded from prev's label): the cost volume sees the TRUE inter-frame
    displacement, and the template stays what it is at serve time — the
    filter source."""
    from mmtrack_tpu.train.dimp_actor import gaussian_label_map

    hS = S // feat_stride
    return {
        "train_images": batch["template"][..., :channels],
        "train_anno": batch["template_anno"] * S,
        "test_prev": batch["search_prev"][..., :channels],
        "test_cur": batch["search"][..., :channels],
        "label_prev": gaussian_label_map(batch["search_prev_anno"] * S, hS,
                                         S, kernel_sz=4),
        "label_cur": gaussian_label_map(batch["search_anno"] * S, hS, S,
                                        kernel_sz=4),
    }


def kys_adapt_batch(batch, S: int, tf: float, feat_stride: int = 16,
                    channels: int = 3):
    """Map the standard sampler batch (template/search/search_anno) to the
    KYS pair batch (tools/train.py --script kys): the target-centered
    template doubles as the PREVIOUS test frame (its box is S/tf centered
    by crop construction); the jittered search is the current frame.
    `channels=6` keeps the full multi-modal stack (a 6-ch DiMP base, e.g.
    grafted from the learning demo's trained DiMPNet)."""
    from mmtrack_tpu.train.dimp_actor import gaussian_label_map

    hS = S // feat_stride
    side = S / tf
    c = (S - side) / 2.0
    anno = jnp.tile(jnp.asarray([c, c, side, side]),
                    (batch["template"].shape[0], 1))
    cur_bb = batch["search_anno"] * S
    return {
        "train_images": batch["template"][..., :channels],
        "train_anno": anno,
        "test_prev": batch["template"][..., :channels],
        "test_cur": batch["search"][..., :channels],
        "label_prev": gaussian_label_map(anno, hS, S, kernel_sz=4),
        "label_cur": gaussian_label_map(cur_bb, hS, S, kernel_sz=4),
    }


def _rect_masks(anno_px, size: int):
    ys = jnp.arange(size, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    x0 = anno_px[:, 0][:, None, None]
    y0 = anno_px[:, 1][:, None, None]
    return (((ys >= y0) & (ys < y0 + anno_px[:, 3][:, None, None]))
            & ((xs >= x0) & (xs < x0 + anno_px[:, 2][:, None, None]))
            ).astype(jnp.float32)


def lwl_adapt_batch(batch, S: int, tf: float, box_mode: bool,
                    channels: int = 3):
    """Map the sampler batch to LWL training batches (tools/train.py
    --script lwl / lwl_box). VOS mask corpora (YouTube-VOS/DAVIS) are
    outside the benchmark's dataset surface; boxes rasterize to masks —
    exactly the supervision the lwl_box variant assumes."""
    side = S / tf
    c = (S - side) / 2.0
    anno_t = jnp.tile(jnp.asarray([c, c, side, side]),
                      (batch["template"].shape[0], 1))
    anno_s = batch["search_anno"] * S
    if box_mode:
        return {"train_images": batch["search"][..., :channels],
                "train_anno": anno_s,
                "train_masks": _rect_masks(anno_s, S)}
    return {"train_images": batch["template"][..., :channels],
            "test_images": batch["search"][..., :channels],
            "train_masks": _rect_masks(anno_t, S),
            "test_masks": _rect_masks(anno_s, S)}
