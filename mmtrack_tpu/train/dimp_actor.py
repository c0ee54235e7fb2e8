"""DiMP-family training objective.

Rebuild of DiMPActor (RGBD/models/DeT/ltr/actors/tracking.py:7-67): the loss
couples the IoUNet proposal-regression branch (MSE between predicted and
ground-truth proposal IoUs) with LBHinge classification of the target scores
against a Gaussian label centered on the ground truth. Proposal generation
follows the LTR train settings (jittered boxes with known IoUs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmtrack_tpu.ops.box import box_xywh_to_xyxy, box_iou
from mmtrack_tpu.ops.losses import lb_hinge_loss


def gaussian_label_map(bb_xywh: jnp.ndarray, score_sz: int, image_sz: int,
                       sigma_factor: float = 0.25, kernel_sz: int = 4) -> jnp.ndarray:
    """Gaussian classification label centered at the target (ltr
    processing 'gauss' label; sigma = sigma_factor * base size)."""
    feat_stride = image_sz / (score_sz - (kernel_sz + 1) % 2)
    centers = (bb_xywh[:, :2] + bb_xywh[:, 2:] / 2) / feat_stride
    offset = (kernel_sz % 2) / 2.0
    cy = centers[:, 1] - offset
    cx = centers[:, 0] - offset
    sigma = sigma_factor * jnp.sqrt(jnp.prod(bb_xywh[:, 2:], axis=1)) / feat_stride
    ys = jnp.arange(score_sz, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(score_sz, dtype=jnp.float32)[None, None, :]
    d2 = (ys - cy[:, None, None]) ** 2 + (xs - cx[:, None, None]) ** 2
    return jnp.exp(-0.5 * d2 / jnp.maximum(sigma[:, None, None] ** 2, 1e-6))


def make_proposals(rng, gt_xywh: jnp.ndarray, n_proposals: int = 8,
                   sigma: float = 0.25) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered proposals + their true IoUs (ATOM proposal sampling analog)."""
    B = gt_xywh.shape[0]
    noise = jax.random.normal(rng, (B, n_proposals, 4)) * sigma
    scale = jnp.concatenate([gt_xywh[:, 2:], gt_xywh[:, 2:]], axis=1)
    proposals = gt_xywh[:, None] + noise * scale[:, None]
    proposals = proposals.at[..., 2:].set(jnp.maximum(proposals[..., 2:], 1.0))
    iou, _ = box_iou(box_xywh_to_xyxy(proposals),
                     box_xywh_to_xyxy(gt_xywh)[:, None])
    return proposals, iou


def make_dimp_train_step(model, tx, *, image_sz: int = 288,
                         loss_weights=(1.0, 100.0)):
    """train_step(state, batch, rng) for the DiMP family.

    batch: template/search (B, S, S, C) normalized crops with
    template_anno/search_anno normalized xywh (the shared loader format);
    boxes are scaled to crop pixels for the DiMP objective.
    """
    import optax

    from mmtrack_tpu.train.train_step import TrainState

    def train_step(state: TrainState, batch: dict, rng):
        dimp_batch = {
            "train_im": batch["template"],
            "test_im": batch["search"],
            "train_bb": batch["template_anno"] * image_sz,
            "test_bb": batch["search_anno"] * image_sz,
        }

        def loss_fn(params):
            return dimp_forward_and_loss(model, params, dimp_batch, rng,
                                         image_sz=image_sz,
                                         loss_weights=loss_weights)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), stats

    return train_step


def per_sequence_scores(model, params, train_clf, test_clf, train_bb,
                        num_iter=None):
    """Per-sequence filter init + optimization + classification.

    The reference keeps (num_images, num_sequences) axes separate and
    learns ONE filter per sequence from its own train frames
    (linear_filter.py LinearFilter.forward; initializer pools per
    sequence). Our FilterInitializer/optimizer implement exactly the
    single-sequence form (mean over that sequence's samples) — so a
    multi-SEQUENCE batch must vmap over the batch axis, not feed it as
    samples (which would average one filter across different targets).

    train_clf/test_clf (B, H, W, C), train_bb (B, 4) -> scores (B, s, s).
    """
    def one(tc, te, bb):
        w0 = model.apply(params, tc[None], bb[None], method="get_filter")
        w = model.apply(params, w0, tc[None], bb[None], None, num_iter,
                        method="optimize_filter")
        return model.apply(params, w, te[None], method="classify")[0]

    return jax.vmap(one)(train_clf, test_clf, train_bb)


def dimp_forward_and_loss(model, params, batch: dict, rng, *,
                          image_sz: int = 288,
                          loss_weights=(1.0, 100.0)) -> tuple[jnp.ndarray, dict]:
    """batch: train_im/test_im (B, S, S, C), train_bb/test_bb (B, 4) image
    coords. Returns (loss, stats); weights = (iou_w, clf_w) per the LTR
    train settings (DeT_DiMP50_Max.py objective weights)."""
    proposals, gt_iou = make_proposals(rng, batch["test_bb"])

    def fwd(m, train_im, test_im, train_bb, props):
        train_feat = m.extract_backbone(train_im)
        test_feat = m.extract_backbone(test_im)
        iou_pred = m.bb_regressor(
            [train_feat["layer2"], train_feat["layer3"]],
            [test_feat["layer2"], test_feat["layer3"]], train_bb, props)
        return (m.extract_classification_feat(train_feat),
                m.extract_classification_feat(test_feat), iou_pred)

    train_clf, test_clf, iou_pred = model.apply(
        params, batch["train_im"], batch["test_im"], batch["train_bb"],
        proposals, method=fwd)
    scores = per_sequence_scores(model, params, train_clf, test_clf,
                                 batch["train_bb"])
    out = {"target_scores": scores, "iou_pred": iou_pred}

    iou_w, clf_w = loss_weights
    # the reference regresses IoUs mapped to [-1, 1] (ltr processing.py:
    # gt_iou = gt_iou * 2 - 1); the 1:100 iou:clf weight balance is
    # calibrated for that scale and the tracker's ascent refinement
    # consumes the same convention
    loss_iou = jnp.mean((out["iou_pred"] - (gt_iou * 2.0 - 1.0)) ** 2)

    score_sz = out["target_scores"].shape[-1]
    label = gaussian_label_map(batch["test_bb"], score_sz, image_sz)
    loss_clf = lb_hinge_loss(out["target_scores"], label)

    loss = iou_w * loss_iou + clf_w * loss_clf
    return loss, {"Loss/total": loss, "Loss/iou": loss_iou,
                  "Loss/clf": loss_clf}
