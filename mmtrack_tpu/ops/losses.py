"""Training losses (pure functions over jnp arrays).

Rebuilds ViPT/lib/utils/focal_loss.py:8-63 (penalty-reduced focal, LBHinge)
and the GIoU/L1 objective combination of ViPT/lib/train/actors/vipt.py:86-123.
"""

from __future__ import annotations

import jax.numpy as jnp

from mmtrack_tpu.ops.box import generalized_box_iou


def focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
               alpha: float = 2.0, beta: float = 4.0) -> jnp.ndarray:
    """CenterNet penalty-reduced focal loss, normalized by #positives.

    pred/target: (..., S, S) score maps; target==1 marks positives.
    Matches FocalLoss.forward (ViPT/lib/utils/focal_loss.py:14-35).
    """
    pos = (target == 1.0).astype(pred.dtype)
    neg = (target < 1.0).astype(pred.dtype)

    neg_weights = jnp.power(1.0 - target, beta)
    p = jnp.clip(pred, 1e-12, None)

    pos_loss = jnp.log(p) * jnp.power(1.0 - p, alpha) * pos
    neg_loss = jnp.log(jnp.clip(1.0 - p, 1e-12, None)) * jnp.power(p, alpha) * neg_weights * neg

    num_pos = pos.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def giou_loss(pred_xyxy: jnp.ndarray, target_xyxy: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean (1 - GIoU) and mean IoU over the batch (ViPT box objective)."""
    giou = generalized_box_iou(pred_xyxy, target_xyxy)
    iou, _ = _iou_only(pred_xyxy, target_xyxy)
    return (1.0 - giou).mean(), iou.mean()


def _iou_only(a, b):
    from mmtrack_tpu.ops.box import box_iou
    return box_iou(a, b)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def lovasz_hinge_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Lovász hinge (binary Jaccard surrogate), per image then averaged.

    Rebuild of lovasz_hinge / lovasz_grad (keep_track_vot2021/ltr/models/
    loss/lovasz_loss.py:20-122, per_image=True) — the segmentation
    objective of the LWL training recipes. Static shapes: one argsort +
    cumsum per image.

    logits, labels: (B, H, W); labels in {0, 1}.
    """
    B = logits.shape[0]
    logits = logits.reshape(B, -1)
    labels = labels.reshape(B, -1).astype(logits.dtype)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors, axis=1)
    errors_sorted = jnp.take_along_axis(errors, order, axis=1)
    gt_sorted = jnp.take_along_axis(labels, order, axis=1)
    gts = gt_sorted.sum(axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=1)
    jaccard = 1.0 - intersection / union
    grad = jnp.concatenate([jaccard[:, :1],
                            jaccard[:, 1:] - jaccard[:, :-1]], axis=1)
    return (jnp.maximum(errors_sorted, 0.0) * grad).sum(axis=1).mean()


def lb_hinge_loss(pred: jnp.ndarray, label: jnp.ndarray, threshold: float = 0.05) -> jnp.ndarray:
    """Lower-bound hinge MSE for DiMP classifier training.

    For label < threshold (background), error only counts when the prediction
    is positive; matches LBHinge (ViPT/lib/utils/focal_loss.py:38-63, also
    RGBD/models/DeT ltr target_classifier losses).
    """
    negative = (label < threshold).astype(pred.dtype)
    positive = 1.0 - negative
    pred_eff = negative * jnp.maximum(pred, 0.0) + positive * pred
    return jnp.mean((pred_eff - positive * label) ** 2)
