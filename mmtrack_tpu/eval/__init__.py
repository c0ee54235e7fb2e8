from mmtrack_tpu.eval.metrics import (
    iou_xywh,
    success_curve,
    precision_curve,
    norm_precision_curve,
    success_auc,
    PrReFScore,
    evaluate_ope,
)
