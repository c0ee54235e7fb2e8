from mmtrack_tpu.ops.window import hann1d, hann2d, gauss_label_2d
from mmtrack_tpu.ops.box import (
    box_xywh_to_xyxy,
    box_xyxy_to_xywh,
    box_cxcywh_to_xywh,
    box_xywh_to_cxcywh,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou,
    generalized_box_iou,
    clip_box,
    transform_image_to_crop,
)
from mmtrack_tpu.ops.heatmap import gaussian_radius, generate_heatmap
from mmtrack_tpu.ops.ce import candidate_elimination, recover_search_tokens, ce_keep_lengths
from mmtrack_tpu.ops.losses import focal_loss, giou_loss, l1_loss, lb_hinge_loss
from mmtrack_tpu.ops.crop import crop_resize, crop_resize_normalized, sample_target_np
