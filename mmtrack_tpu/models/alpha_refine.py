"""Alpha-Refine: box -> refined box + segmentation mask plug-in.

Rebuild of the 5x-vendored external/AR module
(RGBD/models/MixFormer_RGBD/external/AR/pytracking/ARcm_seg.py:19-93 +
ltr/models/AR_seg_mask): a refinement network that crops a 2x search region
around a coarse box, correlates target-conditioned template features with
search features, and decodes a corner-refined box plus an upsampled
segmentation mask (the VOT mask-protocol output the MixFormer/OSTrack VOT
entries rely on). Re-designed compactly: ResNet-18 layer2/3 features,
depthwise correlation conditioning, corner head + conv mask decoder; PrRoI
pooling extracts the template target feature like the reference's AR fork.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.models.heads import CornerPredictor
from mmtrack_tpu.models.resnet import resnet18
from mmtrack_tpu.ops.crop import crop_resize
from mmtrack_tpu.ops.prroi import prroi_pool
from mmtrack_tpu.ops.xcorr import depthwise_xcorr


class MaskDecoder(nn.Module):
    """Conv decoder: (H/8) correlation map -> full-resolution mask logits."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((128, 64, 32)):
            B, H, W, _ = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, x.shape[-1]), "bilinear")
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up{i}")(x)
            x = nn.relu(x)
        return nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                       name="out")(x)[..., 0]


class AlphaRefineNet(nn.Module):
    """AR_seg_mask analog: template-conditioned refinement.

    embed(im (B,S,S,3)) -> layer2 features (stride 8).
    refine(t_feat, t_box, s_feat) -> (corner box cxcywh [0,1], mask logits).
    """
    input_size: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = resnet18(self.dtype)
        self.adjust = nn.Conv(64, (1, 1), name="adjust")
        self.corner_head = CornerPredictor(channel=64,
                                           feat_sz=self.input_size // 8,
                                           stride=8, dtype=self.dtype,
                                           name="corner_head")
        self.mask_decoder = MaskDecoder(dtype=self.dtype, name="mask_decoder")
        self.fuse = nn.Conv(64, (3, 3), padding="SAME", name="fuse")

    def embed(self, im: jnp.ndarray) -> jnp.ndarray:
        f = self.backbone(im, ("layer2",))["layer2"]  # stride 8, 128ch
        return self.adjust(f)

    def target_kernel(self, t_feat: jnp.ndarray, t_box_xywh: jnp.ndarray) -> jnp.ndarray:
        """PrRoI-pool the target region to a 3x3 correlation kernel."""
        B = t_feat.shape[0]
        xyxy = jnp.concatenate([t_box_xywh[:, :2],
                                t_box_xywh[:, :2] + t_box_xywh[:, 2:]], axis=1)
        rois = jnp.concatenate([jnp.arange(B, dtype=jnp.float32)[:, None], xyxy],
                               axis=1)
        return prroi_pool(t_feat, rois, 3, 3, 1 / 8)  # (B, 3, 3, 64)

    def refine(self, kernel: jnp.ndarray, s_feat: jnp.ndarray):
        """kernel (B,3,3,C), s_feat (B,h,w,C) -> (boxes cxcywh [0,1], mask)."""
        corr = jax.vmap(lambda k, f: depthwise_xcorr(
            k, jnp.pad(f[None], ((0, 0), (1, 1), (1, 1), (0, 0)))[0][None])[0]
        )(kernel, s_feat)
        fused = nn.relu(self.fuse(jnp.concatenate([s_feat, corr], axis=-1)))
        xyxy = self.corner_head(fused)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        boxes = jnp.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                           xyxy[:, 3] - xyxy[:, 1]], axis=1)
        mask = self.mask_decoder(fused)
        return boxes, mask

    def __call__(self, template, t_box_xywh, search):
        t_feat = self.embed(template)
        s_feat = self.embed(search)
        k = self.target_kernel(t_feat, t_box_xywh)
        return self.refine(k, s_feat)


@dataclass(frozen=True)
class ARRuntime:
    search_factor: float = 2.0
    input_size: int = 256
    mask_threshold: float = 0.5


class ARcmSeg:
    """Reference-compatible plug-in API (ARcm_seg.initialize/get_mask,
    external/AR/pytracking/ARcm_seg.py:19-93): attach to any tracker to turn
    its boxes into masks + refined boxes."""

    def __init__(self, model: AlphaRefineNet, params,
                 runtime: ARRuntime | None = None):
        self.model = model
        self.params = params
        self.rt = runtime or ARRuntime()
        self._init_fn = jax.jit(self._init_impl)
        self._refine_fn = jax.jit(self._refine_impl)
        self.kernel = None

    def _normalize(self, crop):
        # reference ARcm_seg.img_preprocess: ((img/255) - mean) / std
        # (ARcm_seg.py:24-25,81) — the ResNet trunk expects ImageNet stats
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        return ((crop / 255.0 - mean) / std)[None]

    def _init_impl(self, params, frame, box):
        crop, rf = crop_resize(frame, box, self.rt.search_factor,
                               self.rt.input_size)
        t_feat = self.model.apply(params, self._normalize(crop),
                                  method=AlphaRefineNet.embed)
        # target box in crop coords
        S = self.rt.input_size
        cw = box[2] * rf
        ch = box[3] * rf
        t_box = jnp.asarray([(S - 1) / 2 - cw / 2, (S - 1) / 2 - ch / 2, cw, ch])
        return self.model.apply(params, t_feat, t_box[None],
                                method=AlphaRefineNet.target_kernel)

    def _refine_impl(self, params, kernel, frame, box):
        crop, rf = crop_resize(frame, box, self.rt.search_factor,
                               self.rt.input_size)
        s_feat = self.model.apply(params, self._normalize(crop),
                                  method=AlphaRefineNet.embed)
        boxes, mask = self.model.apply(params, kernel, s_feat,
                                       method=AlphaRefineNet.refine)
        return boxes[0], mask[0], rf

    def initialize(self, frame: np.ndarray, box_xywh) -> None:
        self.kernel = self._init_fn(self.params, jnp.asarray(frame),
                                    jnp.asarray(box_xywh, dtype=jnp.float32))

    def refine(self, frame: np.ndarray, box_xywh):
        """-> (refined box xywh in image coords, mask (H, W) float in [0,1]
        mapped back to the full frame)."""
        frame = jnp.asarray(frame)
        box = jnp.asarray(np.asarray(box_xywh, np.float32))
        pred, mask_crop, rf = self._refine_fn(self.params, self.kernel,
                                              frame, box)
        S = self.rt.input_size
        pred_img = np.asarray(pred) * S / float(rf)
        cx_prev = float(box[0] + box[2] / 2)
        cy_prev = float(box[1] + box[3] / 2)
        half = 0.5 * S / float(rf)
        cx = pred_img[0] + cx_prev - half
        cy = pred_img[1] + cy_prev - half
        refined = [cx - pred_img[2] / 2, cy - pred_img[3] / 2,
                   pred_img[2], pred_img[3]]

        # paste the crop mask back into frame coordinates
        import cv2
        H, W = frame.shape[0], frame.shape[1]
        prob = np.asarray(jax.nn.sigmoid(mask_crop), np.float32)
        crop_sz = S / float(rf)
        x1 = int(round(cx_prev - crop_sz / 2))
        y1 = int(round(cy_prev - crop_sz / 2))
        full = np.zeros((H, W), np.float32)
        resized = cv2.resize(prob, (max(int(round(crop_sz)), 1),) * 2)
        xs, ys = max(0, x1), max(0, y1)
        xe = min(W, x1 + resized.shape[1])
        ye = min(H, y1 + resized.shape[0])
        if xe > xs and ye > ys:
            full[ys:ye, xs:xe] = resized[ys - y1:ye - y1, xs - x1:xe - x1]
        return refined, full
