"""Training-time processing: box jitter, jittered center crop, augmentation.

Rebuild of ViPTProcessing (ViPT/lib/train/data/processing.py:40-138) and the
transform chain of base_functions.py:99-110: joint grayscale(p=.05) +
hflip(p=.5), then per-crop brightness jitter(0.2) + hflip_norm(p=.5) +
ImageNet normalization (duplicated across both modality triplets). Host-side
numpy: variable-size source frames preclude static shapes; the fixed-size
normalized crops are what cross to the device.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from mmtrack_tpu.ops.crop import sample_target_np

MEAN_6 = np.array([0.485, 0.456, 0.406] * 2, np.float32)
STD_6 = np.array([0.229, 0.224, 0.225] * 2, np.float32)


def jitter_box(box: np.ndarray, center_jitter: float, scale_jitter: float,
               rng: np.random.Generator) -> np.ndarray:
    """Exp-scale + center jitter (ViPTProcessing._get_jittered_box,
    processing.py:71-85)."""
    size = box[2:4] * np.exp(rng.standard_normal(2) * scale_jitter)
    max_offset = math.sqrt(size.prod()) * center_jitter
    center = box[0:2] + 0.5 * box[2:4] + max_offset * (rng.random(2) - 0.5)
    return np.concatenate([center - 0.5 * size, size]).astype(np.float32)


def transform_box_to_crop_np(box: np.ndarray, crop_box: np.ndarray,
                             resize_factor: float, crop_sz: int,
                             normalize: bool = True) -> np.ndarray:
    crop_center = crop_box[0:2] + 0.5 * crop_box[2:4]
    box_center = box[0:2] + 0.5 * box[2:4]
    out_center = (crop_sz - 1) / 2 + (box_center - crop_center) * resize_factor
    out_wh = box[2:4] * resize_factor
    out = np.concatenate([out_center - 0.5 * out_wh, out_wh]).astype(np.float32)
    return out / crop_sz if normalize else out


def grayscale_6ch(img: np.ndarray) -> np.ndarray:
    """Grayscale each modality triplet (ToGrayscale, transforms.py:265-282)."""
    out = img.copy()
    for c in range(0, img.shape[2], 3):
        g = cv2.cvtColor(img[..., c:c + 3], cv2.COLOR_RGB2GRAY)
        out[..., c:c + 3] = np.stack([g, g, g], axis=2)
    return out


class ViPTProcessing:
    """data dict -> fixed-size normalized crops + normalized boxes.

    Output: template (Nt, T, T, 6) float32 normalized, template_anno (Nt, 4)
    xywh in [0,1]; same for search; data['valid'] False when a jittered box
    collapses (crop_sz < 1, processing.py:113-120).
    """

    def __init__(self, search_area_factor: dict, output_sz: dict,
                 center_jitter_factor: dict, scale_jitter_factor: dict,
                 joint_grayscale_p: float = 0.05, joint_flip_p: float = 0.5,
                 brightness_jitter: float = 0.2, crop_flip_p: float = 0.5,
                 train_mode: bool = True):
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.center_jitter_factor = center_jitter_factor
        self.scale_jitter_factor = scale_jitter_factor
        self.joint_grayscale_p = joint_grayscale_p
        self.joint_flip_p = joint_flip_p
        self.brightness_jitter = brightness_jitter
        self.crop_flip_p = crop_flip_p
        self.train_mode = train_mode

    def __call__(self, data: dict, rng: np.random.Generator) -> dict:
        # joint transforms: one roll shared by template and search
        if self.train_mode and rng.random() < self.joint_grayscale_p:
            data["template_images"] = [grayscale_6ch(f) for f in data["template_images"]]
            data["search_images"] = [grayscale_6ch(f) for f in data["search_images"]]
        if self.train_mode and rng.random() < self.joint_flip_p:
            for s in ("template", "search"):
                flipped, boxes = [], []
                for f, b in zip(data[s + "_images"], data[s + "_anno"]):
                    W = f.shape[1]
                    flipped.append(np.ascontiguousarray(f[:, ::-1]))
                    # reference flips coordinates as (W-1)-x
                    # (transforms.py:313), so x1 -> (W-1)-(x+w)
                    boxes.append(np.array([(W - 1) - (b[0] + b[2]), b[1],
                                           b[2], b[3]], np.float32))
                data[s + "_images"], data[s + "_anno"] = flipped, np.stack(boxes)

        for s in ("template", "search"):
            jittered = [jitter_box(b, self.center_jitter_factor[s],
                                   self.scale_jitter_factor[s], rng)
                        for b in data[s + "_anno"]]
            for jb in jittered:
                if math.ceil(math.sqrt(max(jb[2] * jb[3], 0.0))
                             * self.search_area_factor[s]) < 1:
                    data["valid"] = False
                    return data

            crops, boxes = [], []
            for frame, jb, gt in zip(data[s + "_images"], jittered, data[s + "_anno"]):
                crop, rf, _ = sample_target_np(frame, jb, self.search_area_factor[s],
                                               output_sz=self.output_sz[s])
                crop_sz_px = math.ceil(math.sqrt(jb[2] * jb[3]) * self.search_area_factor[s])
                box = transform_box_to_crop_np(gt, jb, rf, self.output_sz[s],
                                               normalize=True)
                crop = crop.astype(np.float32) / 255.0
                c = crop.shape[-1]  # 3-channel RGB corpora or 6-channel MM
                if self.train_mode:
                    # brightness jitter (ToTensorAndJitter, transforms.py)
                    factor = rng.uniform(max(0.0, 1 - self.brightness_jitter),
                                         1 + self.brightness_jitter)
                    crop = np.clip(crop * factor, 0.0, 1.0)
                    if rng.random() < self.crop_flip_p:
                        crop = np.ascontiguousarray(crop[:, ::-1])
                        box = np.array([1.0 - (box[0] + box[2]), box[1],
                                        box[2], box[3]], np.float32)
                crop = (crop - MEAN_6[:c]) / STD_6[:c]
                crops.append(crop)
                boxes.append(box)
            data[s + "_images"] = np.stack(crops)
            data[s + "_anno"] = np.stack(boxes)

        data["valid"] = True
        return data


class KYSPairProcessing:
    """Serve-geometry processing for KYS propagation training.

    The KYS actor consumes PAIRS of test frames — the GRU state is seeded
    from the previous frame's label and the current frame's fused response
    is supervised (MotionTrackerActor, keep_track_vot2021/ltr/actors/
    tracking_motion.py:51-78). At serve time the current search crop is
    taken at the position predicted from the previous frame, so prev/cur
    crops share one geometry and the target's in-crop displacement is the
    true inter-frame motion. Reproduce exactly that: crop BOTH search
    frames with the crop box jittered around the PREV frame's target; no
    per-crop flips (independent flips would scramble the prev->cur cost
    volume the propagation module learns from).

    Expects data with 1 template frame and 2 (ordered) search frames;
    emits template/search crops in the ViPTProcessing layout plus
    search_prev_images/search_prev_anno.
    """

    def __init__(self, search_area_factor: float = 5.0, output_sz: int = 288,
                 template_jitter=(0.25, 0.0), prev_jitter=(0.25, 0.05),
                 brightness_jitter: float = 0.2, train_mode: bool = True):
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.template_jitter = template_jitter
        self.prev_jitter = prev_jitter
        self.brightness_jitter = brightness_jitter
        self.train_mode = train_mode

    def _crop(self, frame, crop_box, gt, rng):
        crop, rf, _ = sample_target_np(frame, crop_box,
                                       self.search_area_factor,
                                       output_sz=self.output_sz)
        box = transform_box_to_crop_np(gt, crop_box, rf, self.output_sz,
                                       normalize=True)
        crop = crop.astype(np.float32) / 255.0
        if self.train_mode:
            factor = rng.uniform(max(0.0, 1 - self.brightness_jitter),
                                 1 + self.brightness_jitter)
            crop = np.clip(crop * factor, 0.0, 1.0)
        c = crop.shape[-1]
        return (crop - MEAN_6[:c]) / STD_6[:c], box

    def __call__(self, data: dict, rng: np.random.Generator) -> dict:
        t_img = data["template_images"][0]
        t_box = np.asarray(data["template_anno"][0], np.float32)
        p_img, c_img = data["search_images"][0], data["search_images"][1]
        p_box = np.asarray(data["search_anno"][0], np.float32)
        c_box = np.asarray(data["search_anno"][1], np.float32)

        jt = jitter_box(t_box, *self.template_jitter, rng)
        jp = jitter_box(p_box, *self.prev_jitter, rng)
        for jb in (jt, jp):
            if math.ceil(math.sqrt(max(jb[2] * jb[3], 0.0))
                         * self.search_area_factor) < 1:
                data["valid"] = False
                return data

        crop_t, anno_t = self._crop(t_img, jt, t_box, rng)
        crop_p, anno_p = self._crop(p_img, jp, p_box, rng)
        crop_c, anno_c = self._crop(c_img, jp, c_box, rng)  # SAME crop box

        data["template_images"] = np.stack([crop_t])
        data["template_anno"] = np.stack([anno_t])
        data["search_prev_images"] = np.stack([crop_p])
        data["search_prev_anno"] = np.stack([anno_p])
        data["search_images"] = np.stack([crop_c])
        data["search_anno"] = np.stack([anno_c])
        data["valid"] = True
        return data


def from_config(cfg, train_mode: bool = True) -> ViPTProcessing:
    return ViPTProcessing(
        search_area_factor={"template": cfg.DATA.TEMPLATE.FACTOR,
                            "search": cfg.DATA.SEARCH.FACTOR},
        output_sz={"template": cfg.DATA.TEMPLATE.SIZE,
                   "search": cfg.DATA.SEARCH.SIZE},
        center_jitter_factor={"template": cfg.DATA.TEMPLATE.CENTER_JITTER,
                              "search": cfg.DATA.SEARCH.CENTER_JITTER},
        scale_jitter_factor={"template": cfg.DATA.TEMPLATE.SCALE_JITTER,
                             "search": cfg.DATA.SEARCH.SCALE_JITTER},
        train_mode=train_mode,
    )
