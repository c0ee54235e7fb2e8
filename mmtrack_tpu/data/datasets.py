"""Training video datasets: multi-modal sequence access for the sampler.

Rebuilds the BaseVideoDataset surface (get_frames/seq_info,
ViPT/lib/train/dataset/depthtrack.py:138-158, lasher.py, visevent.py) for the
three ViPT training corpora plus a synthetic in-memory dataset (this
environment ships no data). Frames are composed HxWx6 via
mmtrack_tpu.data.composition on the host.
"""

from __future__ import annotations

import os

import numpy as np

from mmtrack_tpu.data.composition import get_x_frame
from mmtrack_tpu.data.synthetic import make_synthetic_sequence


class VideoDataset:
    """Protocol: named, indexable video dataset of multi-modal sequences."""

    name: str = "base"
    is_video: bool = True

    def num_sequences(self) -> int:
        raise NotImplementedError

    def seq_info(self, seq_id: int) -> dict:
        """-> {'bbox': (N,4) xywh, 'visible': (N,) bool, 'valid': (N,) bool}"""
        raise NotImplementedError

    def get_frames(self, seq_id: int, frame_ids: list[int]):
        """-> (list of (H,W,6) uint8 frames, (n,4) float boxes)"""
        raise NotImplementedError

    def __len__(self) -> int:
        return self.num_sequences()


def _visibility_from_boxes(bbox: np.ndarray, min_px: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """The reference applies the min-size threshold to VALID itself
    (depthtrack.py:102 valid = (w>10)&(h>10); visevent.py:90 w>5) — valid
    gates stark-mode extra-template sampling, so it must not be looser."""
    valid = (np.isfinite(bbox).all(axis=1) & (bbox[:, 2] > min_px)
             & (bbox[:, 3] > min_px))
    visible = valid.copy()
    return valid, visible


class _DirListDataset(VideoDataset):
    """Shared machinery: root/<seq>/{rgb_dir,x_dir} + per-seq gt file."""

    rgb_dir: str
    x_dir: str
    rgb_ext: str
    x_ext: str
    gt_file: str
    gt_delim: str
    dtype: str
    depth_clip: bool = False
    # the reference marks targets smaller than 10px as occluded for
    # DepthTrack-style data (depthtrack.py:95-104)
    min_visible_px: float = 0.0

    def __init__(self, root: str, sequences: list[str] | None = None):
        self.root = root
        if sequences is None:
            sequences = sorted(s for s in os.listdir(root)
                               if os.path.isdir(os.path.join(root, s)))
        self.sequences = sequences
        self._info_cache: dict[int, dict] = {}

    def num_sequences(self) -> int:
        return len(self.sequences)

    def _seq_path(self, seq_id: int) -> str:
        return os.path.join(self.root, self.sequences[seq_id])

    def seq_info(self, seq_id: int) -> dict:
        if seq_id not in self._info_cache:
            gt = np.loadtxt(os.path.join(self._seq_path(seq_id), self.gt_file),
                            delimiter=self.gt_delim)
            gt = np.atleast_2d(gt)
            valid, visible = _visibility_from_boxes(gt, self.min_visible_px)
            self._info_cache[seq_id] = {"bbox": gt, "valid": valid, "visible": visible}
        return self._info_cache[seq_id]

    def _frame_paths(self, seq_id: int):
        p = self._seq_path(seq_id)
        rgb = sorted(os.path.join(p, self.rgb_dir, f)
                     for f in os.listdir(os.path.join(p, self.rgb_dir))
                     if f.endswith(self.rgb_ext))
        x = sorted(os.path.join(p, self.x_dir, f)
                   for f in os.listdir(os.path.join(p, self.x_dir))
                   if f.endswith(self.x_ext))
        return rgb, x

    def get_frames(self, seq_id: int, frame_ids: list[int]):
        rgb, x = self._frame_paths(seq_id)
        info = self.seq_info(seq_id)
        frames = [get_x_frame(rgb[i], x[i], self.dtype, depth_clip=self.depth_clip)
                  for i in frame_ids]
        boxes = info["bbox"][frame_ids].astype(np.float32)
        return frames, boxes


class DepthTrackTrain(_DirListDataset):
    """DepthTrack train split: color/ + depth/ dirs, rgbcolormap composition
    (ViPT/lib/train/dataset/depthtrack.py:13-158, dtype='rgbcolormap')."""
    name = "DepthTrack_train"
    rgb_dir, x_dir = "color", "depth"
    rgb_ext, x_ext = ".jpg", ".png"
    gt_file, gt_delim = "groundtruth.txt", ","
    dtype = "rgbcolormap"
    depth_clip = True  # depthtrack.py:123 get_x_frame(..., depth_clip=True)
    min_visible_px = 10.0


class LasHeRTrain(_DirListDataset):
    """LasHeR train split: visible/ + infrared/, rgbrgb composition
    (ViPT/lib/train/dataset/lasher.py:25-95, dtype='rgbrgb')."""
    name = "LasHeR_all"
    rgb_dir, x_dir = "visible", "infrared"
    rgb_ext, x_ext = ".jpg", ".jpg"
    gt_file, gt_delim = "visible.txt", ","
    dtype = "rgbrgb"


class VisEventTrain(_DirListDataset):
    """VisEvent train split: vis_imgs/ + event_imgs/, rgbrgb composition
    (ViPT/lib/train/dataset/visevent.py:19-118). Visibility honours
    absent_label.txt (visevent.py:68-92: visible = absent & (w>5)&(h>5));
    event paths derive from the vis filename (visevent.py:107 — frames
    start irregularly, so independent directory sorts can misalign)."""
    name = "VisEvent_train"
    rgb_dir, x_dir = "vis_imgs", "event_imgs"
    rgb_ext, x_ext = ".bmp", ".bmp"
    gt_file, gt_delim = "groundtruth.txt", ","
    dtype = "rgbrgb"
    min_visible_px = 5.0

    def seq_info(self, seq_id: int) -> dict:
        info = super().seq_info(seq_id)
        if "absent_applied" not in info:
            f = os.path.join(self._seq_path(seq_id), "absent_label.txt")
            if os.path.exists(f):
                absent = np.atleast_1d(
                    np.loadtxt(f, dtype=np.int64)).astype(bool)
                n = min(len(absent), len(info["visible"]))
                info["visible"] = info["visible"].copy()
                info["visible"][:n] &= absent[:n]
            info["absent_applied"] = True
        return info

    def _frame_paths(self, seq_id: int):
        p = self._seq_path(seq_id)
        rgb = sorted(os.path.join(p, self.rgb_dir, f)
                     for f in os.listdir(os.path.join(p, self.rgb_dir))
                     if f.endswith(self.rgb_ext))
        x = [q.replace(self.rgb_dir, self.x_dir) for q in rgb]
        return rgb, x


class SyntheticVideoDataset(VideoDataset):
    """In-memory moving-target sequences; replaces on-disk data for tests."""

    name = "Synthetic"

    def __init__(self, n_sequences: int = 4, n_frames: int = 30,
                 height: int = 120, width: int = 160,
                 modality: str = "both", distractor: bool = False):
        # "both" (default): target salient in RGB and aux; "rgb_only":
        # aux channels are pure background (an RGB foundation corpus, the
        # OSTrack-pretrain analog); "aux_only": target invisible in RGB —
        # the ViPT new-modality setting (depth/thermal/event carries it).
        # distractor: every sequence carries an identical-looking second
        # object crossing the target (the KYS/KeepTrack training setting)
        kw = {"both": {}, "rgb_only": {"target_aux": None},
              "aux_only": {"target_rgb": None}}[modality]
        self._seqs = []
        for i in range(n_sequences):
            frames, gt = make_synthetic_sequence(
                n_frames=n_frames, height=height, width=width,
                box0=(20.0 + 10 * i, 15.0 + 5 * i, 30.0, 24.0),
                velocity=(2.0 + i, 1.5), seed=i, distractor=distractor, **kw)
            self._seqs.append((frames, gt))

    def num_sequences(self) -> int:
        return len(self._seqs)

    def seq_info(self, seq_id: int) -> dict:
        gt = self._seqs[seq_id][1]
        valid, visible = _visibility_from_boxes(gt)
        return {"bbox": gt, "valid": valid, "visible": visible}

    def get_frames(self, seq_id: int, frame_ids: list[int]):
        frames, gt = self._seqs[seq_id]
        return [frames[i] for i in frame_ids], gt[frame_ids].astype(np.float32)


def _rgb_registry():
    from mmtrack_tpu.data.rgb_datasets import (COCOSeq, COCOSeqDepth, GOT10k,
                                               Got10kDepth, ImageNetVID,
                                               LaSOT, LaSOTDepth, TrackingNet)
    return {
        "LASOT": LaSOT,
        "GOT10K_vottrain": GOT10k,
        "GOT10K_votval": GOT10k,
        "GOT10K_train_full": GOT10k,
        "TRACKINGNET": TrackingNet,
        "COCO17": COCOSeq,
        "IMAGENETVID": ImageNetVID,
        # depth-augmented RGB corpora (DeT/ltr/dataset/*_depth.py; the
        # MixFormer_RGBD training mix, baseline_large.yaml DATASETS_NAME)
        "GOT10K_Depth": Got10kDepth,
        "LASOT_Depth": LaSOTDepth,
        "COCO17_Depth": COCOSeqDepth,
    }


TRAIN_DATASET_REGISTRY = {
    "DepthTrack_train": DepthTrackTrain,
    "DepthTrack_val": DepthTrackTrain,
    "LasHeR_all": LasHeRTrain,
    "LasHeR_val": LasHeRTrain,
    "VisEvent_train": VisEventTrain,
    "VisEvent_val": VisEventTrain,
    "Synthetic": SyntheticVideoDataset,
}


def names2datasets(names: list[str], roots: dict[str, str]) -> list[VideoDataset]:
    """Dataset registry lookup (names2datasets analog,
    base_functions.py:29-96). `roots` maps dataset name -> directory."""
    registry = dict(TRAIN_DATASET_REGISTRY)
    registry.update(_rgb_registry())
    out = []
    for n in names:
        if n == "Synthetic":
            out.append(SyntheticVideoDataset())
            continue
        if n not in registry:
            raise KeyError(f"unknown training dataset '{n}'")
        out.append(registry[n](roots[n]))
    return out
