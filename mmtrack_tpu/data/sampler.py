"""TrackingSampler: dataset-weighted causal frame-pair sampling.

Rebuild of ViPT/lib/train/data/sampler.py:12-170: pick a dataset by ratio,
pick a sequence, sample template frame(s) then a later search frame within a
growing gap window, visible frames only, infinite retry on invalid samples.
Pure numpy + an explicit np.random.Generator (per-host seeding replaces
per-rank init_seeds, run_training.py:44-49).
"""

from __future__ import annotations

import numpy as np

from mmtrack_tpu.data.datasets import VideoDataset


class TrackingSampler:
    def __init__(self, datasets: list[VideoDataset], p_datasets: list[float] | None,
                 samples_per_epoch: int, max_gap: int,
                 num_search_frames: int = 1, num_template_frames: int = 1,
                 processing=None, frame_sample_mode: str = "causal",
                 seed: int = 0):
        self.datasets = datasets
        if p_datasets is None:
            p_datasets = [len(d) for d in datasets]
        total = float(sum(p_datasets))
        self.p_datasets = [p / total for p in p_datasets]
        self.samples_per_epoch = samples_per_epoch
        self.max_gap = max_gap
        self.num_search_frames = num_search_frames
        self.num_template_frames = num_template_frames
        self.processing = processing
        self.frame_sample_mode = frame_sample_mode
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.samples_per_epoch

    def _sample_visible_ids(self, visible: np.ndarray, num_ids: int = 1,
                            min_id=None, max_id=None,
                            allow_invisible: bool = False):
        if num_ids == 0:
            return []
        lo = 0 if min_id is None or min_id < 0 else int(min_id)
        hi = len(visible) if max_id is None or max_id > len(visible) else int(max_id)
        if hi <= lo:
            return None
        if allow_invisible:
            valid = np.arange(lo, hi)
        else:
            valid = np.nonzero(visible[lo:hi])[0] + lo
        if valid.size == 0:
            return None
        return list(self.rng.choice(valid, size=num_ids, replace=True))

    def _sample_seq(self, dataset: VideoDataset):
        """Random sequence with enough visible frames — the reference's
        exact rule (sampler.py:273): visible.sum() > 2*(search+template)
        AND len(visible) >= 20, waived for non-video datasets."""
        need = 2 * (self.num_search_frames + self.num_template_frames)
        for _ in range(1000):
            seq_id = int(self.rng.integers(0, dataset.num_sequences()))
            info = dataset.seq_info(seq_id)
            visible = info["visible"]
            ok = visible.sum() > need and len(visible) >= 20
            if ok or not dataset.is_video:
                return seq_id, visible, info
        raise RuntimeError(f"no usable sequence found in {dataset.name}")

    def _causal_ids(self, visible: np.ndarray):
        """Causal sampling with gap growing (sampler.py:123-139)."""
        template_ids = search_ids = None
        gap = 0
        while search_ids is None:
            base = self._sample_visible_ids(
                visible, 1, self.num_template_frames - 1,
                len(visible) - self.num_search_frames)
            if base is None:
                return None, None
            prev = self._sample_visible_ids(
                visible, self.num_template_frames - 1,
                base[0] - self.max_gap - gap, base[0])
            if prev is None:
                gap += 5
                continue
            template_ids = base + prev
            search_ids = self._sample_visible_ids(
                visible, self.num_search_frames, template_ids[0] + 1,
                template_ids[0] + self.max_gap + gap)
            if search_ids is not None and self.num_search_frames > 1:
                # multi-search consumers (the KYS prev/cur pair) need the
                # frames time-ordered; a no-op for the single-frame mode
                search_ids = sorted(search_ids)
            gap += 5
            if gap > 100 * self.max_gap:  # bail on degenerate sequences
                return None, None
        return template_ids, search_ids

    def _gap_list(self):
        g = self.max_gap
        return list(g) if isinstance(g, (list, tuple)) else [g]

    def _trident_ids(self, visible: np.ndarray, allow_invisible: bool,
                     valid: np.ndarray | None = None):
        """'trident'/'trident_pro'/'stark' sampling (sampler.py:298-345):
        initial template + search anywhere, then one extra template per
        max_gap entry drawn from the window between them. stark mode draws
        extras from the `valid` flags instead of `visible`."""
        extra_pool = visible if valid is None else valid
        for _ in range(100):
            t1 = self._sample_visible_ids(visible, 1)
            s = self._sample_visible_ids(visible, 1)
            if t1 is None or s is None:
                return None, None
            extras = []
            ok = True
            for gap in self._gap_list():
                if t1[0] >= s[0]:
                    lo, hi = s[0], s[0] + gap
                else:
                    lo, hi = s[0] - gap, s[0]
                f = self._sample_visible_ids(extra_pool, 1, lo, hi,
                                             allow_invisible=allow_invisible)
                if f is None:
                    ok = False
                    break
                extras += f
            if ok:
                return t1 + extras, s
        return None, None

    def sample(self) -> dict:
        """One training sample (getitem analog, sampler.py:101-170)."""
        while True:
            dataset = self.datasets[int(self.rng.choice(len(self.datasets),
                                                        p=self.p_datasets))]
            seq_id, visible, info = self._sample_seq(dataset)

            if dataset.is_video:
                if self.frame_sample_mode in ("trident", "trident_pro"):
                    template_ids, search_ids = self._trident_ids(
                        visible, self.frame_sample_mode == "trident_pro")
                elif self.frame_sample_mode == "stark":
                    template_ids, search_ids = self._trident_ids(
                        visible, False, info.get("valid", visible))
                else:
                    template_ids, search_ids = self._causal_ids(visible)
                if template_ids is None:
                    continue
            else:
                template_ids = [0] * self.num_template_frames
                search_ids = [0] * self.num_search_frames

            try:
                t_frames, t_boxes = dataset.get_frames(seq_id, template_ids)
                s_frames, s_boxes = dataset.get_frames(seq_id, search_ids)

                data = {
                    "template_images": t_frames,
                    "template_anno": t_boxes,
                    "search_images": s_frames,
                    "search_anno": s_boxes,
                    "dataset": dataset.name,
                }
                if self.processing is not None:
                    # processing stays INSIDE the retry guard: a jittered
                    # crop can land fully outside the image and raise in
                    # cv2 — the reference's bare try wraps dataset access
                    # AND self.processing (sampler.py:151-169)
                    data = self.processing(data, self.rng)
                    if not data.get("valid", False):
                        continue
            except Exception:
                continue  # data-level fault tolerance (sampler.py:151-169)
            return data
