"""Batch loader: sampler -> device-ready batches with background prefetch.

Replaces LTRLoader (ViPT/lib/train/data/loader.py:127-197). The reference
stacks on dim 1 ((frames, B, C, H, W)); with one template/search frame the
TPU layout is simply (B, H, W, 6) NHWC. A single background thread overlaps
host-side sampling/augmentation with device compute (this box has one core;
multi-process workers would not help).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from mmtrack_tpu.data.sampler import TrackingSampler


def collate(samples: list[dict]) -> dict:
    """Stack per-sample crops into a training batch (single-frame mode)."""
    return {
        "template": np.stack([s["template_images"][0] for s in samples]),
        "search": np.stack([s["search_images"][0] for s in samples]),
        "search_anno": np.stack([s["search_anno"][0] for s in samples]),
        "template_anno": np.stack([s["template_anno"][0] for s in samples]),
    }


def collate_pair(samples: list[dict]) -> dict:
    """collate + the previous-search-frame pair emitted by
    KYSPairProcessing (search_prev/search share one crop geometry)."""
    out = collate(samples)
    out["search_prev"] = np.stack([s["search_prev_images"][0]
                                   for s in samples])
    out["search_prev_anno"] = np.stack([s["search_prev_anno"][0]
                                        for s in samples])
    return out


class BatchLoader:
    """Iterates `batches_per_epoch` batches of size `batch_size`."""

    def __init__(self, sampler: TrackingSampler, batch_size: int,
                 batches_per_epoch: int | None = None, prefetch: int = 2,
                 collate_fn=collate):
        from mmtrack_tpu.utils.hostmem import tune_host_allocator

        tune_host_allocator()  # image decode/copy is 10-20x slower without it
        self.sampler = sampler
        self.batch_size = batch_size
        self.batches_per_epoch = (batches_per_epoch if batches_per_epoch is not None
                                  else max(1, len(sampler) // batch_size))
        self.prefetch = prefetch
        self.collate_fn = collate_fn

    def _produce(self, q: queue.Queue, n: int):
        # sampling errors must surface in the consumer, not truncate the
        # epoch silently (torch DataLoader re-raises worker exceptions)
        try:
            for _ in range(n):
                q.put(self.collate_fn([self.sampler.sample()
                                       for _ in range(self.batch_size)]))
            q.put(None)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            q.put(e)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce,
                             args=(q, self.batches_per_epoch), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch

    def __len__(self):
        return self.batches_per_epoch
