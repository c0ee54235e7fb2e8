"""Training/eval metric logging.

Rebuild of the reference's stats plumbing (ViPT/lib/train/admin/{stats,
tensorboard}.py + plaintext logfile, ltr_trainer.py:188-191): JSONL event
stream (machine-readable, greppable) + plaintext mirror; TensorBoard isn't in
this image, and JSONL serves the same longitudinal-plot purpose.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    """Append-only JSONL metric sink with an optional plaintext mirror."""

    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{name}.jsonl")
        self.text_path = os.path.join(log_dir, f"{name}.log")

    def write(self, step: int, stats: dict, epoch: int | None = None) -> None:
        rec = {"time": time.time(), "step": step, **(
            {"epoch": epoch} if epoch is not None else {}),
            **{k: float(v) for k, v in stats.items()}}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        with open(self.text_path, "a") as f:
            f.write(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] step {step}: "
                    + ", ".join(f"{k}: {float(v):.5f}" for k, v in stats.items())
                    + "\n")

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.jsonl_path):
            return []
        with open(self.jsonl_path) as f:
            return [json.loads(line) for line in f if line.strip()]
