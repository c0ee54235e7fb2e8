"""Trainer: epoch loop, telemetry, orbax checkpointing, fail-safe restart.

Rebuild of LTRTrainer/BaseTrainer (ViPT/lib/train/trainers/base_trainer.py:
62-230, ltr_trainer.py:61-191): per-stat running averages with FPS/data-time
telemetry, checkpoint every SAVE_EPOCH_INTERVAL + last N retention, resume
from latest (including optimizer state and epoch), and crash-restart
(fail_safe) that reloads the previous checkpoint and continues.
"""

from __future__ import annotations

import os
import time
import traceback

import jax
import numpy as np
import orbax.checkpoint as ocp

from mmtrack_tpu.train.train_step import TrainState


class AverageMeter:
    """Running average (admin/stats.py analog)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class CheckpointManager:
    """Atomic checkpoints with retention (base_trainer.py:93-148 semantics);
    orbax already writes tmp-then-rename."""

    def __init__(self, directory: str, save_interval: int = 1, keep_last: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep_last,
                                                 create=True))

    def should_save(self, epoch: int, total_epochs: int) -> bool:
        return epoch % self.save_interval == 0 or epoch == total_epochs

    def save(self, epoch: int, state: TrainState) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, epoch: int, template: TrainState) -> TrainState:
        return self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))


class Trainer:
    """Epoch loop around a jitted train_step.

    train(max_epochs, load_latest=True, fail_safe=True) mirrors
    BaseTrainer.train(base_trainer.py:62-111): resume from the newest
    checkpoint, and on an exception mid-epoch reload the last checkpoint and
    retry instead of dying.
    """

    def __init__(self, train_step, state: TrainState, loader,
                 checkpoints: CheckpointManager | None = None,
                 rng_seed: int = 0, print_interval: int = 50,
                 log_fn=print, val_loader=None, val_step=None,
                 val_epoch_interval: int = 0,
                 step_for_epoch=None, tb_writer=None):
        """step_for_epoch(epoch) -> train_step lets the caller swap the
        compiled step on schedule boundaries (the CE keep-rate anneal changes
        static token counts; quantized to a few recompiles —
        SURVEY.md section 7.2)."""
        self.train_step = train_step
        self.state = state
        self.loader = loader
        self.checkpoints = checkpoints
        self.rng = jax.random.PRNGKey(rng_seed)
        self.print_interval = print_interval
        self.log = log_fn
        self.val_loader = val_loader
        self.val_step = val_step
        self.val_epoch_interval = val_epoch_interval
        self.step_for_epoch = step_for_epoch
        # optional utils/tb.TensorboardWriter (ltr_trainer.py:214-218
        # write_epoch analog); JSONL logging stays primary
        self.tb_writer = tb_writer
        self.epoch = 0
        self.stats_history: list[dict] = []
        self.val_history: list[dict] = []

    def _resume(self) -> None:
        if self.checkpoints is None:
            return
        latest = self.checkpoints.latest_epoch()
        if latest is not None:
            self.state = self.checkpoints.restore(latest, self.state)
            self.epoch = latest
            self.log(f"resumed from checkpoint epoch {latest}")

    def train_epoch(self) -> dict:
        meters: dict[str, AverageMeter] = {}
        data_time = AverageMeter()
        step_time = AverageMeter()
        t_prev = time.perf_counter()
        n_frames = 0
        for i, batch in enumerate(self.loader):
            t_data = time.perf_counter()
            data_time.update(t_data - t_prev)
            self.rng, sub = jax.random.split(self.rng)
            self.state, stats = self.train_step(self.state, batch, sub)
            jax.block_until_ready(stats["Loss/total"])
            t_step = time.perf_counter()
            step_time.update(t_step - t_data)
            t_prev = t_step
            n_frames += len(batch["search"])
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            if (i + 1) % self.print_interval == 0:
                fps = n_frames / max(sum(m.sum for m in (data_time, step_time)), 1e-9)
                self.log(f"epoch {self.epoch} [{i + 1}/{len(self.loader)}] "
                         + ", ".join(f"{k}: {m.avg:.4f}" for k, m in meters.items())
                         + f", fps: {fps:.1f}, data: {data_time.avg * 1e3:.0f}ms"
                         + f", step: {step_time.avg * 1e3:.0f}ms")
        return {k: m.avg for k, m in meters.items()}

    def validate(self) -> dict:
        """Validation pass (LTRTrainer val-loader cycle, epoch_interval
        semantics, base_functions.py:165-168).

        `val_step` must NOT donate its state argument (build it with
        shard_train_step(step, mesh, donate=False)): the returned state is
        discarded here, so a donating step would delete the live training
        state and the next epoch would raise 'Array has been deleted'."""
        meters: dict[str, AverageMeter] = {}
        for batch in self.val_loader:
            self.rng, sub = jax.random.split(self.rng)
            _, stats = self.val_step(self.state, batch, sub)
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
        out = {f"val/{k}": m.avg for k, m in meters.items()}
        self.log(f"epoch {self.epoch} validation: "
                 + ", ".join(f"{k}: {v:.4f}" for k, v in out.items()))
        return out

    def train(self, max_epochs: int, load_latest: bool = True,
              fail_safe: bool = True) -> None:
        if load_latest:
            self._resume()
        num_tries = 10 if fail_safe else 1
        for attempt in range(num_tries):
            try:
                while self.epoch < max_epochs:
                    self.epoch += 1
                    if self.step_for_epoch is not None:
                        self.train_step = self.step_for_epoch(self.epoch)
                    epoch_stats = self.train_epoch()
                    self.stats_history.append(epoch_stats)
                    if self.tb_writer is not None:
                        self.tb_writer.write_epoch({"train": epoch_stats},
                                                   self.epoch)
                    if (self.val_loader is not None and self.val_epoch_interval
                            and self.epoch % self.val_epoch_interval == 0):
                        self.val_history.append(self.validate())
                        if self.tb_writer is not None:
                            self.tb_writer.write_epoch(
                                {"val": self.val_history[-1]}, self.epoch)
                    if (self.checkpoints is not None
                            and self.checkpoints.should_save(self.epoch, max_epochs)):
                        self.checkpoints.save(self.epoch, self.state)
                return
            except Exception:
                if attempt == num_tries - 1:
                    raise
                self.log("training crashed; restarting from last checkpoint\n"
                         + traceback.format_exc())
                self.epoch = max(self.epoch - 1, 0)
                self._resume()
