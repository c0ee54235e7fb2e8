"""Optimizer construction: AdamW + step LR + prompt-only parameter masking.

Rebuild of get_optimizer_scheduler (ViPT/lib/train/base_functions.py:171-211):
the reference freezes every parameter without "prompt" in its name via
requires_grad=False; here the same selection is an optax mask so frozen
leaves receive exactly zero updates (and no optimizer state memory).
"""

from __future__ import annotations

import flax
import jax
import optax


def _path_contains(path, needle: str) -> bool:
    return any(needle in str(k) for k in path)


def prompt_only_mask(params) -> object:
    """True (trainable) for leaves whose path mentions 'prompt'.

    Matches the reference's name filter: prompt_blocks_*, prompt_norms_*,
    patch_embed_prompt (base_functions.py:174-186).
    """
    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: _path_contains(k, "prompt") for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def step_lr_schedule(base_lr: float, drop_step: int, decay: float = 0.1):
    """StepLR: multiply by `decay` every `drop_step` optimizer steps —
    torch StepLR decays REPEATEDLY at each multiple of step_size
    (DeT uses StepLR(15, 0.2): drops at 15/30/45), not once."""
    return lambda step: base_lr * decay ** (step // drop_step)


def build_optimizer(params, *, lr: float, weight_decay: float = 1e-4,
                    lr_drop_step: int | None = None, decay_rate: float = 0.1,
                    grad_clip_norm: float = 0.1,
                    trainable_mask=None) -> optax.GradientTransformation:
    """AdamW with global-norm clipping, step decay, optional trainable mask.

    grad_clip_norm matches cfg.TRAIN.GRAD_CLIP_NORM=0.1
    (ltr_trainer.py:96-99); mask=None trains everything (OSTrack-style full
    training), mask=prompt_only_mask(params) reproduces ViPT prompt tuning
    (0.84M trainable parameters).
    """
    schedule = (step_lr_schedule(lr, lr_drop_step, decay_rate)
                if lr_drop_step is not None else lr)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if trainable_mask is not None:
        # NB: optax.masked would pass the RAW gradient through as the update
        # for masked-out leaves; frozen leaves must get exactly zero.
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   param_labels=labels)
    return tx


def count_trainable(params, mask) -> int:
    flat_p = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat_m = flax.traverse_util.flatten_dict(mask)
    return sum(int(v.size) for k, v in flat_p.items() if flat_m[k])
