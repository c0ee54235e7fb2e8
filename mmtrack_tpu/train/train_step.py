"""The jitted training step and its data-parallel sharding.

Replaces the reference's DDP/NCCL machinery (SURVEY.md section 2.6:
torch.distributed.launch + DistributedDataParallel + DistributedSampler,
ViPT/lib/train/train_script.py:59-62) with ONE pjit-compiled SPMD program:
params replicated, batch sharded on a `data` mesh axis, gradient psum
inserted by XLA. Multi-host runs reuse the same program via
jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtrack_tpu.train.actor import vipt_forward_and_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_train_step(model, tx: optax.GradientTransformation, *,
                    box_mask_z, ce_keep_lens, weights=(2.0, 5.0, 1.0),
                    search_size: int = 256, stride: int = 16,
                    use_drop_path: bool = True) -> Callable:
    """Build `train_step(state, batch, rng) -> (state, stats)` (pure)."""

    def train_step(state: TrainState, batch: dict, rng):
        def loss_fn(params):
            rngs = {"drop_path": rng} if use_drop_path else None
            return vipt_forward_and_loss(
                model, params, batch, box_mask_z=box_mask_z,
                ce_keep_lens=ce_keep_lens, weights=weights,
                search_size=search_size, stride=stride, rngs=rngs)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt)
        return new_state, stats

    return train_step


def shard_train_step(train_step: Callable, mesh: Mesh,
                     data_axis: str = "data", donate: bool = True) -> Callable:
    """jit the step over a mesh: state replicated, batch sharded on `data`.

    XLA inserts the gradient all-reduce over ICI — the TPU-native equivalent
    of DDP's NCCL allreduce (train_script.py:61).

    Pass donate=False when the CALLER keeps using the input state after the
    call (e.g. a validation step driven by Trainer.validate, which discards
    the returned state) — donation would delete the live training state.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
