"""Batched multi-sequence inference: the TPU replacement for the reference's
process-pool eval parallelism.

The reference shards sequences over OS processes pinned to GPUs
(ViPT/RGBT_workspace/test_rgbt_mgpus.py:180-190, pytracking running.py:
186-207). Here the pure `vipt_track_step` vmaps over a batch of per-sequence
states and shards that batch across the device mesh, so one jitted program
advances B sequences one frame per call — per-chip throughput scales with
batch instead of process count.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtrack_tpu.trackers.vipt_tracker import (
    ViPTRuntime,
    vipt_init_state,
    vipt_track_step,
)


def make_batched_track_step(rt: ViPTRuntime, model, mesh: Mesh | None = None,
                            data_axis: str = "data"):
    """Build (batched_init, batched_step).

    batched_init(frames (B,H,W,6), boxes (B,4)) -> state pytree with leading B
    batched_step(params, state, frames (B,H,W,6)) -> (state, boxes (B,4), scores (B,))
    Frames in one batch share a resolution (bucket upstream).
    """
    init = jax.vmap(partial(vipt_init_state, rt))
    step = jax.vmap(partial(vipt_track_step, rt, model), in_axes=(None, 0, 0))

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(data_axis))
        init = jax.jit(init, in_shardings=(data, data), out_shardings=data)
        step = jax.jit(step, in_shardings=(repl, data, data),
                       out_shardings=(data, data, data), donate_argnums=(1,))
    else:
        init = jax.jit(init)
        step = jax.jit(step, donate_argnums=(1,))
    return init, step


class BatchedViPTTracker:
    """Track B same-resolution sequences in lockstep on the mesh."""

    def __init__(self, model, params, runtime: ViPTRuntime | None = None,
                 mesh: Mesh | None = None):
        self.rt = runtime or ViPTRuntime()
        self.mesh = mesh
        self._model = model
        self._init, self._step = make_batched_track_step(self.rt, model, mesh)
        if mesh is not None:
            params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params
        self.state = None

    def initialize(self, frames: np.ndarray, boxes: np.ndarray) -> None:
        import jax.numpy as jnp
        frames = jnp.asarray(frames)
        boxes = jnp.asarray(np.asarray(boxes, np.float32))
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            frames = jax.device_put(frames, sh)
            boxes = jax.device_put(boxes, sh)
        self.state = self._init(frames, boxes)

    def track(self, frames: np.ndarray):
        import jax.numpy as jnp
        frames = jnp.asarray(frames)
        if self.mesh is not None:
            frames = jax.device_put(frames, NamedSharding(self.mesh, P("data")))
        self.state, boxes, scores = self._step(self.params, self.state, frames)
        return np.asarray(boxes), np.asarray(scores)

    def track_yuv(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  idx: np.ndarray):
        """Minimum-byte streaming step (2.5 B/px wire): raw 4:2:0 planes +
        JET index; chroma upsample + BT.601 + colormap run on device.
        Decode-grade (≤1 LSB of cv2's decode), NOT bit-exact — opt-in via
        MMTRACK_STREAM=yuv420 (eval/batched_ope.py)."""
        import jax.numpy as jnp
        if not hasattr(self, "_step_yuv"):
            from mmtrack_tpu.ops.compose import (compose_yuv_index_device,
                                                 jet_lut)
            lut = jnp.asarray(jet_lut())

            def step_yuv(params, state, y, cb, cr, idx):
                frames = compose_yuv_index_device(y, cb, cr, idx, lut)
                return jax.vmap(partial(vipt_track_step, self.rt,
                                        self._model),
                                in_axes=(None, 0, 0))(params, state, frames)

            if self.mesh is not None:
                repl = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                self._step_yuv = jax.jit(
                    step_yuv,
                    in_shardings=(repl, data, data, data, data),
                    out_shardings=(data, data, data), donate_argnums=(1,))
            else:
                self._step_yuv = jax.jit(step_yuv, donate_argnums=(1,))
        arrs = [jnp.asarray(a) for a in (y, cb, cr, idx)]
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            arrs = [jax.device_put(a, sh) for a in arrs]
        self.state, boxes, scores = self._step_yuv(self.params, self.state,
                                                   *arrs)
        return np.asarray(boxes), np.asarray(scores)

    def track_split(self, rgb: np.ndarray, idx: np.ndarray):
        """Streaming 'rgbcolormap' step at 4 B/px: the host ships RGB plus
        the 1-byte JET index plane (data/composition.py::depth_index_u8)
        and the colormap gather + concat runs on device — bit-identical to
        track(get_x_frame(...)) for 2/3 of the transfer bytes."""
        import jax.numpy as jnp
        if not hasattr(self, "_step_split"):
            from mmtrack_tpu.ops.compose import (compose_rgb_index_device,
                                                 jet_lut)
            lut = jnp.asarray(jet_lut())

            def step_split(params, state, rgb, idx):
                frames = compose_rgb_index_device(rgb, idx, lut)
                return jax.vmap(partial(vipt_track_step, self.rt,
                                        self._model),
                                in_axes=(None, 0, 0))(params, state, frames)

            donate = (1,)
            if self.mesh is not None:
                repl = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                self._step_split = jax.jit(
                    step_split, in_shardings=(repl, data, data, data),
                    out_shardings=(data, data, data), donate_argnums=donate)
            else:
                self._step_split = jax.jit(step_split, donate_argnums=donate)
        rgb = jnp.asarray(rgb)
        idx = jnp.asarray(idx)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            rgb = jax.device_put(rgb, sh)
            idx = jax.device_put(idx, sh)
        self.state, boxes, scores = self._step_split(self.params, self.state,
                                                     rgb, idx)
        return np.asarray(boxes), np.asarray(scores)
