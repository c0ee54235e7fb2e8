"""MDNet family: VGG-M candidate-scoring trackers and multi-modal variants.

Rebuilds:
  - pyMDNet dual-stream (RGBE/models/pyMDNet/modules/model.py:44-84): ONE
    shared VGG-M + fc4/fc5 trunk applied to each modality, fc6 branch scores
    the concatenated (512*2) fc5 outputs,
  - MANet (RGBE/models/MANet/modules/MANet3x1x1_IC.py:58-260): shared
    "generality" convs + per-modality adapter branches (3x3/2+pool5,
    1x1/2+pool5, 1x1/2) summed into each stage, conv3 streams concatenated
    before fc4,
  - VITAL chassis (pyVITAL: same MDNet + adversarial mask generator during
    offline training),
  - APFNet chassis (RGBT/models/APFNet/modules/model.py:44-111 dual VGG-M
    streams layers_v/layers_i).

Architecture constants (RT-MDNet lineage): 107x107 input -> conv1 7x7/2 +
LRN + pool3/2 -> conv2 5x5/2 + LRN + pool3/2 -> conv3 3x3 -> (3,3,512).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.heads import FrozenBatchNorm


def lrn(x: jnp.ndarray, size: int = 2, style: str = "torch") -> jnp.ndarray:
    """Local response normalization across channels.

    style='torch' matches nn.LocalResponseNorm defaults (pyMDNet
    model.py:51,55): trailing window [c-size+1, c], k=1, alpha=1e-4/size,
    beta=0.75. style='manet' matches MANet's custom LRN
    (MANet3x1x1_IC.py:43-55): centered 5-window, k=2, alpha=1e-4.
    """
    sq = x * x
    C = x.shape[-1]
    if style == "torch":
        k, alpha, beta = 1.0, 1e-4 / size, 0.75
        half_lo, half_hi = size - 1, 0
    elif style == "manet":
        size, k, alpha, beta = 5, 2.0, 1e-4, 0.75
        half_lo = half_hi = 2
    else:
        raise ValueError(style)
    pad = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(half_lo, half_hi)])
    win = sum(pad[..., i:i + C] for i in range(size))
    return x / (k + alpha * win) ** beta


class _SharedConvs(nn.Module):
    """The shared VGG-M conv trunk, stage by stage so adapters can interleave.

    lrn_style: 'torch' for the pyMDNet chassis; 'manet' for the adapter
    mode — MANet's layers use the centered custom LRN (MANet3x1x1_IC.py:
    43-55 LRN(), k=2, alpha=1e-4), not nn.LocalResponseNorm."""
    dtype: jnp.dtype = jnp.float32
    lrn_style: str = "torch"

    def setup(self):
        self.conv1 = nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                             dtype=self.dtype, name="conv1")
        self.conv2 = nn.Conv(256, (5, 5), strides=(2, 2), padding="VALID",
                             dtype=self.dtype, name="conv2")
        self.conv3 = nn.Conv(512, (3, 3), padding="VALID", dtype=self.dtype,
                             name="conv3")

    def stage1(self, x):
        return nn.max_pool(lrn(nn.relu(self.conv1(x)), style=self.lrn_style),
                           (3, 3), strides=(2, 2))

    def stage2(self, x):
        return nn.max_pool(lrn(nn.relu(self.conv2(x)), style=self.lrn_style),
                           (3, 3), strides=(2, 2))

    def stage3(self, x):
        return nn.relu(self.conv3(x))

    def __call__(self, x):
        return self.stage3(self.stage2(self.stage1(x)))


class _Adapter(nn.Module):
    """MANet modality adapter branch: conv + ReLU + BN (+ pool)."""
    out_ch: int
    kernel: int
    pool: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.out_ch, (self.kernel, self.kernel), strides=(2, 2),
                    padding="VALID", dtype=self.dtype, name="conv")(x)
        y = nn.relu(y)
        y = FrozenBatchNorm(name="bn")(y)
        if self.pool:
            y = nn.max_pool(y, (5, 5), strides=(2, 2))
        return y


class MDNet(nn.Module):
    """MDNet with selectable multi-modal topology.

    mode:
      'single'  — RGB only (canonical MDNet)
      'dual'    — shared trunk+fc applied per modality, fc6 on concat
                  (pyMDNet RGBE, model.py:59-66)
      'adapter' — shared trunk + per-modality adapters, conv3 concat -> fc
                  (MANet forward, MANet3x1x1_IC.py:210-260)

    fc6_merge selects how the per-stream fc5 outputs feed fc6: 'concat'
    (pyMDNet — Linear(512*2, 2), model.py:67) or 'sum' (pyVITAL —
    Linear(512, 2) on x_vis + x_event, pyVITAL model.py:67,137).

    Tracking API: extract_features(patches) -> cached conv features;
    score(feats, ...) -> (N, 2) logits; only fc4/fc5/fc6 carry online
    gradients (set_learnable_params('fc') analog via an optimizer mask).
    """
    mode: str = "dual"
    num_branches: int = 1
    fc6_merge: str = "concat"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.features = _SharedConvs(
            dtype=self.dtype,
            lrn_style="manet" if self.mode == "adapter" else "torch",
            name="features")
        if self.mode == "adapter":
            for m in ("rgb", "x"):
                setattr(self, f"adapt1_{m}", _Adapter(96, 3, True, name=f"adapt1_{m}"))
                setattr(self, f"adapt2_{m}", _Adapter(256, 1, True, name=f"adapt2_{m}"))
                setattr(self, f"adapt3_{m}", _Adapter(512, 1, False, name=f"adapt3_{m}"))
        self.fc4 = nn.Dense(512, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(512, dtype=self.dtype, name="fc5")
        self.branches = [nn.Dense(2, dtype=self.dtype, name=f"fc6_{k}")
                         for k in range(self.num_branches)]

    def _adapter_stream(self, x, which: str):
        f = self.features
        a1 = getattr(self, f"adapt1_{which}")
        a2 = getattr(self, f"adapt2_{which}")
        a3 = getattr(self, f"adapt3_{which}")
        h = f.stage1(x) + a1(x)
        h = f.stage2(h) + a2(h)
        return f.stage3(h) + a3(h)

    def extract_features(self, patches: jnp.ndarray) -> jnp.ndarray:
        """(N, 107, 107, C) -> (N, streams, D) conv features (cacheable)."""
        rgb = patches[..., :3]
        if self.mode == "single":
            f = self.features(rgb)
            return f.reshape(f.shape[0], 1, -1)
        xmod = patches[..., 3:6]
        if self.mode == "dual":
            fr = self.features(rgb)
            fx = self.features(xmod)
            return jnp.stack([fr.reshape(fr.shape[0], -1),
                              fx.reshape(fx.shape[0], -1)], axis=1)
        if self.mode == "adapter":
            fr = self._adapter_stream(rgb, "rgb")
            fx = self._adapter_stream(xmod, "x")
            f = jnp.concatenate([fr, fx], axis=-1)  # channel concat (1024)
            return f.reshape(f.shape[0], 1, -1)
        raise ValueError(self.mode)

    def score(self, feats: jnp.ndarray, branch: int = 0, train: bool = False,
              dropout_rng=None) -> jnp.ndarray:
        """(N, streams, D) -> (N, 2) target/background logits."""
        h = nn.relu(self.fc4(feats))
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        h = nn.relu(self.fc5(h))
        if self.fc6_merge == "sum":    # pyVITAL: fc6 on x_vis + x_event
            h = h.sum(axis=1)
        else:
            h = h.reshape(h.shape[0], -1)  # concat streams (dual: 512*2)
        # the reference branch head is Sequential(Dropout(0.5), Linear)
        # (pyMDNet model.py:65-66) — fc6 input is dropped during training
        if train and dropout_rng is not None:
            r6 = jax.random.fold_in(dropout_rng, 6)
            keep = jax.random.bernoulli(r6, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        return self.branches[branch](h)

    def __call__(self, patches: jnp.ndarray, branch: int = 0) -> jnp.ndarray:
        return self.score(self.extract_features(patches), branch)
