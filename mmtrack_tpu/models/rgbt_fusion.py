"""DAFNet and MaCNet: RGB-T fusion trackers on the MDNet chassis.

The reference repo documents both only as empty submodules
(readme.md:33-39; RGBT/models/DAFNet, RGBT/models/MaCNet) — built here from
their papers on the shared VGG-M chassis (mmtrack_tpu.models.mdnet):

  - DAFNet (Deep Adaptive Fusion Network, ICCVW'19): per-stage adaptive
    fusion — squeeze-excitation-style gates computed from the concatenated
    modality statistics recursively blend the RGB and thermal streams.
  - MaCNet (Modality-aware Cross-layer Network, Sensors'20): per-modality
    channel attention plus a cross-layer aggregation of stage features into
    the classifier.

Both track with the MDNet candidate protocol
(mmtrack_tpu.trackers.mdnet_tracker).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.mdnet import _SharedConvs


class AdaptiveFusionGate(nn.Module):
    """DAFNet fusion: gates from pooled joint statistics -> blended streams."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fv, fi):
        stats = jnp.concatenate([fv.mean(axis=(1, 2)), fi.mean(axis=(1, 2))],
                                axis=-1)                     # (B, 2C)
        h = nn.relu(nn.Dense(self.channels // 2, dtype=self.dtype,
                             name="squeeze")(stats))
        g = nn.sigmoid(nn.Dense(2 * self.channels, dtype=self.dtype,
                                name="excite")(h))
        gv = g[:, :self.channels][:, None, None, :]
        gi = g[:, self.channels:][:, None, None, :]
        fused = gv * fv + gi * fi
        return fused, gv, gi


class DAFNet(nn.Module):
    """Recursive adaptive fusion: each stage blends the streams and feeds the
    fused map back into both (the paper's recursive fusion strategy)."""
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers_v = _SharedConvs(dtype=self.dtype, name="layers_v")
        self.layers_i = _SharedConvs(dtype=self.dtype, name="layers_i")
        self.fuse1 = AdaptiveFusionGate(96, dtype=self.dtype, name="fuse1")
        self.fuse2 = AdaptiveFusionGate(256, dtype=self.dtype, name="fuse2")
        self.fuse3 = AdaptiveFusionGate(512, dtype=self.dtype, name="fuse3")
        self.fc4 = nn.Dense(512, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(512, dtype=self.dtype, name="fc5")
        self.fc6 = nn.Dense(2, dtype=self.dtype, name="fc6")

    def extract_features(self, patches: jnp.ndarray) -> jnp.ndarray:
        v, i = patches[..., :3], patches[..., 3:6]
        fv, fi = self.layers_v.stage1(v), self.layers_i.stage1(i)
        fused, gv, gi = self.fuse1(fv, fi)
        fv, fi = fused, fused  # recursive: both streams continue from the blend
        fv, fi = self.layers_v.stage2(fv), self.layers_i.stage2(fi)
        fused, _, _ = self.fuse2(fv, fi)
        fv, fi = fused, fused
        fv, fi = self.layers_v.stage3(fv), self.layers_i.stage3(fi)
        fused, _, _ = self.fuse3(fv, fi)
        return fused.reshape(fused.shape[0], 1, -1)

    def score(self, feats, branch: int = 0, train: bool = False,
              dropout_rng=None):
        # both papers are MDNet-based with dropout-0.5 fc regularization;
        # the online protocol (mdnet_tracker._score_fn) passes train+rng
        h = nn.relu(self.fc4(feats))
        if train and dropout_rng is not None:
            r5 = jax.random.fold_in(dropout_rng, 5)
            keep = jax.random.bernoulli(r5, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        h = nn.relu(self.fc5(h))
        h = h.reshape(h.shape[0], -1)
        if train and dropout_rng is not None:
            r6 = jax.random.fold_in(dropout_rng, 6)
            keep = jax.random.bernoulli(r6, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        return self.fc6(h)

    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        return self.score(self.extract_features(patches))


class MaCNet(nn.Module):
    """Modality-aware channel attention per stream + cross-layer aggregation."""
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers_v = _SharedConvs(dtype=self.dtype, name="layers_v")
        self.layers_i = _SharedConvs(dtype=self.dtype, name="layers_i")
        for s, c in enumerate((96, 256, 512)):
            setattr(self, f"att_v{s}", nn.Dense(c, name=f"att_v{s}"))
            setattr(self, f"att_i{s}", nn.Dense(c, name=f"att_i{s}"))
        # cross-layer: stage-1/2 features pooled to 3x3 and projected
        self.cross1 = nn.Dense(128, name="cross1")
        self.cross2 = nn.Dense(128, name="cross2")
        self.fc4 = nn.Dense(512, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(512, dtype=self.dtype, name="fc5")
        self.fc6 = nn.Dense(2, dtype=self.dtype, name="fc6")

    def _attend(self, f, s, which):
        att = nn.sigmoid(getattr(self, f"att_{which}{s}")(f.mean(axis=(1, 2))))
        return f * att[:, None, None, :]

    def extract_features(self, patches: jnp.ndarray) -> jnp.ndarray:
        v, i = patches[..., :3], patches[..., 3:6]
        fv = self._attend(self.layers_v.stage1(v), 0, "v")
        fi = self._attend(self.layers_i.stage1(i), 0, "i")
        c1 = self.cross1(jnp.concatenate(
            [nn.avg_pool(fv, (8, 8), (8, 8)).mean(axis=(1, 2)),
             nn.avg_pool(fi, (8, 8), (8, 8)).mean(axis=(1, 2))], axis=-1))
        fv = self._attend(self.layers_v.stage2(fv), 1, "v")
        fi = self._attend(self.layers_i.stage2(fi), 1, "i")
        c2 = self.cross2(jnp.concatenate(
            [fv.mean(axis=(1, 2)), fi.mean(axis=(1, 2))], axis=-1))
        fv = self._attend(self.layers_v.stage3(fv), 2, "v")
        fi = self._attend(self.layers_i.stage3(fi), 2, "i")
        flat = jnp.concatenate([fv.reshape(fv.shape[0], -1),
                                fi.reshape(fi.shape[0], -1), c1, c2], axis=-1)
        return flat[:, None, :]

    def score(self, feats, branch: int = 0, train: bool = False,
              dropout_rng=None):
        # both papers are MDNet-based with dropout-0.5 fc regularization;
        # the online protocol (mdnet_tracker._score_fn) passes train+rng
        h = nn.relu(self.fc4(feats))
        if train and dropout_rng is not None:
            r5 = jax.random.fold_in(dropout_rng, 5)
            keep = jax.random.bernoulli(r5, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        h = nn.relu(self.fc5(h))
        h = h.reshape(h.shape[0], -1)
        if train and dropout_rng is not None:
            r6 = jax.random.fold_in(dropout_rng, 6)
            keep = jax.random.bernoulli(r6, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        return self.fc6(h)

    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        return self.score(self.extract_features(patches))
