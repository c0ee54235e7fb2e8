"""APFNet: attribute-based progressive fusion RGB-T tracker (AAAI'22).

Rebuild of RGBT/models/APFNet/modules/{model.py:44-120, model_stage3.py:
115-160}: dual VGG-M streams (layers_v / layers_i) fused per conv stage by
FIVE challenge-attribute branches (extreme illumination, occlusion, scale
variation, thermal crossover, fast motion) whose outputs are aggregated by
small transformer encoder/decoder blocks (1x1 reduce -> attention over
attribute outputs -> 1x1 rise), then MDNet-style fc scoring on the
concatenated streams. Training is staged (train_stage{1,2,3}.py): stage 1
fits each attribute branch on its attribute subset, stage 2 the aggregation
transformers, stage 3 everything — expressed here as optimizer masks.
"""

from __future__ import annotations

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.mdnet import _SharedConvs, lrn

ATTRIBUTES = ("EI", "OCC", "SV", "TC", "FM")  # model.py / README.md:23-26


class AttributeFusion(nn.Module):
    """One challenge-attribute fusion branch: bottleneck conv over the
    concatenated V/I features -> per-stream additive deltas."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fv, fi):
        h = jnp.concatenate([fv, fi], axis=-1)
        h = nn.relu(nn.Conv(self.channels // 4, (1, 1), dtype=self.dtype,
                            name="reduce")(h))
        dv = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="rise_v")(h)
        di = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="rise_i")(h)
        return dv, di


class AttributeAggregator(nn.Module):
    """Transformer-style aggregation over the 5 attribute outputs
    (model_stage3.py transformer{k}_encoder/decoder: 1x1 reduce, linear
    K/V attention across attribute tokens, 1x1 rise)."""
    channels: int
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, branch_outputs: jnp.ndarray) -> jnp.ndarray:
        """branch_outputs: (A, B, H, W, C) -> fused (B, H, W, C)."""
        A, B, H, W, C = branch_outputs.shape
        red = nn.Conv(self.reduced, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc_reduce")
        tokens = red(branch_outputs.reshape(A * B, H, W, C))
        tokens = tokens.reshape(A, B, -1, self.reduced).mean(axis=2)  # (A,B,R)
        k = nn.Dense(self.reduced, dtype=self.dtype, name="WK")(tokens)
        v = nn.Dense(self.reduced, dtype=self.dtype, name="WV")(tokens)
        attn = jax.nn.softmax(
            jnp.einsum("abr,cbr->bac", k, k) / self.reduced ** 0.5, axis=-1)
        agg = jnp.einsum("bac,cbr->abr", attn, v)  # (A, B, R)
        gate = jax.nn.softmax(agg.sum(-1), axis=0)  # (A, B) attribute weights
        fused = (branch_outputs * gate[:, :, None, None, None]).sum(0)
        rise = nn.Conv(C, (1, 1), dtype=self.dtype, name="fc_rise")
        return rise(red(fused))


class APFNet(nn.Module):
    """Dual-stream VGG-M with per-stage attribute fusion + aggregation.

    extract_features((N,107,107,6)) -> (N, 1, 9216); score via fc4/fc5/fc6
    like the MDNet chassis (fc4 input 512*3*3*2, model.py:57-59).
    """
    num_branches: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers_v = _SharedConvs(dtype=self.dtype, name="layers_v")
        self.layers_i = _SharedConvs(dtype=self.dtype, name="layers_i")
        chans = (96, 256, 512)
        reduced = (32, 64, 128)
        for s, c in enumerate(chans):
            for a in ATTRIBUTES:
                setattr(self, f"attr{s}_{a}",
                        AttributeFusion(c, dtype=self.dtype, name=f"attr{s}_{a}"))
            setattr(self, f"agg{s}",
                    AttributeAggregator(c, reduced[s], dtype=self.dtype,
                                        name=f"agg{s}"))
        self.fc4 = nn.Dense(512, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(512, dtype=self.dtype, name="fc5")
        self.branches = [nn.Dense(2, dtype=self.dtype, name=f"fc6_{k}")
                         for k in range(self.num_branches)]

    def _stage(self, s: int, fv, fi, active_attribute: int | None):
        """Apply stage-s attribute fusion. active_attribute selects ONE
        branch (stage-1 training); None aggregates all five."""
        if active_attribute is not None:
            a = ATTRIBUTES[active_attribute]
            dv, di = getattr(self, f"attr{s}_{a}")(fv, fi)
            return fv + dv, fi + di
        outs_v, outs_i = [], []
        for a in ATTRIBUTES:
            dv, di = getattr(self, f"attr{s}_{a}")(fv, fi)
            outs_v.append(dv)
            outs_i.append(di)
        agg = getattr(self, f"agg{s}")
        return (fv + agg(jnp.stack(outs_v)), fi + agg(jnp.stack(outs_i)))

    def extract_features(self, patches: jnp.ndarray,
                         active_attribute: int | None = None) -> jnp.ndarray:
        v = patches[..., :3]
        i = patches[..., 3:6]
        fv, fi = self.layers_v.stage1(v), self.layers_i.stage1(i)
        fv, fi = self._stage(0, fv, fi, active_attribute)
        fv, fi = self.layers_v.stage2(fv), self.layers_i.stage2(fi)
        fv, fi = self._stage(1, fv, fi, active_attribute)
        fv, fi = self.layers_v.stage3(fv), self.layers_i.stage3(fi)
        fv, fi = self._stage(2, fv, fi, active_attribute)
        f = jnp.concatenate([fv, fi], axis=-1)
        return f.reshape(f.shape[0], 1, -1)

    def score(self, feats, branch: int = 0, train: bool = False,
              dropout_rng=None):
        h = nn.relu(self.fc4(feats))
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        h = nn.relu(self.fc5(h))
        return self.branches[branch](h.reshape(h.shape[0], -1))

    def __call__(self, patches, branch: int = 0,
                 active_attribute: int | None = None):
        return self.score(self.extract_features(patches, active_attribute),
                          branch)


def stage_mask(params: dict, stage: int, attribute: int | None = None) -> dict:
    """Trainable-leaf masks for the 3-stage protocol (train_stage{1,2,3}.py).

    stage 1: one attribute's fusion branches (+ fc) — run 5x, once per
    attribute; stage 2: aggregation transformers (+ fc); stage 3: everything.
    """
    flat = flax.traverse_util.flatten_dict(params)

    def trainable(path) -> bool:
        top = str(path[0])
        if stage == 3:
            return True
        if top.startswith("fc") or top.startswith("branches"):
            return True
        if stage == 1:
            return top.startswith("attr") and top.endswith(ATTRIBUTES[attribute])
        if stage == 2:
            return top.startswith("agg")
        return False

    return flax.traverse_util.unflatten_dict(
        {k: trainable(k) for k in flat})
