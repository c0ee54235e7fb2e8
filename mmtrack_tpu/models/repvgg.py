"""RepVGG backbone (flax, NHWC) for the STARK-lightning family.

Rebuild of RGBD/models/SPT/lib/models/stark/repvgg.py: training-time blocks
carry three parallel branches (3x3 conv+BN, 1x1 conv+BN, identity BN), and
`switch_to_deploy` algebraically fuses them into one 3x3 conv. Here the
fusion is a pure function over the param pytree (`fuse_repvgg_params`)
instead of module surgery — the deploy model is the same flax module with
`deploy=True`, so inference runs as a single dense 3x3 conv per block
(ideal MXU shape; no branch adds, 1/3 the HBM weight traffic).

BN runs as frozen statistics (scale/bias/mean/var as parameters), matching
the freeze_bn=True path the SPT backbone builder uses (backbone.py:59-75).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _ConvBN(nn.Module):
    """conv_bn (repvgg.py:47-56): conv (no bias) + frozen BN."""
    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class RepVGGBlock(nn.Module):
    """RepVGGBlock (repvgg.py:59-116). deploy=False: 3x3 + 1x1 + (identity
    BN when shapes allow); deploy=True: one fused 3x3 conv with bias."""
    out_ch: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.deploy:
            y = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                        use_bias=True, dtype=self.dtype, name="reparam")(x)
            return nn.relu(y)
        y = _ConvBN(self.out_ch, 3, self.stride, self.groups, self.dtype,
                    name="dense")(x)
        y = y + _ConvBN(self.out_ch, 1, self.stride, self.groups, self.dtype,
                        name="one_by_one")(x)
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            scale = self.param("id_scale", nn.initializers.ones, (self.out_ch,))
            bias = self.param("id_bias", nn.initializers.zeros, (self.out_ch,))
            mean = self.param("id_mean", nn.initializers.zeros, (self.out_ch,))
            var = self.param("id_var", nn.initializers.ones, (self.out_ch,))
            inv = scale / jnp.sqrt(var + 1e-5)
            y = y + (x * inv + (bias - mean * inv))
        return nn.relu(y)


# RepVGG-A0: num_blocks per stage, width multiplier (repvgg.py:238-247)
_A0_BLOCKS = (2, 4, 14, 1)
_A0_WIDTH = (0.75, 0.75, 0.75, 2.5)
_BASE = (64, 128, 256, 512)


class RepVGG(nn.Module):
    """RepVGG trunk exposing stage outputs (repvgg.py:197-236).

    Output layers: 'stage0' (stride 2) .. 'stage4' (stride 32); STARK
    consumes 'stage3' (stride 16).
    """
    num_blocks: tuple[int, ...] = _A0_BLOCKS
    width: tuple[float, ...] = _A0_WIDTH
    deploy: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_layers: Sequence[str] = ("stage3",)) -> dict:
        out = {}
        ch0 = min(64, int(64 * self.width[0]))
        y = RepVGGBlock(ch0, stride=2, deploy=self.deploy, dtype=self.dtype,
                        name="stage0")(x)
        out["stage0"] = y
        for s, (n, w, base) in enumerate(zip(self.num_blocks, self.width, _BASE)):
            planes = int(base * w)
            for b in range(n):
                y = RepVGGBlock(planes, stride=2 if b == 0 else 1,
                                deploy=self.deploy, dtype=self.dtype,
                                name=f"stage{s + 1}_{b}")(y)
            out[f"stage{s + 1}"] = y
        return {k: out[k] for k in out_layers}


def _fuse_convbn(p: dict, kernel: int) -> tuple[np.ndarray, np.ndarray]:
    """Branch -> equivalent (3x3 HWIO kernel, bias) (get_equivalent_kernel_bias,
    repvgg.py:138-176)."""
    k = np.asarray(p["conv"]["kernel"], np.float64)  # (kh, kw, in, out)
    inv = np.asarray(p["bn_scale"], np.float64) / np.sqrt(
        np.asarray(p["bn_var"], np.float64) + 1e-5)
    kernel3 = k if kernel == 3 else np.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
    fused_k = kernel3 * inv[None, None, None, :]
    fused_b = np.asarray(p["bn_bias"], np.float64) - np.asarray(
        p["bn_mean"], np.float64) * inv
    return fused_k, fused_b


def _fuse_block(bp: dict) -> dict:
    k3, b3 = _fuse_convbn(bp["dense"], 3)
    k1, b1 = _fuse_convbn(bp["one_by_one"], 1)
    k, b = k3 + k1, b3 + b1
    if "id_scale" in bp:
        inv = np.asarray(bp["id_scale"], np.float64) / np.sqrt(
            np.asarray(bp["id_var"], np.float64) + 1e-5)
        in_ch = k.shape[2]
        kid = np.zeros_like(k)
        for c in range(k.shape[3]):
            kid[1, 1, c % in_ch, c] = inv[c]
        k = k + kid
        b = b + np.asarray(bp["id_bias"], np.float64) - np.asarray(
            bp["id_mean"], np.float64) * inv
    return {"reparam": {"kernel": jnp.asarray(k, jnp.float32),
                        "bias": jnp.asarray(b, jnp.float32)}}


def fuse_repvgg_params(params: dict) -> dict:
    """Training params (3-branch) -> deploy params (single 3x3 per block).

    Pure-pytree equivalent of repvgg.py switch_to_deploy (178-195): use with
    `RepVGG(deploy=True)`; forward output is identical to the 3-branch model
    up to float rounding.
    """
    tree = params["params"] if "params" in params else params
    fused = {name: _fuse_block(bp) for name, bp in tree.items()}
    return {"params": fused} if "params" in params else fused


def repvgg_a0(deploy: bool = False, dtype=jnp.float32) -> RepVGG:
    return RepVGG(deploy=deploy, dtype=dtype)
