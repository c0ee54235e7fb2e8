"""Auxiliary backbones for the DiMP/pytracking family (flax, NHWC).

Rebuilds of RGBD/models/DeT/ltr/models/backbone/{mobilenetv3.py,
resnet18_vggm.py}: the lightweight MobileNetV3-Large feature extractor and
the ResNet-18 + VGG-M-conv1 hybrid some pytracking recipes (ATOM's
resnet18_vggmconv1 variants) draw features from. Both expose the same
dict-of-intermediate-layers API as models/resnet.py so they are drop-in
backbone choices for the DiMP/ATOM builders.

TPU notes: squeeze-excite pooling is a single reduce + (1,1) broadcast, and
the depthwise convs use feature_group_count so XLA lowers them onto the VPU
without im2col blowup; BN runs as frozen statistics (these backbones track
with fixed or tiny-LR features, matching models/resnet.py's rationale).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmtrack_tpu.models.heads import FrozenBatchNorm
from mmtrack_tpu.models.resnet import BasicBlock


def h_sigmoid(x):
    """relu6(x+3)/6 (mobilenetv3.py:31-37)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    """x * relu6(x+3)/6 (mobilenetv3.py:40-47)."""
    return x * h_sigmoid(x)


class SqueezeExcite(nn.Module):
    """SE block with hard-sigmoid gate (SqueezeBlock, mobilenetv3.py:60-78)."""
    channels: int
    divide: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2))  # (B, C) global average pool
        s = nn.relu(nn.Dense(self.channels // self.divide, dtype=self.dtype,
                             name="fc1")(s))
        s = h_sigmoid(nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


class MobileBlock(nn.Module):
    """Inverted-residual block: 1x1 expand -> depthwise -> (SE) -> 1x1 project
    (MobileBlock, mobilenetv3.py:80-130)."""
    out_channels: int
    kernel: int
    stride: int
    nonlinear: str  # 'RE' | 'HS'
    se: bool
    exp_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = nn.relu if self.nonlinear == "RE" else h_swish
        use_connect = self.stride == 1 and x.shape[-1] == self.out_channels

        y = nn.Conv(self.exp_size, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand")(x)
        y = act(FrozenBatchNorm(name="expand_bn")(y))

        p = (self.kernel - 1) // 2
        y = nn.Conv(self.exp_size, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=self.exp_size,
                    dtype=self.dtype, name="dw")(y)
        y = FrozenBatchNorm(name="dw_bn")(y)

        if self.se:
            y = SqueezeExcite(self.exp_size, dtype=self.dtype, name="se")(y)

        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="project")(y)
        y = act(FrozenBatchNorm(name="project_bn")(y))
        return x + y if use_connect else y


# MobileNetV3-LARGE stage table: (out, kernel, stride, nonlinear, SE, exp)
# grouped into layer1..layer6 exactly as mobilenetv3.py:139-190 nests them.
_LARGE_STAGES = (
    ((16, 3, 1, "RE", False, 16),),
    ((24, 3, 2, "RE", False, 64), (24, 3, 1, "RE", False, 72)),
    ((40, 5, 2, "RE", True, 72), (40, 5, 1, "RE", True, 120),
     (40, 5, 1, "RE", True, 120)),
    ((80, 3, 2, "HS", False, 240), (80, 3, 1, "HS", False, 200),
     (80, 3, 1, "HS", False, 184), (80, 3, 1, "HS", False, 184)),
    ((112, 3, 1, "HS", True, 480), (112, 3, 1, "HS", True, 672)),
    ((160, 5, 1, "HS", True, 672), (160, 5, 2, "HS", True, 672),
     (160, 5, 1, "HS", True, 960)),
)


class MobileNetV3(nn.Module):
    """MobileNetV3-Large feature pyramid (mobilenetv3.py:133-210).

    Output layers: 'init_conv' (stride 2, 16ch), 'layer1' (s2), 'layer2'
    (s4, 24ch), 'layer3' (s8, 40ch), 'layer4' (s16, 80ch), 'layer5' (s16,
    112ch), 'layer6' (s32, 160ch), 'out_conv1' (s32, 960ch).
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_layers: Sequence[str] = ("layer3", "layer4")) -> dict:
        out = {}
        y = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="init_conv")(x)
        y = h_swish(FrozenBatchNorm(name="init_bn")(y))
        out["init_conv"] = y
        for stage, blocks in enumerate(_LARGE_STAGES):
            for b, (oc, k, s, nl, se, exp) in enumerate(blocks):
                y = MobileBlock(oc, k, s, nl, se, exp, dtype=self.dtype,
                                name=f"layer{stage + 1}_{b}")(y)
            out[f"layer{stage + 1}"] = y
        y = nn.Conv(960, (1, 1), dtype=self.dtype, name="out_conv1")(y)
        y = h_swish(FrozenBatchNorm(name="out_conv1_bn")(y))
        out["out_conv1"] = y
        return {k: out[k] for k in out_layers}


def _vggm_lrn(x: jnp.ndarray, size: int = 5, alpha: float = 0.0005,
              beta: float = 0.75, k: float = 2.0) -> jnp.ndarray:
    """SpatialCrossMapLRN (resnet18_vggm.py:9-35): centered cross-channel
    window, *averaged* (AvgPool3d) rather than summed before the alpha
    scaling — x / (k + alpha * mean(x^2 over window))^beta."""
    sq = x * x
    C = x.shape[-1]
    half = (size - 1) // 2
    pad = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    win = sum(pad[..., i:i + C] for i in range(size)) / size
    return x / (k + alpha * win) ** beta


class ResNetVGGm1(nn.Module):
    """ResNet-18 with an extra VGG-M first-conv branch (resnet18_vggm.py:38-141).

    'vggconv1' (96ch 7x7/2 conv + LRN) is a parallel shallow-texture tap the
    ATOM resnet18_vggmconv1 recipes correlate against; the main trunk is a
    standard ResNet-18 reusing models/resnet.py BasicBlock. Output layers:
    'vggconv1', 'conv1', 'layer1'..'layer4'.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_layers: Sequence[str] = ("vggconv1", "layer3")) -> dict:
        out = {}
        if "vggconv1" in out_layers:
            c1 = nn.Conv(96, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                         dtype=self.dtype, name="vggmconv1")(x)
            out["vggconv1"] = _vggm_lrn(nn.relu(c1))

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(name="bn1")(y))
        out["conv1"] = y
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for stage, n_blocks in enumerate((2, 2, 2, 2)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                y = BasicBlock(planes, stride if b == 0 else 1, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(y)
            out[f"layer{stage + 1}"] = y
            planes *= 2
        return {k: out[k] for k in out_layers}


def mobilenetv3_large(dtype=jnp.float32) -> MobileNetV3:
    return MobileNetV3(dtype=dtype)


def resnet18_vggmconv1(dtype=jnp.float32) -> ResNetVGGm1:
    return ResNetVGGm1(dtype=dtype)
