"""ResNet backbones (flax, NHWC, frozen-BN) for the DiMP/DeT/ATOM family.

Rebuild of RGBD/models/DeT/ltr/models/backbone/resnet.py capability: ResNet-18
(BasicBlock) and ResNet-50 (Bottleneck) exposing intermediate layers
('layer1'..'layer4'). BN uses fixed statistics as parameters (the trackers run
these backbones frozen or fine-tuned with tiny LR; see models/heads.py
FrozenBatchNorm rationale).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmtrack_tpu.models.heads import FrozenBatchNorm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)  # explicit pad: torch-symmetric under stride 2
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)  # explicit pad: torch-symmetric under stride 2
        y = FrozenBatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet returning a dict of intermediate feature maps.

    out_layers selects from 'conv1', 'layer1'..'layer4'. Strides/dims match
    torchvision (layer2: stride 8, layer3: stride 16).
    """
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_layers: Sequence[str] = ("layer2", "layer3"),
                 conv1_add: jnp.ndarray | None = None) -> dict:
        out = {}
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        if conv1_add is not None:
            # STM's mask encoder adds its mask/other-object conv outputs to
            # conv1 BEFORE bn1 (stm/model.py:55)
            y = y + conv1_add
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        out["conv1"] = y
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        Block = Bottleneck if self.block == "bottleneck" else BasicBlock
        planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                y = Block(planes, stride if b == 0 else 1, dtype=self.dtype,
                          name=f"layer{stage + 1}_{b}")(y)
            out[f"layer{stage + 1}"] = y
            planes *= 2
        return {k: out[k] for k in out_layers}


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck", dtype=dtype)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic", dtype=dtype)
