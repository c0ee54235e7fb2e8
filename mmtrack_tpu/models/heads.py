"""Box prediction heads: CenterPredictor (heatmap+size+offset) and corners.

Rebuild of ViPT/lib/models/layers/head.py:24-248 in NHWC. The conv stacks use
frozen batch-norm semantics (ViPT trains with FIX_BN and prompt-only
gradients so head BN statistics never update; head.py + frozen_bn.py); decode
(`cal_bbox`) is a pure function usable inside the jitted track step.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics stored as parameters.

    Equivalent of ViPT/lib/models/layers/frozen_bn.py: y = (x - mean) /
    sqrt(var + eps) * scale + bias, everything a (C,) leaf so converted torch
    checkpoints map 1:1. Gradients to mean/var are masked out by the
    optimizer (they are not trained in the reference either).
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class ConvBNRelu(nn.Module):
    out_ch: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), padding="SAME",
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x)


class _ConvTower(nn.Module):
    """conv1..conv4 (BN+ReLU) then a 1x1 projection — one head branch."""
    channel: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBNRelu(self.channel, dtype=self.dtype, name="conv1")(x)
        x = ConvBNRelu(self.channel // 2, dtype=self.dtype, name="conv2")(x)
        x = ConvBNRelu(self.channel // 4, dtype=self.dtype, name="conv3")(x)
        x = ConvBNRelu(self.channel // 8, dtype=self.dtype, name="conv4")(x)
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv5")(x)


class CenterPredictor(nn.Module):
    """Center heatmap + size + offset head (head.py:98-201), NHWC.

    Input: (B, S, S, C) search feature map. Output maps:
      score (B, S, S) in (0,1), size (B, S, S, 2) in (0,1), offset (B, S, S, 2).
    """
    channel: int = 256
    feat_sz: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        score = _ConvTower(self.channel, 1, dtype=self.dtype, name="ctr")(x)[..., 0]
        offset = _ConvTower(self.channel, 2, dtype=self.dtype, name="offset")(x)
        size = _ConvTower(self.channel, 2, dtype=self.dtype, name="size")(x)
        clamp = lambda v: jnp.clip(nn.sigmoid(v.astype(jnp.float32)), 1e-4, 1 - 1e-4)
        return clamp(score), clamp(size), offset.astype(jnp.float32)


def cal_bbox(score_map: jnp.ndarray, size_map: jnp.ndarray, offset_map: jnp.ndarray):
    """Decode (cx, cy, w, h) in [0,1] crop coords from head maps.

    Pure-function port of CenterPredictor.cal_bbox (head.py:142-160): argmax
    cell + sub-cell offset, size gathered at the argmax.

    Returns (bbox (B, 4), max_score (B,)).
    """
    B, S, _ = score_map.shape
    flat = score_map.reshape(B, S * S)
    idx = jnp.argmax(flat, axis=1)
    max_score = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    idx_y = (idx // S).astype(jnp.float32)
    idx_x = (idx % S).astype(jnp.float32)

    size = jnp.take_along_axis(size_map.reshape(B, S * S, 2), idx[:, None, None], axis=1)[:, 0]
    offset = jnp.take_along_axis(offset_map.reshape(B, S * S, 2), idx[:, None, None], axis=1)[:, 0]

    bbox = jnp.stack([
        (idx_x + offset[:, 0]) / S,
        (idx_y + offset[:, 1]) / S,
        size[:, 0],
        size[:, 1],
    ], axis=1)
    return bbox, max_score


class MLPHead(nn.Module):
    """N-layer perceptron box head (relu between layers, none on the output).

    Rebuild of MLP (ViPT/lib/models/layers/head.py:204-221) as selected by
    build_box_head's "MLP" branch (head.py:227-229: hidden=input dim,
    out=4, 3 layers). The optional BN=True variant interleaves BatchNorm1d;
    tracking heads run it frozen, so FrozenBatchNorm stands in here.
    """
    hidden_dim: int
    out_dim: int = 4
    num_layers: int = 3
    use_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.out_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if self.use_bn:
                x = FrozenBatchNorm(name=f"bn_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class CornerPredictor(nn.Module):
    """Top-left / bottom-right corner heatmaps with soft-argmax decode.

    Rebuild of Corner_Predictor (head.py:24-95), used by the STARK/SPT family.
    Returns (B, 4) xyxy normalized to [0,1].
    """
    channel: int = 256
    feat_sz: int = 20
    stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_dist: bool = False):
        tl = _ConvTower(self.channel, 1, dtype=self.dtype, name="tl")(x)[..., 0]
        br = _ConvTower(self.channel, 1, dtype=self.dtype, name="br")(x)[..., 0]
        img_sz = self.feat_sz * self.stride
        coord = jnp.arange(self.feat_sz, dtype=jnp.float32) * self.stride
        cx = jnp.tile(coord[None, :], (self.feat_sz, 1)).reshape(-1)
        cy = jnp.tile(coord[:, None], (1, self.feat_sz)).reshape(-1)

        def soft_argmax(score):
            B = score.shape[0]
            prob = nn.softmax(score.reshape(B, -1).astype(jnp.float32), axis=1)
            return (prob * cx).sum(axis=1), (prob * cy).sum(axis=1), prob

        x_tl, y_tl, p_tl = soft_argmax(tl)
        x_br, y_br, p_br = soft_argmax(br)
        boxes = jnp.stack([x_tl, y_tl, x_br, y_br], axis=1) / img_sz
        if return_dist:
            # corner probability vectors (return_dist branch, head.py:57-62)
            return boxes, p_tl, p_br
        return boxes
