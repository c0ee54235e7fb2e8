"""Swin Transformer backbone (flax, NHWC) for the STARK/SPT family.

Rebuild of RGBD/models/SPT/lib/models/stark/swin_transformer.py (Swin-Tiny
default: embed 96, depths (2,2,6,2), heads (3,6,12,24), window 7): windowed
self-attention with learned relative-position bias, alternating shifted
windows, and patch merging between stages.

TPU notes: window partition/reverse are pure reshape+transpose (free under
XLA); the shifted-window attention mask and the relative-position index are
computed in numpy at trace time (frame sizes are static here), so the only
device work is dense matmuls over (num_windows*B, 49, C) token blocks —
MXU-friendly, no dynamic shapes anywhere.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) bucket index into the (2ws-1)^2 bias table
    (swin_transformer.py:96-112)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


@lru_cache(maxsize=None)
def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive (-100) attention mask for shifted windows
    (the img_mask construction in BasicLayer.forward)."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = (win[:, None, :] != win[:, :, None]).astype(np.float32) * -100.0
    return mask  # (num_windows, ws^2, ws^2)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(x: jnp.ndarray, ws: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin_transformer.py:71-146)."""
    dim: int
    window_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None = None):
        Bw, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           (self.num_heads, (2 * self.window_size - 1) ** 2))
        idx = _relative_position_index(self.window_size)
        logits = logits + table[:, jnp.asarray(idx)][None].astype(jnp.float32)
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bw // nW, nW, self.num_heads, N, N)
            logits = logits + jnp.asarray(mask)[None, :, None]
            logits = logits.reshape(Bw, self.num_heads, N, N)
        attn = jnp.astype(nn.softmax(logits, axis=-1), self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(Bw, N, C))


class SwinBlock(nn.Module):
    """SwinTransformerBlock (swin_transformer.py:153-238): (S)W-MSA + MLP,
    with right/bottom padding to window multiples."""
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        Hp = int(np.ceil(H / ws)) * ws
        Wp = int(np.ceil(W / ws)) * ws
        if Hp != H or Wp != W:
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        mask = None
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, ws, self.shift)
        xw = _window_partition(x, ws)
        xw = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype,
                             name="attn")(xw, mask)
        x = _window_reverse(xw, ws, B, Hp, Wp)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LN -> Dense(2C) (swin_transformer.py:241-277).
    Concat order [x0, x1, x2, x3] = [(even,even),(odd,even),(even,odd),
    (odd,odd)] matches the torch module for weight conversion."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin trunk exposing per-stage NHWC feature maps.

    Output layers 'stage0'..'stage3' at strides 4/8/16/32 with channels
    C*2^i; each tap goes through its own LayerNorm (the out_norm layers,
    swin_transformer.py:553-560). STARK consumes 'stage2' (stride 16).
    """
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_layers: Sequence[str] = ("stage2",)) -> dict:
        out = {}
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for b in range(depth):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                x = SwinBlock(dim, heads, self.window_size, shift,
                              dtype=self.dtype, name=f"stage{s}_{b}")(x)
            if f"stage{s}" in out_layers:
                out[f"stage{s}"] = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"out_norm{s}")(x)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{s}")(x)
                dim *= 2
        return out


def swin_tiny(dtype=jnp.float32) -> SwinTransformer:
    return SwinTransformer(dtype=dtype)
