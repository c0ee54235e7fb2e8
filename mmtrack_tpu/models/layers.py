"""Transformer building blocks (flax.linen, NHWC/token-major, MXU-friendly).

TPU-native rebuild of ViPT/lib/models/layers/{attn.py,attn_blocks.py,
patch_embed.py}: fused-QKV attention that only materializes the probability
matrix when candidate elimination needs it (other blocks stay fully fused by
XLA), static-shape CE blocks, stochastic depth via explicit RNG.
"""

from __future__ import annotations

import os as _os
from functools import lru_cache
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.ops.ce import candidate_elimination


@lru_cache(maxsize=None)
def rpe_index_concat(z_size: int, x_size: int) -> np.ndarray:
    """Relative-position bucket indices for concatenated [template; search]
    self-attention.

    Static rebuild of generate_2d_concatenated_self_attention_relative_
    positional_encoding_index (ViPT/lib/models/layers/rpe.py:27-58): each
    (query, key) pair maps to a bucket keyed by (dh, dw, query-origin,
    key-origin), where origin distinguishes template vs search tokens.
    Computed once in numpy at trace time — a compile-time constant gather
    table, never on device.
    """
    def grid(n):
        h, w = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return h.ravel(), w.ravel()

    zh, zw = grid(z_size)
    xh, xw = grid(x_size)
    h = np.concatenate([zh, xh])
    w = np.concatenate([zw, xw])
    origin = np.concatenate([np.zeros(z_size * z_size, np.int64),
                             np.ones(x_size * x_size, np.int64)])
    n = h.shape[0]
    key = np.stack([h[:, None] - h[None, :], w[:, None] - w[None, :],
                    np.broadcast_to(origin[:, None], (n, n)),
                    np.broadcast_to(origin[None, :], (n, n))], axis=-1)
    _, inverse = np.unique(key.reshape(-1, 4), axis=0, return_inverse=True)
    return inverse.reshape(n, n)


class PatchEmbed(nn.Module):
    """Image to patch tokens: Conv(k=stride=patch) then flatten.

    Equivalent of ViPT/lib/models/layers/patch_embed.py; NHWC input.
    (A space-to-depth + matmul reformulation was measured on TPU and lost
    to the conv emitter — the input transpose costs more than the conv
    saves; see docs/PERF.md.)
    """
    embed_dim: int = 768
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype, name="proj")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


_ATTN_IMPL = _os.environ.get("MMTRACK_ATTN", "fused")


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention.

    Mirrors ViPT/lib/models/layers/attn.py:9-60. When `return_attn` is False
    the probability matrix is never materialized (XLA fuses the softmax into
    the two matmuls); CE blocks set it True to rank search tokens.
    """
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    rpe: bool = False          # 2D concatenated relative position bias
    z_size: int = 8            # template tokens per side (rpe only)
    x_size: int = 16           # search tokens per side (rpe only)

    def _rpe_bias(self) -> jnp.ndarray:
        """(1, H, N, N) learned relative-position bias (attn.py:23-31,44-45)."""
        index = rpe_index_concat(self.z_size, self.x_size)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (self.num_heads, int(index.max()) + 1))
        return table[:, jnp.asarray(index)][None].astype(jnp.float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, L, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)

        scale = head_dim ** -0.5
        # Fused VMEM-resident attention on TPU (ops/flash_attn.py) unless the
        # caller needs the probability matrix (CE ranking) or the rpe bias.
        # The kernel consumes the qkv projection in its native (B, L, 3C)
        # layout — no reshapes or transposes anywhere. The einsum path below
        # is the reference semantics; the kernel matches it to summation-
        # order rounding (tests/test_flash_attn.py). MMTRACK_ATTN=xla opts
        # out for A/B timing and debugging.
        use_fused = (not return_attn and not self.rpe
                     and _ATTN_IMPL != "xla"
                     and self.dtype == jnp.bfloat16
                     and jax.default_backend() in ("tpu", "axon"))
        if use_fused:
            from mmtrack_tpu.ops.flash_attn import flash_mhsa_qkv
            out = flash_mhsa_qkv(qkv, self.num_heads, scale)  # (B, L, C)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out), None

        qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if self.rpe:
            logits = logits + self._rpe_bias()
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(B, L, C)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        if return_attn:
            return out, attn
        return out, None


class AttentionTalkingHead(nn.Module):
    """Talking-heads attention (ViPT/lib/models/layers/attn.py:62-130).

    Head-mixing linear maps before (proj_l) and after (proj_w) the softmax
    — https://arxiv.org/abs/2003.02436 — with the same optional 2D
    concatenated relative-position bias as `Attention`. The head-mixing
    einsums contract the (small) head axis, so XLA keeps them on the MXU
    fused with the score matmuls.
    """
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    rpe: bool = True
    z_size: int = 8
    x_size: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, L, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if self.rpe:
            index = rpe_index_concat(self.z_size, self.x_size)
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                (self.num_heads, int(index.max()) + 1))
            logits = logits + table[:, jnp.asarray(index)][None].astype(jnp.float32)

        wl = self.param("proj_l", nn.initializers.lecun_normal(),
                        (self.num_heads, self.num_heads))
        bl = self.param("proj_l_bias", nn.initializers.zeros, (self.num_heads,))
        logits = jnp.einsum("bhqk,hg->bgqk", logits, wl) + bl[None, :, None, None]
        attn = jax.nn.softmax(logits, axis=-1)
        ww = self.param("proj_w", nn.initializers.lecun_normal(),
                        (self.num_heads, self.num_heads))
        bw = self.param("proj_w_bias", nn.initializers.zeros, (self.num_heads,))
        attn = (jnp.einsum("bhqk,hg->bgqk", attn, ww)
                + bw[None, :, None, None]).astype(self.dtype)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(B, L, C))


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth: drop a residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class CEBlock(nn.Module):
    """Transformer block with optional candidate elimination after attention.

    Equivalent of CEBlock (ViPT/lib/models/layers/attn_blocks.py:78-104), but
    the kept-token count is a static argument so shapes stay compile-time
    constant (lens_keep=None means no elimination this block).
    """
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, global_index_t, global_index_s,
                 box_mask_z=None, lens_keep: Optional[int] = None,
                 deterministic: bool = True):
        lens_t = global_index_t.shape[1]
        lens_s = global_index_s.shape[1]
        needs_ce = lens_keep is not None and lens_keep < lens_s

        ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        attention = Attention(self.dim, self.num_heads, self.qkv_bias,
                              dtype=self.dtype, name="attn")
        # Fused half-blocks on TPU (ops/{flash_attn,mlp_fuse}.py): XLA's fc2
        # emitter runs at ~38% of peak vs fc1's ~85%, and the attention
        # middle round-trips scores + qkv through HBM (docs/PERF.md). The
        # kernels compute x + proj(mhsa(qkv(LN1(x)))) and
        # x + fc2(gelu(fc1(LN2(x)))) with weights VMEM-resident. Training
        # (stochastic depth active) and CE blocks (need the probability
        # matrix) keep the XLA path.
        # bf16 only: at f32 the half-block's weights alone (fc1+fc2 ~19 MB)
        # exceed the 16 MB scoped-VMEM limit — the f32 parity/debug path
        # keeps XLA.
        use_fused = (_ATTN_IMPL != "xla"
                     and _os.environ.get("MMTRACK_MLP", "fused") != "xla"
                     and (deterministic or self.drop_path_rate == 0.0)
                     and self.dtype == jnp.bfloat16
                     and jax.default_backend() in ("tpu", "axon"))
        if use_fused and not needs_ce and not attention.rpe and self.qkv_bias:
            from mmtrack_tpu.ops.flash_attn import attn_block_fused
            ln1(x[:, :1]); attention(x[:, :1])  # bind identical param tree
            pv = lambda m: self.get_variable("params", m)
            x = attn_block_fused(
                x, pv("norm1")["scale"], pv("norm1")["bias"],
                pv("attn")["qkv"]["kernel"], pv("attn")["qkv"]["bias"],
                pv("attn")["proj"]["kernel"], pv("attn")["proj"]["bias"],
                num_heads=self.num_heads,
                scale=(self.dim // self.num_heads) ** -0.5, eps=1e-6)
        else:
            h = ln1(x)
            attn_out, attn = attention(h, return_attn=needs_ce)
            if not deterministic and self.drop_path_rate > 0:
                rng = self.make_rng("drop_path")
                attn_out = drop_path(attn_out, self.drop_path_rate,
                                     deterministic, rng)
            x = x + attn_out

        removed_index_s = None
        if needs_ce:
            x, global_index_s, removed_index_s = candidate_elimination(
                attn, x, lens_t, lens_keep, global_index_s, box_mask_z)

        ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                  dtype=self.dtype, name="mlp")
        if use_fused:
            from mmtrack_tpu.ops.mlp_fuse import mlp_block_fused
            ln2(x[:, :1]); mlp(x[:, :1])  # bind identical param tree
            pv = lambda m: self.get_variable("params", m)
            x = mlp_block_fused(
                x, pv("norm2")["scale"], pv("norm2")["bias"],
                pv("mlp")["fc1"]["kernel"], pv("mlp")["fc1"]["bias"],
                pv("mlp")["fc2"]["kernel"], pv("mlp")["fc2"]["bias"],
                eps=1e-6)
            return x, global_index_t, global_index_s, removed_index_s
        h = ln2(x)
        mlp_out = mlp(h)
        if not deterministic and self.drop_path_rate > 0:
            rng = self.make_rng("drop_path")
            mlp_out = drop_path(mlp_out, self.drop_path_rate, deterministic, rng)
        x = x + mlp_out
        return x, global_index_t, global_index_s, removed_index_s
