"""Fused multi-head self-attention Pallas kernel for short token streams.

The tracking workload's attention is small (64 template + 256 search = 320
tokens max, shrinking to 153 after candidate elimination) but XLA's generic
path still round-trips the (B, H, L, L) score tensor through HBM three times
per block (logits write, softmax read/write, PV read), plus three
(B, L, H, D) -> (B, H, L, D) transposes — measured ~2.2 ms of a 10.1 ms
ViT-B forward at B=16 (see docs/PERF.md roofline). At these sizes the whole
problem fits in VMEM, so this kernel needs no online-softmax tiling at all
(unlike the long-context flash kernels): one grid cell per batch element
consumes the fused-QKV projection output *as laid out by the Dense matmul*
((B, L, 3*H*D), so no transposes or reshapes at all), computes every head's
softmax(q k^T / sqrt(d)) v with scores resident in VMEM, and writes the
output token-major so the output projection reads it directly.

Numerics: q is scaled in the input dtype before the dot, logits and softmax
in f32 (max-subtracted, like jax.nn.softmax), matmul accumulation f32 —
the exact formulation of the einsum path in models/layers.py::Attention,
differing only by summation-order rounding. The einsum path remains the
reference semantics (and the only path with `return_attn`, which candidate
elimination needs); tests/test_flash_attn.py pins kernel-vs-einsum
agreement in interpret mode and the serving opt-out is MMTRACK_ATTN=xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mhsa_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                 scale: float):
    """One batch element: full softmax attention for every head in VMEM.

    qkv ref: (1, L, 3*H*D) — the raw fused-QKV projection row layout
    [q_0..q_{H-1} | k_0..k_{H-1} | v_0..v_{H-1}], each head D lanes wide.
    o ref: (1, L, H*D) — head h lands at lane offset h*D (a 4D strided
    store is an unsupported Mosaic shape cast, so the layout stays 2D).
    """
    D = head_dim
    C = num_heads * D
    for h in range(num_heads):
        q = qkv_ref[0, :, h * D:(h + 1) * D] * jnp.asarray(scale,
                                                           qkv_ref.dtype)
        k = qkv_ref[0, :, C + h * D:C + (h + 1) * D]
        v = qkv_ref[0, :, 2 * C + h * D:2 * C + (h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (L, L) f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / s).astype(v.dtype)
        out = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (L, D)
        o_ref[0, :, h * D:(h + 1) * D] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "interpret"))
def flash_mhsa_qkv(qkv: jnp.ndarray, num_heads: int, scale: float,
                   interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v from a fused-QKV projection.

    qkv: (B, L, 3*C) exactly as produced by the qkv Dense layer; returns
    (B, L, C) token-major — ready for the output projection with no
    layout change anywhere.
    """
    B, L, C3 = qkv.shape
    C = C3 // 3
    head_dim = C // num_heads
    kernel = functools.partial(_mhsa_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _attn_block_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                       wp_ref, bp_ref, o_ref, *, num_heads: int,
                       scale: float, eps: float):
    """One batch element of the full attention half-block:
    x + proj(mhsa(qkv(LayerNorm(x)))). x/o refs: (1, L, C)."""
    x = x_ref[0]                                       # (L, C) compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * g_ref[0] + b_ref[0]).astype(x.dtype)
    qkv = (jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[0]).astype(x.dtype)                 # (L, 3C)
    L = x.shape[0]
    C = x.shape[1]
    D = C // num_heads
    parts = []
    for hh in range(num_heads):
        q = qkv[:, hh * D:(hh + 1) * D] * jnp.asarray(scale, x.dtype)
        k = qkv[:, C + hh * D:C + (hh + 1) * D]
        v = qkv[:, 2 * C + hh * D:2 * C + (hh + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / s).astype(x.dtype)
        parts.append(jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
    att = jnp.concatenate(parts, axis=-1)              # (L, C) token-major
    out = jax.lax.dot_general(
        att, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bp_ref[0]
    o_ref[0] = x + out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "eps",
                                             "interpret"))
def attn_block_fused(x: jnp.ndarray, ln_scale: jnp.ndarray,
                     ln_bias: jnp.ndarray,
                     wqkv: jnp.ndarray, bqkv: jnp.ndarray,
                     wproj: jnp.ndarray, bproj: jnp.ndarray,
                     num_heads: int, scale: float, eps: float = 1e-6,
                     interpret: bool = False) -> jnp.ndarray:
    """x + proj(mhsa(qkv(LayerNorm(x)))) — the whole pre-CE attention
    half-block in one kernel; HBM sees one read of x and one write of the
    result. x: (B, L, C); wqkv: (C, 3C); wproj: (C, C)."""
    B, L, C = x.shape
    kernel = functools.partial(_attn_block_kernel, num_heads=num_heads,
                               scale=scale, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=interpret,
    )(x, ln_scale.reshape(1, C).astype(jnp.float32),
      ln_bias.reshape(1, C).astype(jnp.float32),
      wqkv.astype(x.dtype), bqkv.reshape(1, 3 * C).astype(jnp.float32),
      wproj.astype(x.dtype), bproj.reshape(1, C).astype(jnp.float32))
