"""Fused Pallas kernel for the transformer MLP half-block.

XLA emits the fc2 matmul of every block fused with its residual adds and the
next LayerNorm's statistics, through a convolution-style emitter
("EmitAllBatchInSublanes") that achieves ~38% of bf16 peak while the
structurally identical fc1 matmul reaches ~85% (measured, docs/PERF.md
roofline — fc2-labeled fusions are 2.9 ms of a 9.7 ms B=16 ViT-B forward).
Fusion barriers around fc2 only recover ~2%, so the fix is to take the whole
half-block out of XLA's hands: this kernel computes

    y = x + fc2(gelu(fc1(LayerNorm(x))))

per batch element with both weight matrices VMEM-resident (they are fetched
once — their blocks are grid-invariant, so Mosaic's pipeline doesn't
re-stream them per cell) and the (L, 4C) hidden activation never touching
HBM. HBM traffic per block drops from ~5 tensor passes to exactly one read
of x and one write of y.

Numerics: LayerNorm statistics and both matmul accumulations in f32, hidden
activation rounded to the compute dtype between ops exactly where flax's
Dense/gelu boundary rounds — same formulation as layers.py::Mlp +
nn.LayerNorm, differing by summation-order rounding only (exact-erf gelu,
like the reference's nn.GELU). tests/test_flash_attn.py pins agreement in
interpret mode; serving opt-out MMTRACK_MLP=xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """f32 erf via Abramowitz & Stegun 7.1.26 (max abs error ~4e-7 in f32).

    Mosaic has no erf/erfc lowering; ~4e-7 is far below the bf16 rounding
    (rel eps ~8e-3) applied immediately after the gelu, so the fused path
    stays bit-comparable to XLA's exact erf at the bf16 level.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps: float):
    """One batch element. x ref: (1, L, C); o ref: (1, L, C)."""
    x = x_ref[0]                                       # (L, C) compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * g_ref[0] + b_ref[0]).astype(x.dtype)      # LN affine -> bf16
    h = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu_exact(h.astype(x.dtype).astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[0] = x + h.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def mlp_block_fused(x: jnp.ndarray, ln_scale: jnp.ndarray,
                    ln_bias: jnp.ndarray,
                    w1: jnp.ndarray, b1: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray,
                    eps: float = 1e-6,
                    interpret: bool = False) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LayerNorm(x)))), fused in VMEM.

    x: (B, L, C); ln_scale/ln_bias: (C,); w1: (C, H); b1: (H,);
    w2: (H, C); b2: (C,). Returns (B, L, C).
    """
    B, L, C = x.shape
    H = w1.shape[1]
    kernel = functools.partial(_mlp_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=interpret,
    )(x, ln_scale.reshape(1, C).astype(jnp.float32),
      ln_bias.reshape(1, C).astype(jnp.float32),
      w1.astype(x.dtype), b1.reshape(1, H).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, C).astype(jnp.float32))
