"""Pallas serving kernels vs their XLA reference formulations.

The fused kernels (ops/flash_attn.py, ops/mlp_fuse.py) are the TPU serving
path for the ViT-B non-CE blocks (models/layers.py::CEBlock/Attention);
these tests pin them to the einsum/Dense formulations in interpret mode.
Shapes are kept small: interpret mode emulates the kernel op-by-op on the
1-core CI host.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtrack_tpu.ops.flash_attn import attn_block_fused, flash_mhsa_qkv
from mmtrack_tpu.ops.mlp_fuse import _erf, mlp_block_fused


def _mhsa_ref(qkv, num_heads, scale):
    B, L, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    qr = qkv.reshape(B, L, 3, num_heads, D)
    q, k, v = qr[:, :, 0], qr[:, :, 1], qr[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, C)


@pytest.mark.parametrize("B,H,L,D", [(2, 4, 48, 16), (1, 2, 33, 8)])
def test_flash_mhsa_qkv_matches_einsum(B, H, L, D):
    C = H * D
    r = np.random.RandomState(0)
    qkv = jnp.asarray(r.randn(B, L, 3 * C), jnp.float32)
    scale = D ** -0.5
    out = flash_mhsa_qkv(qkv, H, scale, interpret=True)
    ref = _mhsa_ref(qkv, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attn_block_fused_matches_xla():
    B, H, L, D = 2, 4, 40, 16
    C = H * D
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(B, L, C) * 0.3, jnp.float32)
    g = jnp.asarray(1 + 0.1 * r.randn(C), jnp.float32)
    be = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    wqkv = jnp.asarray(r.randn(C, 3 * C) * 0.05, jnp.float32)
    bqkv = jnp.asarray(0.01 * r.randn(3 * C), jnp.float32)
    wp = jnp.asarray(r.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(0.01 * r.randn(C), jnp.float32)
    scale = D ** -0.5

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    att = _mhsa_ref(h @ wqkv + bqkv, H, scale)
    ref = x + att @ wp + bp

    out = attn_block_fused(x, g, be, wqkv, bqkv, wp, bp,
                           num_heads=H, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mlp_block_fused_matches_xla():
    B, L, C, H = 2, 24, 64, 256
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(B, L, C) * 0.3, jnp.float32)
    g = jnp.asarray(1 + 0.1 * r.randn(C), jnp.float32)
    be = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w1 = jnp.asarray(r.randn(C, H) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.01 * r.randn(H), jnp.float32)
    w2 = jnp.asarray(r.randn(H, C) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.01 * r.randn(C), jnp.float32)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    ref = x + jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2

    out = mlp_block_fused(x, g, be, w1, b1, w2, b2, interpret=True)
    # the kernel's polynomial erf is good to ~4e-7 absolute
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)


def test_polynomial_erf_accuracy():
    x = jnp.linspace(-6.0, 6.0, 4001)
    err = jnp.abs(_erf(x) - jax.lax.erf(x))
    assert float(err.max()) < 1e-6


def test_vipt_forward_fused_equals_xla_cpu():
    """On CPU both gates fall back to XLA — the flag must not change the
    model's param tree or output structure (full equality is asserted on
    TPU by the drive scripts; here we pin tree/shape invariance)."""
    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime

    cfg = vipt_experiment_config("deep_rgbd")
    rt = ViPTRuntime.from_config(cfg)
    model = build_viptrack(cfg)
    z = jnp.zeros((1, 128, 128, 6))
    x = jnp.zeros((1, 256, 256, 6))
    params = model.init(jax.random.PRNGKey(0), z, x, None, rt.ce_keep_lens)
    out = model.apply(params, z, x, None, rt.ce_keep_lens)
    assert out["score_map"].shape == (1, 16, 16)
