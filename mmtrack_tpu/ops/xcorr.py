"""Cross-correlation ops for Siamese trackers.

SiamFC's score map is the template embedding correlated over the search
embedding (summed over channels); SiamRPN++-style heads use the depthwise
(per-channel) variant. The reference repo documents SiamFC only as an empty
submodule (readme.md:41-47, RGBE/models/siamfc) — built here from the paper.

Two implementations of the depthwise variant: XLA grouped convolution and a
Pallas TPU kernel that keeps the search embedding in VMEM and accumulates the
fh*fw shifted products on the VPU (the op is tiny and bandwidth-bound; the
kernel avoids grouped-conv lowering overhead for the (22,22,256) x (6,6,256)
shape class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xcorr(z_feat: jnp.ndarray, x_feat: jnp.ndarray) -> jnp.ndarray:
    """SiamFC correlation: sum over channels.

    z_feat: (fh, fw, C) template embedding (the 'filter');
    x_feat: (N, H, W, C) search embeddings.
    Returns (N, H-fh+1, W-fw+1) VALID correlation map.
    """
    out = jax.lax.conv_general_dilated(
        x_feat, z_feat[..., None], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out[..., 0]


def depthwise_xcorr(z_feat: jnp.ndarray, x_feat: jnp.ndarray) -> jnp.ndarray:
    """Per-channel correlation (XLA grouped conv).

    z_feat: (fh, fw, C); x_feat: (N, H, W, C) -> (N, H', W', C)."""
    C = z_feat.shape[-1]
    kernel = z_feat.reshape(*z_feat.shape[:2], 1, C)  # HWIO with I/groups=1
    return jax.lax.conv_general_dilated(
        x_feat, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.float32)


def depthwise_xcorr_pallas(z_feat: jnp.ndarray, x_feat: jnp.ndarray) -> jnp.ndarray:
    """Pallas TPU kernel for the depthwise correlation.

    One program per batch element: search feat stays in VMEM; the fh*fw
    static shift-multiply-accumulate runs on the VPU with C on the lane
    dimension. Matches depthwise_xcorr exactly.
    """
    N, H, W, C = x_feat.shape
    fh, fw = z_feat.shape[0], z_feat.shape[1]
    oh, ow = H - fh + 1, W - fw + 1

    def kernel(z_ref, x_ref, out_ref):
        acc = jnp.zeros((oh, ow, C), jnp.float32)
        for a in range(fh):
            for b in range(fw):
                acc += x_ref[0, a:a + oh, b:b + ow, :] * z_ref[a, b, :]
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((fh, fw, C), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, C), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, oh, ow, C), jnp.float32),
    )(z_feat.astype(jnp.float32), x_feat.astype(jnp.float32))
