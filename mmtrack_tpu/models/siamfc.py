"""SiamFC: fully-convolutional Siamese tracker.

The reference documents SiamFC as an RGB-E method with an empty submodule
(readme.md:41-47; RGBE/benchmark.py:25-49 shows the intended `python test.py`
invocation). Built here from the SiamFC paper (Bertinetto et al., ECCV'16
workshops): AlexNet-style embedding (total stride 8, no padding), template
127x127 -> 6x6x256 embedding correlated over the 255x255 search embedding
(22x22x256) giving a 17x17 score map. Supports 6-channel multi-modal input
by widening the stem (RGB-E composition feeds both triplets).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mmtrack_tpu.models.heads import FrozenBatchNorm
from mmtrack_tpu.ops.xcorr import xcorr


class AlexNetEmbed(nn.Module):
    """SiamFC embedding network (AlexNet variant, VALID padding, stride 8)."""
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv_bn(x, ch, k, s=1, groups=1, relu=True, name=""):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                        feature_group_count=groups, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            x = FrozenBatchNorm(name=f"{name}_bn")(x)
            return nn.relu(x) if relu else x

        x = conv_bn(x, 96, 11, 2, name="conv1")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = conv_bn(x, 256, 5, 1, groups=2, name="conv2")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = conv_bn(x, 384, 3, 1, name="conv3")
        x = conv_bn(x, 384, 3, 1, groups=2, name="conv4")
        # canonical SiamFC ends with a bare conv5 — no norm on the final
        # embedding (a per-channel affine before correlation would also be
        # unportable from reference weights)
        x = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                    feature_group_count=2, dtype=self.dtype,
                    name="conv5_conv")(x)
        return x


class SiamFC(nn.Module):
    """Embedding + correlation with the learned output scale.

    __call__(template (N,127,127,C), search (N,255,255,C)) -> (N,17,17)
    score maps; `embed` and `correlate` are exposed separately for the
    tracker (template embedded once at init).
    """
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = AlexNetEmbed(dtype=self.dtype, name="embedding")
        # SiamFC scales the raw correlation by a learned factor (~1e-3)
        self.scale = self.param("response_scale",
                                nn.initializers.constant(1e-3), (1,))
        self.bias = self.param("response_bias", nn.initializers.zeros, (1,))

    def embed(self, im: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(im)

    def correlate(self, z_feat: jnp.ndarray, x_feat: jnp.ndarray) -> jnp.ndarray:
        """z_feat (fh,fw,C), x_feat (N,H,W,C) -> (N, H', W') scaled scores."""
        return self.scale[0] * xcorr(z_feat, x_feat) + self.bias[0]

    def __call__(self, template: jnp.ndarray, search: jnp.ndarray) -> jnp.ndarray:
        z = self.embed(template)
        x = self.embed(search)
        # per-sample correlation (template batch pairs with search batch)
        import jax
        return jax.vmap(lambda zf, xf: self.correlate(zf, xf[None])[0])(z, x)
