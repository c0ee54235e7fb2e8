"""VITAL: adversarial feature-mask learning on the MDNet chassis.

Rebuild of RGBE/models/pyVITAL/gnet/{g_init.py,g_pretrain.py} + its tracking
loop: a generator G produces a (3,3) spatial dropout mask over the conv3
feature map; during offline/online updates G is trained to produce masks
that degrade the classifier (keeping it robust to appearance variation),
while the classifier trains against G's hardest masks. Tracking itself is
the standard MDNet candidate protocol (mmtrack_tpu.trackers.mdnet_tracker)
with the VITAL-trained weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GNet(nn.Module):
    """Mask generator: conv3 features -> (3, 3) spatial mask (g_init.py)."""
    feat_hw: int = 3
    feat_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_flat: jnp.ndarray) -> jnp.ndarray:
        """(N, 3*3*512) -> (N, 3, 3) mask in (0, 1)."""
        h = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(feat_flat))
        m = nn.Dense(self.feat_hw * self.feat_hw, dtype=self.dtype, name="fc2")(h)
        return nn.sigmoid(m).reshape(-1, self.feat_hw, self.feat_hw)


def apply_mask(feat_flat: jnp.ndarray, mask: jnp.ndarray,
               feat_hw: int = 3, feat_dim: int = 512) -> jnp.ndarray:
    """Broadcast the (3,3) spatial mask over channels of flattened conv3."""
    n = feat_flat.shape[0]
    f = feat_flat.reshape(n, feat_hw, feat_hw, feat_dim)
    return (f * mask[..., None]).reshape(n, -1)


def hardest_fixed_mask(score_fn, feat_flat: jnp.ndarray,
                       feat_hw: int = 3, feat_dim: int = 512) -> jnp.ndarray:
    """VITAL's g_pretrain trick: among the 9 one-cell-dropped masks pick the
    one that hurts the positive score most (the classifier then trains
    against it)."""
    n_cells = feat_hw * feat_hw
    masks = 1.0 - jnp.eye(n_cells).reshape(n_cells, feat_hw, feat_hw)

    def pos_score(mask):
        masked = apply_mask(feat_flat, jnp.tile(mask[None], (feat_flat.shape[0], 1, 1)),
                            feat_hw, feat_dim)
        # reference ranks by the SOFTMAX positive probability
        # (g_pretrain.py:44 out_layer='fc6_softmax'), which depends on
        # logit1 - logit0, not the raw positive logit
        logits = score_fn(masked)
        return jax.nn.softmax(logits, axis=-1)[:, 1].mean()

    scores = jax.vmap(pos_score)(masks)
    return masks[jnp.argmin(scores)]


def g_loss(g_params, gnet: GNet, score_fn, pos_feats: jnp.ndarray) -> jnp.ndarray:
    """Generator objective: minimize the classifier's positive score on
    masked features (adversarial)."""
    mask = gnet.apply(g_params, pos_feats)
    masked = apply_mask(pos_feats, mask)
    return score_fn(masked)[:, 1].mean()
