"""ATOM network: ResNet-18 features + AtomIoUNet (no learned classifier —
ATOM's classifier is built ONLINE from the factorized filter optimized by
Gauss-Newton CG; see trackers/atom_tracker.py).

Rebuild of RGBD/models/DeT/ltr/models/bbreg/atom.py (ATOMnet:7-56,
atom_resnet18:177-189, ATOMnet_DeT:58-160 for the dual-backbone RGBD
variants DeT_ATOM_{Max,Mean,MC}).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mmtrack_tpu.models.dimp import AtomIoUNet
from mmtrack_tpu.models.resnet import resnet18


class ATOMNet(nn.Module):
    """Backbone (x2 for DeT) + IoUNet. Classification features are the raw
    layer3 activations (256-d for ResNet-18)."""
    merge_type: str | None = None     # None | max | mean | mul | conv
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = resnet18(self.dtype)
        if self.merge_type is not None:
            self.backbone_x = resnet18(self.dtype)
            if self.merge_type == "conv":
                self.merge_conv2 = nn.Conv(128, (1, 1), name="merge_conv2")
                self.merge_conv3 = nn.Conv(256, (1, 1), name="merge_conv3")
        # resnet18: layer2 = 128ch (stride 8), layer3 = 256ch (stride 16)
        self.bb_regressor = AtomIoUNet(input_dim=(128, 256),
                                       name="bb_regressor")

    def _merge(self, a, b, layer):
        m = self.merge_type
        if m == "max":
            return jnp.maximum(a, b)
        if m == "mean":
            return 0.5 * (a + b)
        if m == "mul":
            return a * b
        if m == "conv":
            conv = self.merge_conv2 if layer == "layer2" else self.merge_conv3
            return conv(jnp.concatenate([a, b], axis=-1))
        raise ValueError(m)

    def extract_backbone(self, im: jnp.ndarray) -> dict:
        if self.merge_type is None:
            return self.backbone(im[..., :3], ("layer2", "layer3"))
        f_rgb = self.backbone(im[..., :3], ("layer2", "layer3"))
        f_x = self.backbone_x(im[..., 3:6], ("layer2", "layer3"))
        return {k: self._merge(f_rgb[k], f_x[k], k) for k in f_rgb}

    def __call__(self, train_im: jnp.ndarray, train_bb: jnp.ndarray,
                 test_proposals: jnp.ndarray) -> jnp.ndarray:
        """Training-style forward (ATOMnet.forward, atom.py:25-56): IoU
        prediction for proposals; also materializes every submodule so
        `init` creates the full parameter tree."""
        feat = self.extract_backbone(train_im)
        return self.bb_regressor(
            [feat["layer2"], feat["layer3"]],
            [feat["layer2"], feat["layer3"]], train_bb, test_proposals)


def build_atom(dtype=jnp.float32) -> ATOMNet:
    """Plain RGB ATOM (atom_resnet18, default.py parameters)."""
    return ATOMNet(merge_type=None, dtype=dtype)


def build_det_atom(merge_type: str = "max", dtype=jnp.float32) -> ATOMNet:
    """DeT ATOM RGBD variants (DeT_ATOM_{Max,Mean,MC} parameter files)."""
    return ATOMNet(merge_type=merge_type, dtype=dtype)
