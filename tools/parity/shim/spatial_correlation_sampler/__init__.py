"""Pure-torch stand-in for the `spatial-correlation-sampler` package.

The reference's KYS cost volume (keep_track_vot2021/ltr/models/motion/
cost_volume.py) imports SpatialCorrelationSampler, a CUDA extension not
available in this environment. This shim implements the package's public
documented semantics (github.com/ClementPinard/Pytorch-Correlation-
extension) in plain torch so the reference's own model code can execute
on CPU for the parity harness:

  out[b, pi, pj, i, j] = sum_{c, ki, kj}
      input1[b, c, i*stride + ki, j*stride + kj]
    * input2[b, c, i*stride + (pi - P//2)*dilation_patch + ki,
                   j*stride + (pj - P//2)*dilation_patch + kj]

with zero padding, kernel window ki/kj in [0, kernel), displacement grid
pi/pj in [0, patch_size). No normalization (the package sums raw
products). Unoptimized — parity harness use only.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class SpatialCorrelationSampler(nn.Module):
    def __init__(self, kernel_size=1, patch_size=1, stride=1, padding=0,
                 dilation=1, dilation_patch=1):
        super().__init__()
        assert dilation == 1, "shim supports dilation=1 only"
        self.kernel_size = kernel_size
        self.patch_size = patch_size
        self.stride = stride
        self.padding = padding
        self.dilation_patch = dilation_patch

    def forward(self, input1, input2):
        B, C, H, W = input1.shape
        k, P, s, pad = (self.kernel_size, self.patch_size, self.stride,
                        self.padding)
        dp = self.dilation_patch
        md = (P - 1) // 2
        # pad once; displacement shifts index into an extra md*dp margin
        in1 = F.pad(input1, (pad, pad, pad, pad))
        in2 = F.pad(input2, (pad + md * dp, pad + md * dp,
                             pad + md * dp, pad + md * dp))
        oH = (H + 2 * pad - k) // s + 1
        oW = (W + 2 * pad - k) // s + 1
        out = input1.new_zeros(B, P, P, oH, oW)
        box = input1.new_ones(1, 1, k, k)
        for pi in range(P):
            for pj in range(P):
                dy = (pi - md) * dp + md * dp
                dx = (pj - md) * dp + md * dp
                shifted = in2[:, :, dy:dy + H + 2 * pad,
                              dx:dx + W + 2 * pad]
                prod = (in1 * shifted).sum(dim=1, keepdim=True)
                corr = F.conv2d(prod, box, stride=s)
                out[:, pi, pj] = corr[:, 0]
        return out
