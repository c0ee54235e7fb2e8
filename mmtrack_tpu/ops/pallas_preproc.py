"""Fused Pallas preprocessing kernel: crop + bilinear resize + normalize.

The north-star design point (BASELINE.json): per-frame preprocessing
(template/search crop-resize + normalization) fuses into a Pallas kernel.
Formulation: the separable bilinear resample is two dense contractions with
closed-form hat-function weights (see ops/crop.py::crop_resize_mxu). The
kernel runs one program per channel plane: it derives the weight matrices
from the box scalars (SMEM), executes two 2D MXU matmuls on the VMEM-resident
plane and applies (x/255 - mean)/std in the epilogue — no intermediate HBM
round-trips, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def crop_resize_normalize_pallas(image: jnp.ndarray, box_xywh: jnp.ndarray,
                                 search_area_factor: float, out_size: int,
                                 mean: jnp.ndarray, std: jnp.ndarray,
                                 interpret: bool = False
                                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused equivalent of ops.crop.crop_resize_normalized.

    image: (H, W, C); box_xywh: (4,); mean/std: (C,).
    Returns (crop (out, out, C) float32, resize_factor ()).
    """
    H, W, C = image.shape
    S = out_size

    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * search_area_factor), 1.0)
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5)
    resize_factor = S / crop_sz
    geom = jnp.stack([x1, y1, crop_sz]).astype(jnp.float32)

    scale = (1.0 / (255.0 * std)).astype(jnp.float32)     # fold /255 into scale
    shift = (-mean / std).astype(jnp.float32)

    def kernel(geom_ref, scale_ref, shift_ref, img_ref, out_ref):
        c = pl.program_id(0)
        x1v = geom_ref[0]
        y1v = geom_ref[1]
        cs = geom_ref[2]

        # output-pixel source coordinates (cv2 half-pixel convention)
        j = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).astype(jnp.float32)[:, 0]
        s = jnp.clip((j + 0.5) * (cs / S) - 0.5, 0.0, cs - 1.0)

        def weights(offset, size):
            coords = offset + s  # (S,)
            pidx = jax.lax.broadcasted_iota(jnp.int32, (S, size), 1)
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None]
                                                 - pidx.astype(jnp.float32)))
            # reference border convention: last row/col never sampled
            return jnp.where(pidx < (size - 1), wgt, 0.0)

        wy = weights(y1v, H)  # (S, H)
        wx = weights(x1v, W)  # (S, W)

        plane = img_ref[0]  # (H, W) channel plane
        tmp = jax.lax.dot_general(
            wy, plane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (S, W)
        out = jax.lax.dot_general(
            tmp, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (S, S)
        out_ref[0] = out * scale_ref[c] + shift_ref[c]

    out = pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, S), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, S, S), jnp.float32),
        interpret=interpret,
        # Mosaic cannot cast uint8 in-kernel; the f32 cast and the CHW
        # transpose fuse into the HBM->VMEM staging on the XLA side
    )(geom, scale, shift,
      image.astype(jnp.float32).transpose(2, 0, 1))
    return out.transpose(1, 2, 0), resize_factor
