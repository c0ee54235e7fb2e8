"""LWL — "Learning What to Learn" few-shot segmentation tracker network.

TPU-native rebuild of the keep_track fork's LWL/LWTL model
(RGBD/models/keep_track_vot2021/ltr/models/lwl/{lwl_net,decoder,
label_encoder,linear_filter,initializer,loss_residual_modules,utils}.py):
a ResNet-50 backbone, a target model that is ONE grouped conv layer whose
weights ("filter") are produced per sequence by a few-shot learner, a label
encoder that turns segmentation masks into few-shot labels + spatial
importance weights, and a U-Net-style decoder (TSE/CAB/RRB) that turns the
target-model mask encodings back into a full-resolution segmentation.

The few-shot learner minimizes || W(y) * (f*x - E(y)) ||^2 + lambda ||f||^2
(LWTLResidual, loss_residual_modules.py:8-41) by Gauss-Newton steepest
descent — here ops/optimization.py::steepest_descent_gn over the filter
pytree, end-to-end differentiable so the label encoder / residual weights
can be meta-learned exactly like the reference's GNSteepestDescent.

The reference ships NO train settings and NO parameter file for LWL (its
ltr/train_settings and pytracking/parameter directories hold only
keep_track + alpha_refine); `build_lwl` defaults follow the in-tree
constructor signature (lwl_net.py:147-209: steepest_descent_resnet50),
and the published-paper scale (filter_size 3, 16 filters, label-encoder
dims (16, 32, 64)) is one constructor call away.

All maps NHWC; bicubic resizes use the torch a=-0.75 Keys kernel
(utils.interpolate / decoder Upsampler) rather than jax.image's
Catmull-Rom so the decoder output matches the reference bit-for-bit
within f32 rounding.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.dimp import instance_l2_norm
from mmtrack_tpu.models.heads import FrozenBatchNorm
from mmtrack_tpu.models.resnet import resnet50
from mmtrack_tpu.ops.optimization import steepest_descent_gn


# ------------------------------------------------------------------ resize


def _cubic_kernel(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w1 = (a + 2) * ax3 - (a + 3) * ax2 + 1
    w2 = a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a
    return jnp.where(ax <= 1, w1, jnp.where(ax < 2, w2, 0.0))


def _resize_axis_cubic(x: jnp.ndarray, axis: int, out_sz: int) -> jnp.ndarray:
    """Separable bicubic resize along one axis (half-pixel centers, border
    clamp — torch F.interpolate(mode='bicubic', align_corners=False))."""
    in_sz = x.shape[axis]
    if in_sz == out_sz:
        return x
    scale = in_sz / out_sz
    pos = (jnp.arange(out_sz, dtype=jnp.float32) + 0.5) * scale - 0.5
    base = jnp.floor(pos)
    frac = pos - base
    idx = base[:, None] + jnp.arange(-1, 3, dtype=jnp.float32)[None, :]
    w = _cubic_kernel(frac[:, None] - jnp.arange(-1, 3, dtype=jnp.float32)[None, :])
    idx = jnp.clip(idx, 0, in_sz - 1).astype(jnp.int32)       # (out, 4)
    gathered = jnp.take(x, idx.reshape(-1), axis=axis)
    shp = list(x.shape)
    shp[axis:axis + 1] = [out_sz, 4]
    gathered = gathered.reshape(shp)
    wshape = [1] * len(shp)
    wshape[axis], wshape[axis + 1] = out_sz, 4
    return (gathered * w.reshape(wshape)).sum(axis=axis + 1)


def resize_bicubic(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """(..., H, W, C) torch-compatible bicubic resize."""
    x = _resize_axis_cubic(x, x.ndim - 3, out_hw[0])
    return _resize_axis_cubic(x, x.ndim - 2, out_hw[1])


def interpolate(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear, half-pixel (lwl/utils.py interpolate, align_corners=False);
    (..., H, W, C)."""
    if x.shape[-3:-1] == tuple(out_hw):
        return x
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


# ----------------------------------------------------------------- modules


class _ConvBN(nn.Module):
    """conv_block (ltr/models/layers/blocks.py): Conv + optional BN +
    optional ReLU."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    batch_norm: bool = True
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.kernel // 2,) * 2] * 2,
                    dtype=self.dtype, name="conv")(x)
        if self.batch_norm:
            x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x) if self.relu else x


class _EncBasicBlock(nn.Module):
    """ResNet BasicBlock as used by the label encoder
    (label_encoder.py:16-20): the downsample branch is a plain biased 3x3
    conv (NOT the torchvision 1x1+BN), and BN is optional."""
    out_ch: int
    stride: int = 1
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = (self.stride, self.stride)
        y = nn.Conv(self.out_ch, (3, 3), strides=s, padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        if self.use_bn:
            y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        if self.use_bn:
            y = FrozenBatchNorm(name="bn2")(y)
        identity = nn.Conv(self.out_ch, (3, 3), strides=s,
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="downsample")(x)
        return nn.relu(y + identity)


class LabelEncoder(nn.Module):
    """ResidualDS16SW (label_encoder.py:9-55): mask (B, H, W) -> 16x
    downsampled few-shot label + spatial importance weights, each
    (B, H/16, W/16, num_filters). layer_dims = (d0, d1, d2, num_filters)
    (the module indexes all four — label_encoder.py:13-25)."""
    layer_dims: Sequence[int] = (16, 32, 64, 1)
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray):
        d0, d1, d2, nf = self.layer_dims
        x = mask[..., None]
        x = _ConvBN(d0, 3, stride=2, batch_norm=self.use_bn, relu=True,
                    dtype=self.dtype, name="conv_block")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = _EncBasicBlock(d1, stride=2, use_bn=self.use_bn,
                           dtype=self.dtype, name="res1")(x)
        x = _EncBasicBlock(d2, stride=2, use_bn=self.use_bn,
                           dtype=self.dtype, name="res2")(x)
        label = _ConvBN(nf, 3, batch_norm=self.use_bn, relu=True,
                        dtype=self.dtype, name="label_pred")(x)
        # samp_w_pred is zero-init with bias 1 (label_encoder.py:35-36)
        sw = nn.Conv(nf, (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones,
                     dtype=self.dtype, name="samp_w_pred")(x)
        return label, sw


class BoxLabelEncoder(nn.Module):
    """ResidualDS16FeatSWBoxCatMultiBlock (label_encoder.py:58-126): a box
    rasterized as a Gaussian at IMAGE resolution (bbox_to_gauss with the
    reference's int() truncations of x/y/w/h), bilinearly resized to the
    feature grid, concatenated with the target-model features, then a
    chain of stride-1 BasicBlocks + a final conv_block — the LWL-box
    variant's learned box->mask-encoding (lwl_box_net.py).

    layer_dims = (d0, ..., num_filters): residual chain feat_dim+1 -> d0
    -> ... -> d_{n-2}, label head d_{n-2} -> num_filters."""
    layer_dims: Sequence[int] = (64, 32, 16)
    gauss_scale: float = 0.25
    use_final_relu: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bb_xywh: jnp.ndarray, feat: jnp.ndarray,
                 image_hw: tuple[int, int]) -> jnp.ndarray:
        """bb (B, 4) image-coord xywh; feat (B, h, w, C) target-model
        features -> (B, h, w, num_filters) mask encoding."""
        H, W = image_hw
        bb = jnp.trunc(bb_xywh)                       # list(map(int, bb))
        cx = bb[:, 0] + bb[:, 2] / 2
        cy = bb[:, 1] + bb[:, 3] / 2
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        dx = (xs[None, :] - cx[:, None]) / (self.gauss_scale * bb[:, 2:3])
        dy = (ys[None, :] - cy[:, None]) / (self.gauss_scale * bb[:, 3:4])
        gauss = jnp.exp(-0.5 * (dy[:, :, None] ** 2 + dx[:, None, :] ** 2))

        h, w = feat.shape[1:3]
        g = interpolate(gauss[..., None], (h, w))
        x = jnp.concatenate([feat, g], axis=-1)
        for i, d in enumerate(self.layer_dims[:-1]):
            x = _EncBasicBlock(d, stride=1, use_bn=self.use_bn,
                               dtype=self.dtype, name=f"res_{i}")(x)
        return _ConvBN(self.layer_dims[-1], 3, batch_norm=self.use_bn,
                       relu=self.use_final_relu, dtype=self.dtype,
                       name="label_pred")(x)


class TSE(nn.Module):
    """Target Scale Estimation block (decoder.py:17-32)."""
    oc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ft, score, x=None):
        h = nn.Conv(self.oc, (1, 1), dtype=self.dtype, name="reduce_0")(ft)
        h = nn.relu(h)
        h = nn.Conv(self.oc, (1, 1), dtype=self.dtype, name="reduce_2")(h)
        hpool = h.mean(axis=(1, 2), keepdims=True) if x is None else x
        s = interpolate(score, h.shape[1:3])
        h = jnp.concatenate([h, s], axis=-1)
        nc = h.shape[-1]
        h = nn.relu(nn.Conv(nc, (3, 3), dtype=self.dtype,
                            name="transform_0")(h))
        h = nn.relu(nn.Conv(nc, (3, 3), dtype=self.dtype,
                            name="transform_2")(h))
        h = nn.relu(nn.Conv(self.oc, (3, 3), dtype=self.dtype,
                            name="transform_4")(h))
        return h, hpool


class CAB(nn.Module):
    """Channel Attention Block (decoder.py:35-54)."""
    oc: int
    deepest: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, deeper, shallower):
        shallow_pool = shallower.mean(axis=(1, 2), keepdims=True)
        deeper_pool = deeper if self.deepest \
            else deeper.mean(axis=(1, 2), keepdims=True)
        g = jnp.concatenate([shallow_pool, deeper_pool], axis=-1)
        g = nn.Conv(self.oc, (1, 1), dtype=self.dtype, name="convreluconv_0")(g)
        g = nn.relu(g)
        g = nn.Conv(self.oc, (1, 1), dtype=self.dtype, name="convreluconv_2")(g)
        inputs = shallower * jax.nn.sigmoid(g)
        return inputs + interpolate(deeper, inputs.shape[1:3])


class RRB(nn.Module):
    """Residual Refinement Block (decoder.py:57-69)."""
    oc: int
    use_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.oc, (1, 1), dtype=self.dtype, name="conv1x1")(x)
        y = nn.Conv(self.oc, (3, 3), dtype=self.dtype, name="bblock_0")(h)
        if self.use_bn:
            y = FrozenBatchNorm(name="bblock_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.oc, (3, 3), use_bias=False, dtype=self.dtype,
                    name="bblock_2")(y)
        return nn.relu(h + y)


class LWTLDecoder(nn.Module):
    """Segmentation decoder (decoder.py:87-160). Iterates deepest->shallow
    over the backbone layers, fusing the mask encoding at each scale."""
    in_channels: int = 1            # num_filters
    mdim: int = 64                  # out_channels
    ft_channels: Sequence[str] = ("layer4", "layer3", "layer2", "layer1")
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    OC = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 4}

    def setup(self):
        last = self.ft_channels[0]
        self.tse = {L: TSE(self.OC[L] * self.mdim, dtype=self.dtype,
                           name=f"TSE_{L}") for L in self.ft_channels}
        self.rrb1 = {L: RRB(self.OC[L] * self.mdim, self.use_bn,
                            dtype=self.dtype, name=f"RRB1_{L}")
                     for L in self.ft_channels}
        self.cab = {L: CAB(self.OC[L] * self.mdim, L == last,
                           dtype=self.dtype, name=f"CAB_{L}")
                    for L in self.ft_channels}
        self.rrb2 = {L: RRB(self.OC[L] * self.mdim, self.use_bn,
                            dtype=self.dtype, name=f"RRB2_{L}")
                     for L in self.ft_channels}
        self.proj = {L: nn.Conv(self.OC[L] * self.mdim, (1, 1),
                                dtype=self.dtype, name=f"proj_{L}")
                     for L in self.ft_channels[1:]}
        self.up_conv1 = nn.Conv(self.mdim // 2, (3, 3), dtype=self.dtype,
                                name="project_conv1")
        self.up_conv2 = nn.Conv(1, (3, 3), dtype=self.dtype,
                                name="project_conv2")

    def __call__(self, scores: jnp.ndarray, features: dict,
                 image_hw: tuple[int, int]) -> jnp.ndarray:
        """scores: (B, h, w, num_filters) mask encoding; features: dict of
        NHWC backbone maps; returns (B, H, W) raw segmentation scores."""
        x = None
        for L in self.ft_channels:
            ft = features[L]
            s = interpolate(scores, ft.shape[1:3])
            if x is not None:
                x = nn.relu(self.proj[L](x))
            h, hpool = self.tse[L](ft, s, x)
            h = self.rrb1[L](h)
            h = self.cab[L](hpool, h)
            x = self.rrb2[L](h)
        # Upsampler (decoder.py:72-84): 2x bicubic -> conv -> relu ->
        # bicubic to image size -> conv
        x = resize_bicubic(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = nn.relu(self.up_conv1(x))
        x = resize_bicubic(x, image_hw)
        return self.up_conv2(x)[..., 0]


class TargetModelFeatures(nn.Module):
    """residual_basic_block (target_classifier/features.py:9-28) at the
    lwl_net defaults: num_blocks BasicBlocks + optional final conv +
    InstanceL2Norm."""
    out_dim: int = 512
    num_blocks: int = 1
    final_conv: bool = False
    l2norm: bool = True
    filter_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        from mmtrack_tpu.models.resnet import BasicBlock
        for i in range(self.num_blocks):
            odim = feat.shape[-1] if i < self.num_blocks - 1 + int(self.final_conv) \
                else self.out_dim
            feat = BasicBlock(odim, dtype=self.dtype, name=f"block_{i}")(feat)
        if self.final_conv:
            feat = nn.Conv(self.out_dim, (3, 3), use_bias=False,
                           dtype=self.dtype, name="final_conv")(feat)
        if self.l2norm:
            scale = math.sqrt(1.0 / (self.out_dim * self.filter_size ** 2))
            feat = instance_l2_norm(feat, scale)
        return feat


def apply_target_model(feat: jnp.ndarray, filt: jnp.ndarray) -> jnp.ndarray:
    """Mask encoding = conv of the few-shot filter over the features
    (ltr/models/layers/filter.py apply_filter; single sequence).

    feat (N, H, W, C), filt (num_filters, fh, fw, C) -> (N, H, W, nf)."""
    return jax.lax.conv_general_dilated(
        feat, filt.transpose(1, 2, 3, 0), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def lwl_filter_residual(filt, feat, label, spatial_weight, sample_weight,
                        filter_reg):
    """LWTLResidual (loss_residual_modules.py:16-41): the few-shot
    learning residuals [W*(f*x - E(y)), lambda*f]. All per-sequence=1."""
    scores = apply_target_model(feat, filt)
    w = spatial_weight
    if sample_weight is not None:
        w = w * sample_weight.reshape(-1, 1, 1, 1)
    data = w * (scores - label)
    reg = filter_reg * filt.reshape(-1)
    return (data, reg)


def optimize_lwl_filter(filt, feat, label, spatial_weight, sample_weight,
                        filter_reg, num_iter, max_iter: int | None = None):
    """Gauss-Newton steepest descent on the LWL residual
    (GNSteepestDescent at lwl_net.py:192-194) via the shared pytree GN-SD.

    sample_weight=None means the spatial weights W(y) alone scale the
    residual (the reference's get_filter path, where few_shot_sw IS the
    optimizer's sample_weight — loss_residual_modules.py:28-30); a (N,)
    vector adds the memory's temporal weights on top
    (update_target_model, lwl.py:573-575).

    num_iter may be a traced scalar IF max_iter (a static int bound) is
    given: max_iter GN steps are compiled and the iterate freezes once
    i >= num_iter — the tracker's dynamic update schedule in one
    executable (the reference branches in python, lwl.py:560-564)."""
    res_fn = lambda f: lwl_filter_residual(f, feat, label, spatial_weight,
                                           sample_weight, filter_reg)
    if max_iter is None:
        return steepest_descent_gn(res_fn, filt, num_iter)
    x = filt
    for i in range(max_iter):
        x = jnp.where(i < num_iter, steepest_descent_gn(res_fn, x, 1), x)
    return x


class LWLNet(nn.Module):
    """LWTLNet (lwl_net.py:18-143). Defaults = the in-tree constructor
    signature steepest_descent_resnet50 (lwl_net.py:147-159); the paper
    configuration is filter_size=3, num_filters=16,
    label_encoder_dims=(16, 32, 64)."""
    filter_size: int = 1
    num_filters: int = 1
    optim_iter: int = 3
    optim_init_reg: float = 0.01
    out_feature_dim: int = 512
    # NB the in-tree signature says clf_feat_blocks=1/final_conv=False, but
    # that combination cannot run in torch (BasicBlock(1024, 512) with no
    # downsample breaks the residual add); the runnable configuration is
    # the DiMP clf-feature pattern: 0 blocks + a 3x3 final conv to 512.
    clf_feat_blocks: int = 0
    final_conv: bool = True
    # 3 dims + num_filters (the in-tree (1, 1) signature default is, like
    # clf_feat_blocks=1, not executable: ResidualDS16SW indexes
    # layer_dims[3]); (16, 32, 64) is the published encoder
    label_encoder_dims: Sequence[int] = (16, 32, 64)
    use_bn_in_label_enc: bool = True
    decoder_mdim: int = 64
    target_model_input_layer: str = "layer3"
    decoder_input_layers: Sequence[str] = ("layer4", "layer3", "layer2",
                                           "layer1")
    # LWL-box variant (lwl_box_net.py): a learned box->mask-encoding so the
    # tracker can initialize from a bounding box alone; (d0, ..., dn) with
    # num_filters appended like the mask label encoder
    use_box_encoder: bool = False
    box_label_encoder_dims: Sequence[int] = (64, 32)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = resnet50(self.dtype)
        self.tm_features = TargetModelFeatures(
            self.out_feature_dim, self.clf_feat_blocks, self.final_conv,
            filter_size=self.filter_size, dtype=self.dtype)
        self.label_encoder = LabelEncoder(
            tuple(self.label_encoder_dims) + (self.num_filters,),
            self.use_bn_in_label_enc, dtype=self.dtype)
        self.decoder = LWTLDecoder(self.num_filters, self.decoder_mdim,
                                   self.decoder_input_layers,
                                   use_bn=True, dtype=self.dtype)
        if self.use_box_encoder:
            self.box_label_encoder = BoxLabelEncoder(
                tuple(self.box_label_encoder_dims) + (self.num_filters,),
                dtype=self.dtype)
        # LWTLResidual's learnable regularization (meta-learned)
        self.filter_reg = self.param("filter_reg",
                                     lambda k: jnp.full((1,),
                                                        self.optim_init_reg))

    def extract_backbone(self, im: jnp.ndarray) -> dict:
        return self.feature_extractor(im, ("layer1", "layer2", "layer3",
                                           "layer4"))

    def extract_target_model_features(self, bfeat: dict) -> jnp.ndarray:
        return self.tm_features(bfeat[self.target_model_input_layer])

    def encode_labels(self, masks: jnp.ndarray):
        """(N, H, W) masks -> few-shot label + spatial weight, each
        (N, H/16, W/16, num_filters)."""
        return self.label_encoder(masks)

    def get_filter(self, feat, label, spatial_weight, sample_weight=None,
                   num_iter: Optional[int] = None):
        """FilterInitializerZero (initializer.py) + GN-SD optimization."""
        filt = jnp.zeros((self.num_filters, self.filter_size,
                          self.filter_size, self.out_feature_dim),
                         self.dtype)
        return optimize_lwl_filter(
            filt, feat, label, spatial_weight, sample_weight,
            self.filter_reg,
            self.optim_iter if num_iter is None else num_iter)

    def optimize_filter(self, filt, feat, label, spatial_weight,
                        sample_weight, num_iter, max_iter: int | None = None):
        return optimize_lwl_filter(filt, feat, label, spatial_weight,
                                   sample_weight, self.filter_reg, num_iter,
                                   max_iter)

    def segment(self, filt, tm_feat, bfeat, image_hw):
        """segment_target (lwl_net.py:118-128): mask encoding + decoder."""
        enc = apply_target_model(tm_feat, filt)
        return self.decoder(enc, bfeat, image_hw)

    def mask_from_box(self, bb_xywh, tm_feat, bfeat, image_hw):
        """The LWL-box init path (lwl.py:59-71): learned box->mask-encoding
        -> decoder. Returns RAW logits (B, H, W) — the tracker stores
        these as its first-frame wire (out['segmentation_raw'], lwl.py:74)
        and sigmoids them for the init mask."""
        enc = self.box_label_encoder(bb_xywh, tm_feat, image_hw)
        return self.decoder(enc, bfeat, image_hw)

    def __call__(self, train_im, test_im, train_masks,
                 num_refinement_iter: int = 2):
        """Training forward (lwl_net.py:34-116), single-step variant: learn
        the filter on the train frames, segment the test frames. The
        reference's sequential test-frame refinement loop is the tracker's
        job at inference; training uses the jit-friendly one-shot form."""
        bfeat_tr = self.extract_backbone(train_im)
        bfeat_te = self.extract_backbone(test_im)
        feat_tr = self.extract_target_model_features(bfeat_tr)
        feat_te = self.extract_target_model_features(bfeat_te)
        label, sw = self.encode_labels(train_masks)
        filt = self.get_filter(feat_tr, label, sw)
        return self.segment(filt, feat_te, bfeat_te, test_im.shape[1:3])


def build_lwl(dtype=jnp.float32, **overrides) -> LWLNet:
    return LWLNet(dtype=dtype, **overrides)


def build_lwl_paper(dtype=jnp.float32) -> LWLNet:
    """The published LWL configuration (paper sec. 4: 16 filters of size 3,
    deeper label encoder). The reference tree ships no train settings for
    LWL, so these dims are paper-based."""
    return LWLNet(filter_size=3, num_filters=16,
                  label_encoder_dims=(16, 32, 64), optim_iter=5, dtype=dtype)
