"""KYS — "Know Your Surroundings" scene-propagation tracker network.

TPU-native rebuild of the keep_track fork's KYS model
(RGBD/models/keep_track_vot2021/ltr/models/tracking/kysnet.py:123-184 and
ltr/models/motion/{resp_predictor,cost_volume,conv_gru,motion_predictor}.py):
a DiMP-50 base (backbone + steepest-descent classifier + ATOM IoUNet — all
reused from models/dimp.py) plus a dense scene-propagation module that
carries an 8-dim latent state per search-region cell across frames:

  1. a local cost volume between the previous and current frame's layer3
     features (CostVolume kernel 3, max displacement 9, absolute-coordinate
     output — cost_volume.py:8-75),
  2. two softmax normalizations of the processed cost volume giving
     propagation weights (where did each cell go / come from —
     resp_predictor.py:482-489),
  3. state propagation + a ConvGRU state update (conv_gru.py:6-44),
  4. a small CNN that fuses the propagated state, the DiMP confidence and
     the propagation confidence into the final response
     (resp_predictor.py:412-563).

TPU-first formulation: the cost volume is ONE batched matmul over flattened
positions (MXU) followed by a 9-tap diagonal box-sum and a static
displacement mask — not a CUDA correlation sampler; everything is NHWC,
static-shape, jit-compatible.

The reference ships NO trained KYS checkpoint hook-up and NO parameter file
for this tracker (pytracking/parameter/ holds only keep_track and
alpha_refine); converter support targets the public upstream kys.pth
naming. Defaults below follow kysnet_res50's constructor signature.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.dimp import build_dimp50
from mmtrack_tpu.models.heads import FrozenBatchNorm


# ------------------------------------------------------------- cost volume


def local_cost_volume(feat_cur: jnp.ndarray, feat_prev: jnp.ndarray,
                      max_disp: int = 9, kernel: int = 3) -> jnp.ndarray:
    """Absolute-coordinate local cost volume (cost_volume.py:8-75).

    corr[b, q, p] = sum_{k in KxK} <f_cur[p + k], f_prev[q + k]> for
    |q - p| <= max_disp per axis, 0 outside the window — the
    SpatialCorrelationSampler(kernel, 2*max_disp+1) output followed by
    remap_cost_volume, with f_cur as the reference frame
    (motion_predictor.py:237-242, use_current_frame_as_ref=True).

    feat_*: (B, H, W, C). Returns (B, H*W_prev, H, W_cur) ready for the
    response predictor. The full H*W x H*W correlation is one batched
    matmul (MXU-friendly); the kernel aggregation is a diagonal box-sum
    (both coordinates shift together), and the displacement window is a
    static mask.
    """
    B, H, W, C = feat_cur.shape
    f1 = feat_cur.reshape(B, H * W, C)
    f2 = feat_prev.reshape(B, H * W, C)
    # h[p_cur, q_prev] — single large contraction
    # HIGHEST precision: the MXU's default bf16 mantissa visibly quantizes
    # raw feature correlations; this contraction is small (HW x HW x C).
    h = jnp.einsum("bpc,bqc->bpq", f1, f2,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    h5 = h.reshape(B, H, W, H, W)

    r = kernel // 2
    hp = jnp.pad(h5, ((0, 0), (r, r), (r, r), (r, r), (r, r)))
    out = jnp.zeros_like(h5)
    for ky in range(kernel):
        for kx in range(kernel):
            out = out + hp[:, ky:ky + H, kx:kx + W, ky:ky + H, kx:kx + W]

    iy = jnp.arange(H)
    ix = jnp.arange(W)
    mask_y = (jnp.abs(iy[:, None] - iy[None, :]) <= max_disp)
    mask_x = (jnp.abs(ix[:, None] - ix[None, :]) <= max_disp)
    # out[p=(py,px), q=(qy,qx)] -> keep |qy-py|<=md and |qx-px|<=md
    mask = (mask_y[:, None, :, None] & mask_x[None, :, None, :])
    out = jnp.where(mask, out, 0.0)
    # (B, py, px, qy, qx) -> (B, q, py, px): dim1 indexes the PREV position
    return out.transpose(0, 3, 4, 1, 2).reshape(B, H * W, H, W)


def shift_features(feat: jnp.ndarray, t_norm: jnp.ndarray) -> jnp.ndarray:
    """Sub-pixel translation by bilinear resampling (motion layers.py:22-29).

    Equivalent of affine_grid + grid_sample(zeros padding,
    align_corners=False) with T = [I | t]: output[y, x] =
    input[y + t_y*H/2, x + t_x*W/2], zero outside.

    feat: (H, W, C) or (B, H, W, C); t_norm: (2,) as (t_x, t_y) in
    normalized [-1, 1] units (the torch affine_grid convention).
    """
    squeeze = feat.ndim == 3
    if squeeze:
        feat = feat[None]
    B, H, W, C = feat.shape
    sy = t_norm[1] * H / 2.0
    sx = t_norm[0] * W / 2.0
    yy = jnp.arange(H, dtype=jnp.float32) + sy
    xx = jnp.arange(W, dtype=jnp.float32) + sx

    def sample_1(img):  # (H, W)
        return jax.scipy.ndimage.map_coordinates(
            img, jnp.meshgrid(yy, xx, indexing="ij"), order=1, mode="constant")

    out = jax.vmap(jax.vmap(sample_1, in_axes=-1, out_axes=-1))(feat)
    return out[0] if squeeze else out


def center_shift_translation(box_xywh: jnp.ndarray, feat_hw: tuple[int, int],
                             feature_stride: int = 16) -> jnp.ndarray:
    """Normalized translation that centers `box` (crop coords) in the
    feature map (CenterShiftFeatures, motion layers.py:32-48). Returns
    (t_x, t_y) for shift_features."""
    H, W = feat_hw
    c_x = (box_xywh[0] + box_xywh[2] * 0.5) / feature_stride
    c_y = (box_xywh[1] + box_xywh[3] * 0.5) / feature_stride
    t_x = 2.0 * (c_x - W * 0.5) / W
    t_y = 2.0 * (c_y - H * 0.5) / H
    return jnp.stack([t_x, t_y])


# ---------------------------------------------------------------- modules


class _ConvBN(nn.Module):
    """conv_block (ltr/models/layers/blocks.py): Conv + optional BN +
    optional ReLU; submodules named conv/bn for checkpoint conversion."""
    out_ch: int
    kernel: int = 3
    batch_norm: bool = True
    relu: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        if self.batch_norm:
            x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x) if self.relu else x


class ConvGRUCell(nn.Module):
    """Convolutional GRU (conv_gru.py:6-44), NHWC."""
    hidden_dim: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel, self.kernel)
        xh = jnp.concatenate([x, h], axis=-1)
        reset = jax.nn.sigmoid(
            nn.Conv(self.hidden_dim, k, padding="SAME", dtype=self.dtype,
                    name="conv_reset")(xh))
        update = jax.nn.sigmoid(
            nn.Conv(self.hidden_dim, k, padding="SAME", dtype=self.dtype,
                    name="conv_update")(xh))
        xh_r = jnp.concatenate([x, reset * h], axis=-1)
        h_new = jnp.tanh(
            nn.Conv(self.hidden_dim, k, padding="SAME", dtype=self.dtype,
                    name="conv_state_new")(xh_r))
        return (1.0 - update) * h + update * h_new


class ResponsePredictor(nn.Module):
    """Scene-propagation response predictor (resp_predictor.py:412-563).

    All maps NHWC; cost_volume comes in as (B, HW_prev, H, W). Returns
    (fused_response (B, H, W), new_state (B, H, W, state_dim), aux dict).
    """
    state_dim: int = 8
    representation_dims: Sequence[int] = (64, 32)
    gru_ksz: int = 3
    conf_measure: str = "max"           # 'max' | 'entropy' | 'none'
    dimp_thresh: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cost_volume_proc1 = [
            _ConvBN(8, 3, batch_norm=True, relu=True, dtype=self.dtype),
            _ConvBN(1, 3, batch_norm=True, relu=False, dtype=self.dtype)]
        self.cost_volume_proc2 = [
            _ConvBN(8, 3, batch_norm=True, relu=True, dtype=self.dtype),
            _ConvBN(1, 3, batch_norm=True, relu=False, dtype=self.dtype)]
        self.representation_predictor = [
            _ConvBN(d, 3, batch_norm=False, relu=True, dtype=self.dtype)
            for d in self.representation_dims]
        self.response_predictor = _ConvBN(1, 3, batch_norm=False, relu=False,
                                          dtype=self.dtype)
        self.state_predictor = ConvGRUCell(self.state_dim, self.gru_ksz,
                                           dtype=self.dtype)
        self.init_hidden_state_predictor = _ConvBN(
            self.state_dim, 3, batch_norm=False, relu=False, use_bias=False,
            dtype=self.dtype)
        self.is_target_predictor = [
            _ConvBN(4, self.gru_ksz, batch_norm=False, relu=True,
                    dtype=self.dtype),
            _ConvBN(1, self.gru_ksz, batch_norm=False, relu=False,
                    dtype=self.dtype)]

    def _seq(self, blocks, x):
        for b in blocks:
            x = b(x)
        return x

    def init_state(self, init_label: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W) Gaussian label -> (B, H, W, state_dim) initial state
        (init_hidden_state_predictor + tanh, resp_predictor.py:449-451)."""
        return jnp.tanh(self.init_hidden_state_predictor(init_label[..., None]))

    def __call__(self, cost_volume: jnp.ndarray, state_prev: jnp.ndarray,
                 dimp_score_cur: jnp.ndarray,
                 dimp_thresh: Optional[float] = None,
                 output_window: Optional[jnp.ndarray] = None):
        if dimp_thresh is None:
            dimp_thresh = self.dimp_thresh
        B, P, H, W = cost_volume.shape
        aux = {}

        # "where did each prev cell go": softmax over current positions
        cv = cost_volume.reshape(B * P, H, W, 1)
        p1 = self._seq(self.cost_volume_proc1, cv).reshape(B * P, H * W)
        p1 = jax.nn.softmax(p1, axis=-1)
        # "where did each current cell come from": softmax over prev cells
        p2 = self._seq(self.cost_volume_proc2,
                       p1.reshape(B * P, H, W, 1)).reshape(B, P, H, W)
        p2 = jax.nn.softmax(p2, axis=1)
        aux["cost_volume_processed"] = p2

        aux["is_target"] = self._seq(self.is_target_predictor, state_prev)[..., 0]

        # propagate the state along the propagation weights
        w = p2.reshape(B, P, H * W)
        state_flat = state_prev.reshape(B, P, self.state_dim)
        propagated = jnp.einsum("bpq,bpd->bqd", w, state_flat)
        propagated = propagated.reshape(B, H, W, self.state_dim)
        aux["propagated_h"] = propagated
        aux["is_target_after_prop"] = self._seq(self.is_target_predictor,
                                                propagated)[..., 0]

        score = dimp_score_cur[..., None]  # (B, H, W, 1)
        if self.conf_measure == "max":
            conf = w.max(axis=1).reshape(B, H, W, 1)
        elif self.conf_measure == "entropy":
            conf = -(w * jnp.log(w + 1e-4)).sum(axis=1).reshape(B, H, W, 1)
        if self.conf_measure != "none":
            aux["propagation_conf"] = conf[..., 0]
            pred_in = jnp.concatenate([propagated, score, conf], axis=-1)
        else:
            pred_in = jnp.concatenate([propagated, score], axis=-1)

        rep = self._seq(self.representation_predictor, pred_in)
        fused = jax.nn.sigmoid(self.response_predictor(rep))  # (B, H, W, 1)
        aux["fused_score_orig"] = fused[..., 0]

        if dimp_thresh is not None:
            fused = fused * (score > dimp_thresh).astype(fused.dtype)
        if output_window is not None:
            fused = fused * output_window[None, :, :, None]

        # GRU update on (dimp score, fused, global max of each)
        scores_cat = jnp.concatenate([score, fused], axis=-1)  # (B,H,W,2)
        pooled = scores_cat.max(axis=(1, 2), keepdims=True)
        pooled = jnp.broadcast_to(pooled, scores_cat.shape)
        gru_in = jnp.concatenate([scores_cat, pooled], axis=-1)  # (B,H,W,4)
        state_new = self.state_predictor(gru_in, propagated)
        aux["is_target_new"] = self._seq(self.is_target_predictor,
                                         state_new)[..., 0]
        return fused[..., 0], state_new, aux


class KYSNet(nn.Module):
    """KYSNet (kysnet.py:17-110): a DiMP-50 (`dimp` submodule — backbone,
    classifier, IoUNet) + the scene-propagation ResponsePredictor.

    Motion features are the raw layer3 backbone features
    (PredictorWrapper.extract_motion_feat, motion_predictor.py:244-248:
    identity, no pooling). fix_coordinate_shift=True (the PredictorWrapper
    default) lives in the tracker runtime, which owns all shift logic.
    """
    state_dim: int = 8
    representation_dims: Sequence[int] = (64, 32)
    gru_ksz: int = 3
    conf_measure: str = "max"
    cv_max_displacement: int = 9
    cv_kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dimp = build_dimp50(self.dtype)
        self.predictor = ResponsePredictor(
            self.state_dim, self.representation_dims, self.gru_ksz,
            self.conf_measure, dtype=self.dtype)

    # --- DiMP delegation (tracker runtime calls these via apply(method=)) --
    @property
    def bb_regressor(self):
        # the shared DiMP helpers reach the IoUNet as m.bb_regressor
        return self.dimp.bb_regressor

    def extract_backbone(self, im):
        return self.dimp.extract_backbone(im)

    def extract_classification_feat(self, bfeat):
        return self.dimp.extract_classification_feat(bfeat)

    def get_filter(self, clf_feat, bb):
        return self.dimp.get_filter(clf_feat, bb)

    def optimize_filter(self, w, feat, bb, sample_weight=None, num_iter=0):
        return self.dimp.optimize_filter(w, feat, bb, sample_weight, num_iter)

    def classify(self, w, feat):
        return self.dimp.classify(w, feat)

    # --- motion path ------------------------------------------------------
    def motion_feat(self, bfeat: dict) -> jnp.ndarray:
        return bfeat["layer3"]

    def init_motion_state(self, init_label):
        return self.predictor.init_state(init_label)

    def predict_response(self, feat_prev, feat_cur, state_prev,
                         dimp_score_cur, dimp_thresh=None,
                         output_window=None):
        """PredictorWrapper.predict_response (motion_predictor.py:250-315)
        minus the coordinate-shift bookkeeping (tracker-owned)."""
        cv = local_cost_volume(feat_cur, feat_prev,
                               self.cv_max_displacement, self.cv_kernel_size)
        return self.predictor(cv, state_prev, dimp_score_cur,
                              dimp_thresh, output_window)

    def __call__(self, train_im, test_im, train_bb, test_proposals):
        """Training forward on the DiMP base (the predictor is trained by
        the KYS actor through predict_response on frame pairs)."""
        return self.dimp(train_im, test_im, train_bb, test_proposals)

    def init_forward(self, train_im, test_im, train_bb, test_proposals):
        """Init-time forward touching EVERY submodule (flax only creates
        params for modules traced at init): the DiMP base + one predictor
        pass on the test features."""
        out = self.dimp(train_im, test_im, train_bb, test_proposals)
        bfeat = self.dimp.extract_backbone(test_im)
        f = self.motion_feat(bfeat)
        B, S = f.shape[0], f.shape[1]
        label = jnp.zeros((B, S, S), f.dtype)
        state = self.predictor.init_state(label)
        score = jnp.zeros((B, S, S), f.dtype)
        self.predict_response(f, f, state, score)
        return out


def build_kysnet(dtype=jnp.float32) -> KYSNet:
    """kysnet_res50 constructor defaults (kysnet.py:123-184)."""
    return KYSNet(dtype=dtype)
