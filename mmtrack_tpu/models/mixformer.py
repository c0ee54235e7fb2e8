"""MixFormer-RGBD: dual CVT backbones with mixed attention + SPM score head.

Rebuild of RGBD/models/MixFormer_RGBD/lib/models/mixformer/
mixformerrgbd_online.py at the reference's published scale
(experiments/mixformerrgbd_online/baseline_large.yaml:42-75):
  - 3 CVT stages per backbone — conv token embedding (7/4/2pad, 3/2/1pad,
    3/2/1pad), dims (192, 768, 1024), depths (2, 2, 12), heads (3, 12, 16),
    QuickGELU MLPs, LayerNorm eps 1e-5;
  - Mixed Attention Module (Attention:84-398): depthwise-conv+frozen-BN
    q/k/v token projections (stride 1 for q, stride 2 for k/v) followed by
    linear projections; template+online-template queries attend template
    keys only, search queries attend everything. TPU redesign: the three
    regions stay separate NHWC maps (the reference repeatedly splits/merges
    one token tensor), so every conv is a plain strided depthwise conv and
    both attention calls are static-shape MXU matmuls;
  - RGB and depth streams run through two separate backbones, merged by
    elementwise max (MixFormerRGBDOnlineScore.merge:936-950);
  - Corner_Predictor box head (inplanes 1024, channel 384, frozen BN);
  - SPM ScoreDecoder (ScoreDecoder:769-827): a learned score token
    cross-attends (1) the PrRoI-pooled 4x4 predicted-box region of the
    search map and (2) the template map, through two decoder blocks, then a
    3-layer MLP yields the online-template confidence logit.

Weight conversion from reference checkpoints: models/convert.py
convert_mixformer_checkpoint (validated against the reference torch model
in tools/parity/check_mixformer.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.heads import CornerPredictor, FrozenBatchNorm
from mmtrack_tpu.models.layers import drop_path as _drop_path
from mmtrack_tpu.ops.prroi import prroi_pool


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


# Reference scale: baseline_large.yaml MODEL.BACKBONE.
CVT_LARGE = dict(
    stage_dims=(192, 768, 1024),
    stage_depths=(2, 2, 12),
    stage_heads=(3, 12, 16),
    patch_kernels=(7, 3, 3),
    patch_strides=(4, 2, 2),
    patch_paddings=(2, 1, 1),
    drop_path_rates=(0.0, 0.0, 0.3),
)


class ConvEmbed(nn.Module):
    """Conv token embedding + LayerNorm (ConvEmbed:453-487). Explicit
    padding: torch pads symmetrically, which differs from XLA 'SAME' for
    stride>1."""
    dim: int
    kernel: int
    stride: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((self.pad, self.pad), (self.pad, self.pad)),
                    dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class DWConvProj(nn.Module):
    """dw_bn q/k/v projection: depthwise 3x3 (no bias) + frozen BN
    (Attention._build_projection:137-160)."""
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Conv(C, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=C,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return FrozenBatchNorm(name="bn")(x)


class MixedAttention(nn.Module):
    """Asymmetric mixed attention (Attention.forward:239-297).

    Note the reference scales logits by dim**-0.5 (NOT head_dim**-0.5) —
    replicated for weight parity.
    """
    dim: int
    heads: int
    stride_kv: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, ot, s, ot_mask=None):
        """ot_mask (B, K) bool: validity of each online-template slot. Keys
        (and values) of invalid slots are masked out of BOTH attention calls
        with -inf logits, which reproduces the reference's variable-K
        `set_online` (mixformerrgbd_online.py:324-388, the ring grows from 1
        to ONLINE_SIZES over the first updates) with static shapes: softmax
        over the masked set is exactly softmax over the K'=n_valid subset.
        Invalid slots' QUERY rows produce garbage confined to those slots
        (convs/LayerNorm/MLP are per-template), never read downstream."""
        B = t.shape[0]
        hd = self.dim // self.heads
        scale = self.dim ** -0.5

        cq = DWConvProj(1, dtype=self.dtype, name="conv_proj_q")
        ck = DWConvProj(self.stride_kv, dtype=self.dtype, name="conv_proj_k")
        cv = DWConvProj(self.stride_kv, dtype=self.dtype, name="conv_proj_v")
        pq = nn.Dense(self.dim, dtype=self.dtype, name="proj_q")
        pk = nn.Dense(self.dim, dtype=self.dtype, name="proj_k")
        pv = nn.Dense(self.dim, dtype=self.dtype, name="proj_v")

        # ot carries K online templates as (B, K, H, W, C); convs see (B*K,...)
        K = ot.shape[1]
        ot_flat = ot.reshape((B * K,) + ot.shape[2:])

        def tokens(x):
            return x.reshape(B, -1, x.shape[-1])

        def heads(x):
            return x.reshape(B, -1, self.heads, hd)

        q_t, q_ot, q_s = (heads(pq(tokens(cq(m)))) for m in (t, ot_flat, s))
        k_t, k_ot, k_s = (heads(pk(tokens(ck(m)))) for m in (t, ot_flat, s))
        v_t, v_ot, v_s = (heads(pv(tokens(cv(m)))) for m in (t, ot_flat, s))

        q_mt = jnp.concatenate([q_t, q_ot], axis=1)
        k_mt = jnp.concatenate([k_t, k_ot], axis=1)
        v_mt = jnp.concatenate([v_t, v_ot], axis=1)

        mask_mt = None
        if ot_mask is not None:
            # per-slot validity -> per-key-token validity (Lk kv tokens per
            # online template after the stride-kv conv projection)
            lk_per = k_ot.shape[1] // K
            mask_mt = jnp.concatenate(
                [jnp.ones((B, k_t.shape[1]), bool),
                 jnp.repeat(ot_mask.astype(bool), lk_per, axis=1)], axis=1)

        def attend(q, k, v, key_mask=None):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            if key_mask is not None:
                logits = jnp.where(key_mask[:, None, None, :], logits,
                                   -jnp.inf)
            a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", a, v,
                              preferred_element_type=jnp.float32
                              ).astype(self.dtype).reshape(B, -1, self.dim)

        out_mt = attend(q_mt, k_mt, v_mt, mask_mt)
        mask_s = None
        if mask_mt is not None:
            mask_s = jnp.concatenate(
                [mask_mt, jnp.ones((B, k_s.shape[1]), bool)], axis=1)
        out_s = attend(q_s, jnp.concatenate([k_mt, k_s], axis=1),
                       jnp.concatenate([v_mt, v_s], axis=1), mask_s)

        proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        out_mt, out_s = proj(out_mt), proj(out_s)

        Lt = t.shape[1] * t.shape[2]
        return (out_mt[:, :Lt].reshape(t.shape[:3] + (self.dim,)),
                out_mt[:, Lt:].reshape(ot.shape[:4] + (self.dim,)),
                out_s.reshape(s.shape[:3] + (self.dim,)))


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)



class CvtBlock(nn.Module):
    """MAM block (Block:398-452): shared norms/attn/mlp applied across the
    three region maps (LayerNorm is per-token, so per-map application is
    identical to the reference's concatenated-token application)."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, ot, s, deterministic: bool = True, ot_mask=None):
        n1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        at, aot, as_ = MixedAttention(self.dim, self.heads, dtype=self.dtype,
                                      name="attn")(n1(t), n1(ot), n1(s),
                                                   ot_mask)
        if not deterministic and self.drop_path_rate > 0:
            rng = self.make_rng("drop_path")
            r1, r2, r3 = jax.random.split(rng, 3)
            at = _drop_path(at, self.drop_path_rate, deterministic, r1)
            aot = _drop_path(aot, self.drop_path_rate, deterministic, r2)
            as_ = _drop_path(as_, self.drop_path_rate, deterministic, r3)
        t, ot, s = t + at, ot + aot, s + as_

        n2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                  name="mlp")
        mt, mot, ms = mlp(n2(t)), mlp(n2(ot)), mlp(n2(s))
        if not deterministic and self.drop_path_rate > 0:
            rng = self.make_rng("drop_path")
            r1, r2, r3 = jax.random.split(rng, 3)
            mt = _drop_path(mt, self.drop_path_rate, deterministic, r1)
            mot = _drop_path(mot, self.drop_path_rate, deterministic, r2)
            ms = _drop_path(ms, self.drop_path_rate, deterministic, r3)
        return t + mt, ot + mot, s + ms


class CvtStage(nn.Module):
    """One VisionTransformer stage (VisionTransformer:489-594)."""
    dim: int
    depth: int
    heads: int
    patch_kernel: int
    patch_stride: int
    patch_pad: int
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, ot, s, deterministic: bool = True, ot_mask=None):
        embed = ConvEmbed(self.dim, self.patch_kernel, self.patch_stride,
                          self.patch_pad, dtype=self.dtype, name="patch_embed")
        B, K = ot.shape[0], ot.shape[1]
        t, s = embed(t), embed(s)
        ot = embed(ot.reshape((B * K,) + ot.shape[2:]))
        ot = ot.reshape((B, K) + ot.shape[1:])
        dpr = [self.drop_path_rate * j / max(self.depth - 1, 1)
               for j in range(self.depth)]
        for j in range(self.depth):
            t, ot, s = CvtBlock(self.dim, self.heads,
                                drop_path_rate=dpr[j], dtype=self.dtype,
                                name=f"blocks_{j}")(t, ot, s, deterministic,
                                                    ot_mask)
        return t, ot, s


class CvT(nn.Module):
    """One ConvolutionalVisionTransformer backbone
    (ConvolutionalVisionTransformer:668-736); returns the first-template and
    search feature maps (the unused classifier norm/head are dropped)."""
    stage_dims: tuple = CVT_LARGE["stage_dims"]
    stage_depths: tuple = CVT_LARGE["stage_depths"]
    stage_heads: tuple = CVT_LARGE["stage_heads"]
    patch_kernels: tuple = CVT_LARGE["patch_kernels"]
    patch_strides: tuple = CVT_LARGE["patch_strides"]
    patch_paddings: tuple = CVT_LARGE["patch_paddings"]
    drop_path_rates: tuple = CVT_LARGE["drop_path_rates"]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, ot, s, deterministic: bool = True, ot_mask=None):
        for i in range(len(self.stage_dims)):
            t, ot, s = CvtStage(
                self.stage_dims[i], self.stage_depths[i], self.stage_heads[i],
                self.patch_kernels[i], self.patch_strides[i],
                self.patch_paddings[i], self.drop_path_rates[i],
                dtype=self.dtype, name=f"stage{i}")(t, ot, s, deterministic,
                                                    ot_mask)
        return t, s


class ScoreDecoder(nn.Module):
    """SPM confidence decoder (ScoreDecoder:769-827)."""
    dim: int = 1024
    heads: int = 16
    pool_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, search_feat, template_feat, search_box_xyxy):
        """search_feat (B,Hs,Ws,C), template_feat (B,Ht,Wt,C), box normalized
        xyxy (B,4) -> score logit (B,)."""
        B, Hs, Ws, C = search_feat.shape
        hd = self.dim // self.heads
        scale = self.dim ** -0.5

        box = search_box_xyxy * Ws
        rois = jnp.concatenate(
            [jnp.arange(B, dtype=jnp.float32)[:, None], box], axis=1)
        pooled = prroi_pool(search_feat, rois, self.pool_size, self.pool_size,
                            1.0)  # (B, 4, 4, C)
        kv = [pooled.reshape(B, -1, C),
              template_feat.reshape(B, -1, C)]

        token = self.param("score_token", nn.initializers.normal(0.02),
                           (1, 1, self.dim))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            jnp.tile(token.astype(self.dtype), (B, 1, 1)))
        for i in range(2):
            q = nn.Dense(self.dim, dtype=self.dtype, name=f"proj_q_{i}")(x)
            k = nn.Dense(self.dim, dtype=self.dtype, name=f"proj_k_{i}")(kv[i])
            v = nn.Dense(self.dim, dtype=self.dtype, name=f"proj_v_{i}")(kv[i])
            q = q.reshape(B, -1, self.heads, hd)
            k = k.reshape(B, -1, self.heads, hd)
            v = v.reshape(B, -1, self.heads, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            x = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                           preferred_element_type=jnp.float32
                           ).astype(self.dtype).reshape(B, 1, self.dim)
            x = nn.Dense(self.dim, dtype=self.dtype, name=f"proj_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"norm2_{i}")(x)

        # 3-layer MLP score head (head.py MLP, relu between layers)
        h = x[:, 0]
        h = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="score_head_0")(h))
        h = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="score_head_1")(h))
        return nn.Dense(1, dtype=self.dtype, name="score_head_2")(h)[:, 0]


class MixFormer(nn.Module):
    """MixFormerRGBDOnlineScore (mixformerrgbd_online.py:830-950).

    __call__(template (B,128,128,C), online_template, search (B,320,320,C))
    with C=6 (RGB+aux through dual backbones, max-merged) or C=3 (single
    backbone). Returns {'pred_boxes' (B,4) cxcywh in [0,1], 'pred_scores'
    (B,) sigmoid confidence, 'score_logits' (B,) for BCE training}.
    """
    template_size: int = 128
    search_size: int = 320
    in_channels: int = 6
    head_channel: int = 384
    stage_dims: tuple = CVT_LARGE["stage_dims"]
    stage_depths: tuple = CVT_LARGE["stage_depths"]
    stage_heads: tuple = CVT_LARGE["stage_heads"]
    drop_path_rates: tuple = CVT_LARGE["drop_path_rates"]
    dtype: jnp.dtype = jnp.float32

    @property
    def feat_sz_s(self) -> int:
        return self.search_size // 16

    def _cvt(self, name):
        return CvT(stage_dims=self.stage_dims, stage_depths=self.stage_depths,
                   stage_heads=self.stage_heads,
                   drop_path_rates=self.drop_path_rates,
                   dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, template, online_template, search,
                 run_score_head: bool = True, deterministic: bool = True,
                 return_features: bool = False,
                 score_box_xyxy=None, ot_mask=None) -> dict:
        """score_box_xyxy: optional (B,4) normalized box for the SPM pooling
        region; defaults to the predicted box (training feeds GT boxes —
        forward_head, mixformerrgbd_online.py:907-917).
        ot_mask: optional (B, K) bool slot-validity mask — masked slots are
        excluded from attention exactly (see MixedAttention), reproducing
        the reference's grow-from-1 online-template ring."""
        if online_template.ndim == 4:      # single online template -> K=1
            online_template = online_template[:, None]
        if self.in_channels == 6:
            t_rgb, s_rgb = self._cvt("backbone")(
                template[..., :3], online_template[..., :3], search[..., :3],
                deterministic, ot_mask)
            t_d, s_d = self._cvt("backbone_depth")(
                template[..., 3:], online_template[..., 3:], search[..., 3:],
                deterministic, ot_mask)
            t_feat = jnp.maximum(t_rgb, t_d)     # merge_type 'max'
            s_feat = jnp.maximum(s_rgb, s_d)
        else:
            t_feat, s_feat = self._cvt("backbone")(
                template, online_template, search, deterministic, ot_mask)

        xyxy = CornerPredictor(channel=self.head_channel,
                               feat_sz=self.feat_sz_s, stride=16,
                               dtype=self.dtype, name="box_head")(s_feat)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        boxes = jnp.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                           xyxy[:, 3] - xyxy[:, 1]], axis=1)

        out = {"pred_boxes": boxes}
        if return_features:
            out["template_feat"] = t_feat
            out["search_feat"] = s_feat
        if run_score_head:
            roi = xyxy if score_box_xyxy is None else score_box_xyxy
            logits = ScoreDecoder(dim=self.stage_dims[-1],
                                  heads=self.stage_heads[-1],
                                  dtype=self.dtype, name="score_branch")(
                s_feat, t_feat, roi)
            out["score_logits"] = logits
            out["pred_scores"] = nn.sigmoid(logits)
        return out


def build_mixformer_rgbd(dtype=jnp.float32, **overrides) -> MixFormer:
    """Reference-scale MixFormer_RGBD (baseline_large.yaml)."""
    return MixFormer(dtype=dtype, **overrides)
