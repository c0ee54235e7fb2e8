"""MixFormer: convolutional vision transformer with mixed attention + SPM
score decoder for online template update.

Rebuild of RGBD/models/MixFormer_RGBD/lib/models/mixformer/
mixformerrgbd_online.py (ConvolutionalVisionTransformer:453+,
ScoreDecoder:586+, MixFormerOnlineScore:771-894), re-designed TPU-first:
  - 3 CVT stages (conv token embedding stride 4/2/2, dims 64/192/384) where
    template(s) and search are embedded jointly,
  - Mixed Attention Module (MAM): depthwise-conv q/k/v projections; template
    queries attend only to template keys (keeping the template clean), search
    queries attend to everything — implemented as two static-shape attention
    calls instead of masks,
  - corner head on the search feature map,
  - SPM ScoreDecoder: learned query cross-attends pooled template-target and
    search tokens to produce the online-update confidence.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.heads import CornerPredictor


class ConvEmbed(nn.Module):
    dim: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class ConvProj(nn.Module):
    """CVT depthwise-conv token projection (3x3, per template/search map)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Conv(C, (3, 3), padding="SAME", feature_group_count=C,
                    dtype=self.dtype, name="dw")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="pw")(x)


class MixedAttention(nn.Module):
    """Asymmetric mixed attention over (template, search) feature maps.

    t: (B, Ht, Wt, C) template map (possibly the two templates stacked along
    height), s: (B, Hs, Ws, C). Template tokens attend template-only; search
    tokens attend the concatenation (mixformer paper MAM).
    """
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, s):
        hd = self.dim // self.heads
        B = t.shape[0]
        q_proj = ConvProj(self.dim, dtype=self.dtype, name="q")
        k_proj = ConvProj(self.dim, dtype=self.dtype, name="k")
        v_proj = ConvProj(self.dim, dtype=self.dtype, name="v")

        def tok(x):
            return x.reshape(B, -1, self.heads, hd)

        qt, qs = tok(q_proj(t)), tok(q_proj(s))
        kt, ks = tok(k_proj(t)), tok(k_proj(s))
        vt, vs = tok(v_proj(t)), tok(v_proj(s))

        def attend(q, k, v):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                                preferred_element_type=jnp.float32)
            a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", a, v,
                              preferred_element_type=jnp.float32).astype(self.dtype)

        k_all = jnp.concatenate([kt, ks], axis=1)
        v_all = jnp.concatenate([vt, vs], axis=1)
        out_t = attend(qt, kt, vt).reshape(*t.shape[:-1], self.dim)
        out_s = attend(qs, k_all, v_all).reshape(*s.shape[:-1], self.dim)
        proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        return proj(out_t), proj(out_s)


class MAMBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, s):
        n1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        at, as_ = MixedAttention(self.dim, self.heads, dtype=self.dtype,
                                 name="attn")(n1(t), n1(s))
        t, s = t + at, s + as_
        n2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        mlp = nn.Sequential([
            nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype),
            nn.gelu,
            nn.Dense(self.dim, dtype=self.dtype),
        ])
        return t + mlp(n2(t)), s + mlp(n2(s))


class MixFormer(nn.Module):
    """MixFormer tracker model.

    __call__(template (B,Tz,Tz,C), online_template (B,Tz,Tz,C),
    search (B,Tx,Tx,C)) -> {'pred_boxes' (B,4) cxcywh in [0,1]}.
    """
    template_size: int = 128
    search_size: int = 320
    stage_dims: tuple[int, ...] = (64, 192, 384)
    stage_depths: tuple[int, ...] = (1, 4, 6)
    stage_heads: tuple[int, ...] = (1, 3, 6)
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def feat_sz_s(self) -> int:
        return self.search_size // 16

    def setup(self):
        self.embeds = [ConvEmbed(self.stage_dims[0], 7, 4, name="embed_0"),
                       ConvEmbed(self.stage_dims[1], 3, 2, name="embed_1"),
                       ConvEmbed(self.stage_dims[2], 3, 2, name="embed_2")]
        blocks = []
        for si, (d, n, h) in enumerate(zip(self.stage_dims, self.stage_depths,
                                           self.stage_heads)):
            blocks.append([MAMBlock(d, h, dtype=self.dtype,
                                    name=f"s{si}_b{bi}") for bi in range(n)])
        self.blocks = blocks
        self.box_head = CornerPredictor(channel=self.stage_dims[-1],
                                        feat_sz=self.feat_sz_s, stride=16,
                                        dtype=self.dtype, name="box_head")
        # SPM score decoder (ScoreDecoder analog): learned query cross-attends
        # search tokens conditioned on the pooled template target
        self.score_query = self.param("score_query",
                                      nn.initializers.normal(0.02),
                                      (1, self.stage_dims[-1]))
        self.score_attn = MixedAttention(self.stage_dims[-1], 6, dtype=self.dtype,
                                         name="score_attn")
        self.score_mlp = nn.Sequential([
            nn.Dense(self.stage_dims[-1], dtype=self.dtype), nn.relu,
            nn.Dense(1, dtype=self.dtype)])

    def backbone(self, template, online_template, search):
        """Joint CVT over the two templates and the search region."""
        # stack templates along height so conv stages treat them jointly
        t = jnp.concatenate([template, online_template], axis=1)
        s = search
        for embed, stage in zip(self.embeds, self.blocks):
            t = embed(t)
            s = embed(s)
            for block in stage:
                t, s = block(t, s)
        return t, s

    def forward_head(self, s_feat):
        xyxy = self.box_head(s_feat)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return jnp.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                          xyxy[:, 3] - xyxy[:, 1]], axis=1)

    def predict_score(self, t_feat, s_feat):
        """SPM confidence for online-template selection -> (B,) in (0,1)."""
        B = s_feat.shape[0]
        q = jnp.tile(self.score_query[None], (B, 1, 1)).reshape(B, 1, 1, -1)
        _, out = self.score_attn(s_feat, q)  # query attends search+itself
        return nn.sigmoid(self.score_mlp(out.reshape(B, -1)))[:, 0]

    def __call__(self, template, online_template, search) -> dict:
        t_feat, s_feat = self.backbone(template, online_template, search)
        boxes = self.forward_head(s_feat)
        score = self.predict_score(t_feat, s_feat)
        return {"pred_boxes": boxes, "pred_scores": score}
