"""STARK / SPT: encoder-decoder transformer tracker with corner head.

Rebuild of RGBD/models/SPT/lib/models/stark/{stark_s.py,stark_st.py,
transformer.py,head.py}: ResNet-50 layer3 features bottlenecked to d=256,
DETR sine positional encodings, post-norm encoder layers over the
template+search token sequence, 1-query decoder (with final norm), and the
corner head driven by the decoder-modulated encoder memory
(stark_s.py:87-102). The SPT VOT22-RGBD variant (six_channel=True) runs a
6-layer encoder PER modality over dual-backbone tokens, fuses them through
a 1x1 Conv1d neck + 2-layer fusion encoder (transformer.py:36-121), then
decodes from the fused memory. STARK-ST's 3-layer MLP classification head
(template-update gating) is the `score_head` option. Weight conversion:
models/convert.py convert_stark_checkpoint, validated at full scale in
tools/parity/check_stark.py.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.heads import CornerPredictor
from mmtrack_tpu.models.resnet import resnet50


def sine_position_embedding(h: int, w: int, dim: int = 256,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR 2D sine positional embedding -> (h*w, dim)."""
    half = dim // 2
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    scale = 2 * math.pi
    ys = ys / h * scale
    xs = xs / w * scale
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = xs[..., None] / dim_t
    pos_y = ys[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(h * w, dim)


def sine_position_embedding_masked(not_mask: jnp.ndarray, dim: int = 256,
                                   temperature: float = 10000.0) -> jnp.ndarray:
    """Mask-aware DETR sine embedding (PositionEmbeddingSine,
    SPT/lib/models/stark/position_encoding.py:27-48, normalize=True):
    coordinates are cumulative sums over the VALID region, so padded crops
    keep the valid area spanning the full [0, 2pi) range.

    not_mask (B, h, w) float/bool, True(1)=valid -> (B, h*w, dim)."""
    half = dim // 2
    nm = not_mask.astype(jnp.float32)
    B, h, w = nm.shape
    eps = 1e-6
    scale = 2 * math.pi
    ys = jnp.cumsum(nm, axis=1)
    xs = jnp.cumsum(nm, axis=2)
    ys = ys / (ys[:, -1:, :] + eps) * scale
    xs = xs / (xs[:, :, -1:] + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = xs[..., None] / dim_t
    pos_y = ys[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(B, h, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(B, h, w, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(B, h * w, dim)


class _MHA(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None):
        """key_padding_mask (B, L_k) bool, True = masked (the torch
        nn.MultiheadAttention convention): masked keys get -inf logits."""
        hd = self.dim // self.heads
        B = q.shape[0]
        qh = nn.Dense(self.dim, dtype=self.dtype, name="q")(q).reshape(B, -1, self.heads, hd)
        kh = nn.Dense(self.dim, dtype=self.dtype, name="k")(k).reshape(B, -1, self.heads, hd)
        vh = nn.Dense(self.dim, dtype=self.dtype, name="v")(v).reshape(B, -1, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * hd ** -0.5, kh,
                            preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :],
                               -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.reshape(B, -1, self.dim))


class EncoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_padding_mask=None):
        q = k = x + pos
        y = _MHA(self.dim, self.heads, dtype=self.dtype, name="self_attn")(
            q, k, x, key_padding_mask=key_padding_mask)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + y)
        y = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(x)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos,
                 memory_key_padding_mask=None):
        q = k = tgt + query_pos
        y = _MHA(self.dim, self.heads, dtype=self.dtype, name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + y)
        y = _MHA(self.dim, self.heads, dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, memory + mem_pos, memory,
            key_padding_mask=memory_key_padding_mask)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + y)
        y = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(tgt)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + y)


class STARK(nn.Module):
    """STARK-S/ST tracker model.

    __call__(template (B,Tz,Tz,C), search (B,Tx,Tx,C)) -> dict with
    pred_boxes (B, 4) cxcywh normalized.

    six_channel=True is the SPT architecture (SPT/lib/models/stark/
    stark_s.py + transformer.py:36-78): separate color/depth ResNet-50
    (layer3) backbones and bottlenecks, a 6-layer encoder PER modality over
    the template+search token sequence, channel concat -> 1x1 neck ->
    2-layer fusion encoder, then the 1-query decoder and corner head on the
    fused memory. six_channel=False is the original RGB STARK-S (single
    backbone + 6-layer encoder). `score_head` adds the ST2 confidence
    branch (stark_st2 cls head).
    """
    template_size: int = 128
    search_size: int = 320
    dim: int = 256
    heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    fusion_layers: int = 2          # TRANSFORMER.FUS_LAYERS (config.py:28)
    six_channel: bool = False
    score_head: bool = False
    # SPT's backbone menu (backbone.py:59-75,101-116 + repvgg.py,
    # swin_transformer.py): 'resnet50' | 'repvgg_a0' | 'swin_tiny', all
    # tapped at stride 16 before the bottleneck.
    backbone_type: str = "resnet50"
    dtype: jnp.dtype = jnp.float32

    @property
    def feat_sz_s(self) -> int:
        return self.search_size // 16

    def _make_backbone(self, name: str):
        if self.backbone_type == "repvgg_a0":
            from mmtrack_tpu.models.repvgg import RepVGG
            return RepVGG(dtype=self.dtype, name=name), "stage3"
        if self.backbone_type == "swin_tiny":
            from mmtrack_tpu.models.swin import SwinTransformer
            return SwinTransformer(dtype=self.dtype, name=name), "stage2"
        # layer3-truncated ResNet-50 (backbone.py:101-106, last_layer='layer3')
        from mmtrack_tpu.models.resnet import ResNet
        return ResNet(stage_sizes=(3, 4, 6), block="bottleneck",
                      dtype=self.dtype, name=name), "layer3"

    def setup(self):
        self.backbone, self.feat_layer = self._make_backbone("backbone")
        self.bottleneck = nn.Conv(self.dim, (1, 1), name="bottleneck")
        if self.six_channel:
            self.backbone_x, _ = self._make_backbone("backbone_x")
            self.bottleneck_x = nn.Conv(self.dim, (1, 1), name="bottleneck_x")
            self.encoder_d = [EncoderLayer(self.dim, self.heads, dtype=self.dtype,
                                           name=f"enc_d_{i}")
                              for i in range(self.enc_layers)]
            self.neck = nn.Dense(self.dim, name="neck")  # Conv1d k=1
            self.fusion = [EncoderLayer(self.dim, self.heads, dtype=self.dtype,
                                        name=f"fus_{i}")
                           for i in range(self.fusion_layers)]
        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0), (1, self.dim))
        self.encoder = [EncoderLayer(self.dim, self.heads, dtype=self.dtype,
                                     name=f"enc_{i}") for i in range(self.enc_layers)]
        self.decoder = [DecoderLayer(self.dim, self.heads, dtype=self.dtype,
                                     name=f"dec_{i}") for i in range(self.dec_layers)]
        self.dec_norm = nn.LayerNorm(dtype=self.dtype, name="dec_norm")
        self.box_head = CornerPredictor(channel=self.dim, feat_sz=self.feat_sz_s,
                                        stride=16, dtype=self.dtype, name="box_head")
        if self.score_head:
            # ST2 cls head is a 3-layer MLP (build_starkst, stark_st.py:65)
            self.cls_head = [nn.Dense(self.dim, name="cls_0"),
                             nn.Dense(self.dim, name="cls_1"),
                             nn.Dense(1, name="cls_2")]

    def embed(self, im: jnp.ndarray, att_mask: jnp.ndarray | None = None):
        """(B, S, S, 3|6) [+ pixel att_mask (B, S, S), True = padded] ->
        (color tokens (B,hw,d), depth tokens or None, pos (B,hw,d),
        token mask (B,hw) or None).

        With a mask, the positional embedding follows the valid-region
        cumsum (PositionEmbeddingSine) and the mask is downsampled to the
        token grid exactly as the reference backbone does
        (F.interpolate nearest = top-left sample per stride cell,
        SPT/lib/models/stark/backbone.py:88)."""
        f = self.backbone(im[..., :3], (self.feat_layer,))[self.feat_layer]
        tok = self.bottleneck(f)
        B, h, w, _ = tok.shape
        tokens_c = tok.reshape(B, h * w, self.dim)
        if att_mask is None:
            pos = jnp.broadcast_to(
                sine_position_embedding(h, w, self.dim)[None],
                (B, h * w, self.dim))
            tok_mask = None
        else:
            sy = im.shape[1] // h
            sx = im.shape[2] // w
            feat_mask = att_mask[:, ::sy, ::sx].astype(bool)
            pos = sine_position_embedding_masked(~feat_mask, self.dim)
            tok_mask = feat_mask.reshape(B, h * w)
        tokens_d = None
        if self.six_channel:
            fx = self.backbone_x(im[..., 3:6], (self.feat_layer,))[self.feat_layer]
            tokens_d = self.bottleneck_x(fx).reshape(B, h * w, self.dim)
        return tokens_c, tokens_d, pos, tok_mask

    def transformer(self, z_c, z_d, z_pos, x_c, x_d, x_pos,
                    z_mask=None, x_mask=None):
        """Returns (decoder output (B, 1, dim), memory (B, L, dim)) with
        L = len_z + len_x (transformer.py:85-121). z_pos/x_pos are
        (B, len, dim); z_mask/x_mask (B, len) bool True=padded feed the
        encoder/fusion src_key_padding_mask and the decoder
        memory_key_padding_mask (transformer.py:97-113)."""
        pos = jnp.concatenate([z_pos, x_pos], axis=1)
        mask = None
        if z_mask is not None or x_mask is not None:
            B, Lz = z_c.shape[0], z_c.shape[1]
            zm = z_mask if z_mask is not None \
                else jnp.zeros((B, Lz), bool)
            xm = x_mask if x_mask is not None \
                else jnp.zeros((B, x_c.shape[1]), bool)
            mask = jnp.concatenate([zm, xm], axis=1)
        mem = jnp.concatenate([z_c, x_c], axis=1)
        for layer in self.encoder:
            mem = layer(mem, pos, key_padding_mask=mask)
        if self.six_channel:
            mem_d = jnp.concatenate([z_d, x_d], axis=1)
            for layer in self.encoder_d:
                mem_d = layer(mem_d, pos, key_padding_mask=mask)
            # channel concat -> 1x1 neck -> fusion encoder (lines 98-101)
            mem = self.neck(jnp.concatenate([mem, mem_d], axis=-1))
            for layer in self.fusion:
                mem = layer(mem, pos, key_padding_mask=mask)
        tgt = jnp.zeros((mem.shape[0], 1, self.dim), self.dtype)
        qpos = self.query_embed[None]
        for layer in self.decoder:
            tgt = layer(tgt, mem, qpos, pos, memory_key_padding_mask=mask)
        return self.dec_norm(tgt), mem

    def forward_box_head(self, dec_out, memory):
        """Decoder-modulated corner decode (stark_s.py:87-102)."""
        L = self.feat_sz_s ** 2
        enc_opt = memory[:, -L:]                            # (B, HW, C)
        att = jnp.einsum("blc,bqc->blq", enc_opt, dec_out)  # (B, HW, 1)
        opt = enc_opt * att                                 # modulated memory
        B = opt.shape[0]
        fmap = opt.reshape(B, self.feat_sz_s, self.feat_sz_s, self.dim)
        xyxy = self.box_head(fmap)                          # (B, 4) in [0,1]
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return jnp.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                          xyxy[:, 3] - xyxy[:, 1]], axis=1)

    def predict_score(self, dec_out: jnp.ndarray) -> jnp.ndarray:
        """ST2 confidence head on the decoder embedding -> (B,) in (0,1)."""
        h = dec_out[:, 0]
        h = nn.relu(self.cls_head[0](h))
        h = nn.relu(self.cls_head[1](h))
        return nn.sigmoid(self.cls_head[2](h))[:, 0]

    def __call__(self, template: jnp.ndarray, search: jnp.ndarray,
                 template_mask: jnp.ndarray | None = None,
                 search_mask: jnp.ndarray | None = None) -> dict:
        z_c, z_d, z_pos, z_m = self.embed(template, template_mask)
        x_c, x_d, x_pos, x_m = self.embed(search, search_mask)
        dec, mem = self.transformer(z_c, z_d, z_pos, x_c, x_d, x_pos,
                                    z_mask=z_m, x_mask=x_m)
        boxes = self.forward_box_head(dec, mem)
        out = {"pred_boxes": boxes}
        if self.score_head:
            out["pred_scores"] = self.predict_score(dec)
        return out
