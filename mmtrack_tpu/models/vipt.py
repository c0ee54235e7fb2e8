"""ViPT: prompt-tuned one-stream ViT tracker (the flagship model).

TPU-native rebuild of ViPT/lib/models/vipt/{ostrack_prompt.py,vit_ce_prompt.py}:
  - dual patch embedding (RGB stream + auxiliary-modality "prompt" stream),
  - Prompt_block/Fovea modal fusion operating directly in token space (the
    reference round-trips tokens<->feature maps, but every conv is 1x1 and the
    Fovea softmax is over the spatial axis, so token space is equivalent and
    saves four reshapes per block),
  - 12 CE blocks with static-shape candidate elimination at layers {3,6,9},
  - deep-prompt re-injection with scatter/gather recovery between layers,
  - CenterPredictor box head.

Everything is shape-static: the per-block kept-token counts are passed as a
Python tuple so a single XLA compilation covers the whole forward.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.heads import (
    CenterPredictor,
    CornerPredictor,
    MLPHead,
    cal_bbox,
)
from mmtrack_tpu.models.layers import CEBlock, PatchEmbed
from mmtrack_tpu.ops.ce import gather_search_tokens, recover_search_tokens


class Fovea(nn.Module):
    """Spatial-softmax attention gate (vit_ce_prompt.py:22-47), token space.

    x: (B, L, C); softmax over the token axis per channel, scaled by a
    learnable temperature when `smooth`.
    """
    smooth: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.smooth:
            s = self.param("smooth", nn.initializers.constant(10.0), (1,))
            mask = jax.nn.softmax(x * s, axis=1)
        else:
            mask = jax.nn.softmax(x, axis=1)
        return mask * x


class PromptBlock(nn.Module):
    """Modal prompt fusion (Prompt_block, vit_ce_prompt.py:50-71), token space.

    Inputs (B, L, C) + (B, L, C): RGB-stream tokens and prompt-stream tokens
    (the reference concatenates them channel-wise and slices back; keeping
    them separate is equivalent and skips the concat). Two 1x1 projections
    to a bottleneck, Fovea gate on the RGB branch, sum, then a 1x1 back to C.

    Perf note: a fully-fused Pallas version of this block was measured 0.25
    ms/forward SLOWER than XLA at B=16 — XLA piggybacks the tiny 8-channel
    contractions onto neighboring fusions' memory passes essentially for
    free (docs/PERF.md), so this stays plain XLA.
    """
    embed_dim: int
    hide_channel: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        C = self.embed_dim
        init = nn.initializers.xavier_uniform()
        x0 = nn.Dense(self.hide_channel, kernel_init=init, dtype=self.dtype,
                      name="conv0_0")(a)
        x1 = nn.Dense(self.hide_channel, kernel_init=init, dtype=self.dtype,
                      name="conv0_1")(b)
        x0 = Fovea(smooth=True, name="fovea")(x0) + x1
        return nn.Dense(C, kernel_init=init, dtype=self.dtype, name="conv1x1")(x0)


def ce_keep_schedule(num_search_tokens: int, ce_loc: Sequence[int],
                     keep_ratios: Sequence[float]) -> tuple[int, ...]:
    """Static kept-token count after each CE layer (ceil semantics of
    attn_blocks.py:40)."""
    lens = []
    cur = num_search_tokens
    for r in keep_ratios:
        cur = math.ceil(r * cur)
        lens.append(cur)
    return tuple(lens)


def generate_ctr_mask(template_feat_size: int, mode: str) -> Optional[jnp.ndarray]:
    """Template-token vote mask for CE (generate_mask_cond, ce_utils.py:15-65).

    Returns (1, L_t) float mask or None for 'ALL'. CTR_POINT marks the center
    token; CTR_REC a center 2x2 patch (sizes per the reference's lookup).
    """
    if mode == "ALL":
        return None
    m = jnp.zeros((template_feat_size, template_feat_size))
    ctr = (template_feat_size - 1) // 2  # reproduces the reference lookup
    if mode == "CTR_POINT":
        idx = slice(ctr, ctr + 1)        # {7:3, 8:3, 12:5, 14:6}
        m = m.at[idx, idx].set(1.0)
    elif mode == "CTR_REC":
        width = 2 if template_feat_size % 2 == 0 else 1  # {7:(3,4), 8:(3,5), 12:(5,7)}
        idx = slice(ctr, ctr + width)
        m = m.at[idx, idx].set(1.0)
    else:
        raise NotImplementedError(f"CE_TEMPLATE_RANGE={mode}")
    return m.reshape(1, -1)


class ViTCEPrompt(nn.Module):
    """ViT-B/16 backbone with candidate elimination and modal prompts.

    Rebuild of VisionTransformerCE (vit_ce_prompt.py:74-346). Inputs are NHWC
    6-channel crops; output is the (B, L_t + L_x, C) token stream with pruned
    search positions recovered as zeros (vit_ce_prompt.py:318-339).
    """
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    template_size: int = 128
    search_size: int = 256
    ce_loc: tuple[int, ...] = (3, 6, 9)
    prompt_type: str = "vipt_deep"  # vipt_deep | vipt_shaw | none
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def lens_z(self) -> int:
        return (self.template_size // self.patch_size) ** 2

    @property
    def lens_x(self) -> int:
        return (self.search_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, z: jnp.ndarray, x: jnp.ndarray,
                 box_mask_z: Optional[jnp.ndarray] = None,
                 ce_keep_lens: Optional[tuple[int, ...]] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B = x.shape[0]
        lens_z, lens_x = self.lens_z, self.lens_x
        has_prompt = self.prompt_type in ("vipt_deep", "vipt_shaw")
        n_prompt = self.depth if self.prompt_type == "vipt_deep" else 1

        z_rgb, z_dte = z[..., :3], z[..., 3:]
        x_rgb, x_dte = x[..., :3], x[..., 3:]
        rgb_only = z.shape[-1] == 3  # plain OSTrack (RGB baseline / vot22 D entry)

        patch_embed = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                                 name="patch_embed")
        z_tok = patch_embed(z_rgb)
        x_tok = patch_embed(x_rgb)

        if rgb_only:
            pass  # no auxiliary-modality stream at all
        elif has_prompt:
            patch_embed_prompt = PatchEmbed(self.embed_dim, self.patch_size,
                                            dtype=self.dtype, name="patch_embed_prompt")
            z_dte_tok = patch_embed_prompt(z_dte)
            x_dte_tok = patch_embed_prompt(x_dte)

            prompt_blocks = [PromptBlock(self.embed_dim, dtype=self.dtype,
                                         name=f"prompt_blocks_{i}") for i in range(n_prompt)]
            prompt_norms = [nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                         name=f"prompt_norms_{i}") for i in range(n_prompt)]

            n0 = prompt_norms[0]
            z_p = prompt_blocks[0](n0(z_tok), n0(z_dte_tok))
            x_p = prompt_blocks[0](n0(x_tok), n0(x_dte_tok))
            z_prompted, x_prompted = z_p, x_p
            z_tok = z_tok + z_p
            x_tok = x_tok + x_p
        else:
            # plain 6-channel fusion by addition (vit_ce_prompt.py:220-222)
            patch_embed_prompt = PatchEmbed(self.embed_dim, self.patch_size,
                                            dtype=self.dtype, name="patch_embed_prompt")
            z_tok = z_tok + patch_embed_prompt(z_dte)
            x_tok = x_tok + patch_embed_prompt(x_dte)

        pos_z = self.param("pos_embed_z", nn.initializers.truncated_normal(0.02),
                           (1, lens_z, self.embed_dim))
        pos_x = self.param("pos_embed_x", nn.initializers.truncated_normal(0.02),
                           (1, lens_x, self.embed_dim))
        z_tok = z_tok + pos_z.astype(self.dtype)
        x_tok = x_tok + pos_x.astype(self.dtype)

        tokens = jnp.concatenate([z_tok, x_tok], axis=1)  # cat_mode 'direct'

        gidx_t = jnp.tile(jnp.arange(lens_z)[None], (B, 1))
        gidx_s = jnp.tile(jnp.arange(lens_x)[None], (B, 1))

        if box_mask_z is not None and box_mask_z.shape[0] == 1:
            box_mask_z = jnp.tile(box_mask_z, (B, 1))

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        ce_index = 0
        pruned = False
        x_cur = tokens
        for i in range(self.depth):
            if i >= 1 and self.prompt_type == "vipt_deep":
                x_ori = x_cur
                z_cur = x_cur[:, :lens_z]
                xs = x_cur[:, lens_z:]
                xs_full = recover_search_tokens(xs, gidx_s, lens_x) if pruned else xs
                full = jnp.concatenate([z_cur, xs_full], axis=1)
                full = prompt_norms[i - 1](full)
                z_t, x_t = full[:, :lens_z], full[:, lens_z:]
                zp = prompt_norms[i](z_prompted)
                xp = prompt_norms[i](x_prompted)
                z_new = prompt_blocks[i](z_t, zp)
                x_new = prompt_blocks[i](x_t, xp)
                z_prompted, x_prompted = z_new, x_new
                x_sel = gather_search_tokens(x_new, gidx_s) if pruned else x_new
                x_cur = x_ori + jnp.concatenate([z_new, x_sel], axis=1)

            lens_keep = None
            if ce_keep_lens is not None and i in self.ce_loc:
                lens_keep = ce_keep_lens[ce_index]
            block = CEBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                            drop_path_rate=dpr[i], dtype=self.dtype, name=f"blocks_{i}")
            x_cur, gidx_t, gidx_s, removed = block(
                x_cur, gidx_t, gidx_s, box_mask_z, lens_keep, deterministic)
            if i in self.ce_loc and ce_keep_lens is not None:
                ce_index += 1
                if removed is not None:
                    pruned = True

        x_cur = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x_cur)

        z_out = x_cur[:, :lens_z]
        xs = x_cur[:, lens_z:]
        xs_full = recover_search_tokens(xs, gidx_s, lens_x) if pruned else xs
        return jnp.concatenate([z_out, xs_full], axis=1)


class ViPTrack(nn.Module):
    """Backbone + CenterPredictor wrapper (ostrack_prompt.py:17-91).

    __call__(template (B,128,128,6), search (B,256,256,6)) -> dict with
    score_map (B,S,S), size_map/offset_map (B,S,S,2), pred_boxes (B,4) cxcywh
    in [0,1] crop coords.
    """
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    template_size: int = 128
    search_size: int = 256
    patch_size: int = 16
    ce_loc: tuple[int, ...] = (3, 6, 9)
    prompt_type: str = "vipt_deep"
    head_channel: int = 256
    head_type: str = "CENTER"  # CENTER | CORNER | MLP (build_box_head, head.py:224-248)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def feat_sz(self) -> int:
        return self.search_size // self.patch_size

    @nn.compact
    def __call__(self, template: jnp.ndarray, search: jnp.ndarray,
                 box_mask_z: Optional[jnp.ndarray] = None,
                 ce_keep_lens: Optional[tuple[int, ...]] = None,
                 deterministic: bool = True) -> dict:
        backbone = ViTCEPrompt(
            embed_dim=self.embed_dim, depth=self.depth, num_heads=self.num_heads,
            patch_size=self.patch_size, template_size=self.template_size,
            search_size=self.search_size, ce_loc=self.ce_loc,
            prompt_type=self.prompt_type, drop_path_rate=self.drop_path_rate,
            dtype=self.dtype, name="backbone")
        tokens = backbone(template, search, box_mask_z, ce_keep_lens, deterministic)

        S = self.feat_sz
        lens_x = S * S
        feat = tokens[:, -lens_x:].reshape(tokens.shape[0], S, S, -1)
        if self.head_type == "CORNER":
            # xyxy soft-argmax decode. Confidence: geometric mean of the two
            # corner distributions' peak probabilities — OUR design; the
            # reference's CORNER confidence path is dead code as shipped
            # (ostrack_prompt.py:71 unpacks 2 values from the 3-tuple the
            # return_dist branch returns, and the test tracker reads
            # 'size_map', which CORNER never emits), so there is no
            # reference semantics to match. A sharp pair of corner peaks
            # means a confident localization; a diffuse distribution means
            # uncertainty — giving the F-score threshold sweep a real,
            # monotone signal instead of a constant.
            boxes_xyxy, p_tl, p_br = CornerPredictor(
                self.head_channel, S, self.patch_size, dtype=self.dtype,
                name="box_head")(feat, return_dist=True)
            cx = (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2
            cy = (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2
            pred_boxes = jnp.stack([cx, cy, boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                                    boxes_xyxy[:, 3] - boxes_xyxy[:, 1]], axis=1)
            B = feat.shape[0]
            score_map = p_tl.reshape(B, S, S).astype(self.dtype)
            size_map = jnp.zeros((B, S, S, 2), self.dtype)
            offset_map = jnp.zeros((B, S, S, 2), self.dtype)
            max_score = jnp.sqrt(p_tl.max(axis=1) * p_br.max(axis=1))
        elif self.head_type == "MLP":
            # box regression from pooled search tokens (head.py MLP branch:
            # the STARK lineage applies it to a single decoder token; the
            # one-stream case pools the search tokens first). The MLP head
            # itself produces no spatial distribution, so the confidence is
            # a peak-sharpness analog OF THE BACKBONE (our design; the
            # reference's MLP recipes report no confidence at all): a
            # template->search feature correlation map — softmax over
            # search positions of <search_token, mean template token>. The
            # one-stream training objective aligns template and search
            # target features through joint attention, so a sharp
            # correlation peak means a confident localization, giving the
            # F-score threshold sweep a real, monotone signal instead of a
            # constant (round-3 caveat closed; see docs/SCORECARD.md).
            pred_boxes = nn.sigmoid(MLPHead(self.embed_dim, dtype=self.dtype,
                                            name="box_head")(feat.mean(axis=(1, 2))))
            B = feat.shape[0]
            z_tok = tokens[:, :tokens.shape[1] - lens_x].astype(jnp.float32)
            x_tok = feat.reshape(B, lens_x, -1).astype(jnp.float32)
            corr = jnp.einsum("bnc,bc->bn", x_tok, z_tok.mean(axis=1))
            corr = corr / math.sqrt(x_tok.shape[-1])
            prob = jax.nn.softmax(corr, axis=1)
            score_map = prob.reshape(B, S, S).astype(self.dtype)
            size_map = jnp.zeros((B, S, S, 2), self.dtype)
            offset_map = jnp.zeros((B, S, S, 2), self.dtype)
            max_score = prob.max(axis=1)
        else:
            head = CenterPredictor(self.head_channel, S, dtype=self.dtype,
                                   name="box_head")
            score_map, size_map, offset_map = head(feat)
            pred_boxes, max_score = cal_bbox(score_map, size_map, offset_map)
        return {
            "score_map": score_map,
            "size_map": size_map,
            "offset_map": offset_map,
            "pred_boxes": pred_boxes,
            "max_score": max_score,
            "backbone_tokens": tokens,
        }


class CABlock(nn.Module):
    """Class-attention block (RGBD/models/OSTrack/lib/models/ostrack/layers/
    cross_attn.py CABlock_/ClassAttention): the class token queries the
    [cls; tokens] sequence through a fused qkv, then an MLP refines it."""
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, cls: jnp.ndarray):
        B = tokens.shape[0]
        hd = self.dim // self.heads
        u = jnp.concatenate([cls, tokens], axis=1)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(u)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")
        kv = qkv(h).reshape(B, -1, 3, self.heads, hd)
        k, v = kv[:, :, 1], kv[:, :, 2]
        q = qkv(h[:, 0])[:, :self.dim].reshape(B, 1, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, 1, self.dim)
        cls = cls + nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        m = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(cls)
        m = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(
            nn.gelu(nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(m),
                    approximate=False))
        return cls + m


class ScoreTransformer(nn.Module):
    """OSTrack-online confidence head (RGBD/models/OSTrack/lib/models/
    ostrack/score_head.py:20-83): the predicted box projects to a class
    token that attends the full template+search token sequence (the caller
    passes cat_template_search, ostrack_online.py:150) through NUM_CLS_ATTN_LAYERS=2
    class-attention blocks; a NUM_CLS_MLP_LAYERS=3 MLP maps the normalized
    token to the update score. Drives the online-template refresh gate
    (ostrack_online.py). Weight conversion: convert_score_head_checkpoint.
    """
    d_model: int = 768
    n_layers: int = 2
    n_heads: int = 12
    n_mlp_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, search_tokens: jnp.ndarray, pred_box: jnp.ndarray) -> jnp.ndarray:
        """search_tokens (B, L, C), pred_box (B, 4) -> score (B,) in (0,1)."""
        cls = nn.Dense(self.d_model, dtype=self.dtype,
                       name="cls_proj")(pred_box)[:, None]
        for i in range(self.n_layers):
            cls = CABlock(self.d_model, self.n_heads, dtype=self.dtype,
                          name=f"blocks_{i}")(search_tokens, cls)
        x = jnp.concatenate([cls, search_tokens], axis=1)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)[:, 0]
        for j in range(self.n_mlp_layers - 1):
            h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                                 name=f"score_head_{j}")(h))
        logit = nn.Dense(1, dtype=self.dtype,
                         name=f"score_head_{self.n_mlp_layers - 1}")(h)
        return nn.sigmoid(logit)[:, 0]


def build_viptrack(cfg, dtype=jnp.float32) -> ViPTrack:
    """Construct ViPTrack from a ConfigNode (build_viptrack analog,
    ostrack_prompt.py:94-145)."""
    return ViPTrack(
        template_size=cfg.DATA.TEMPLATE.SIZE,
        search_size=cfg.DATA.SEARCH.SIZE,
        patch_size=cfg.MODEL.BACKBONE.STRIDE,
        embed_dim=cfg.MODEL.BACKBONE.EMBED_DIM,
        depth=cfg.MODEL.BACKBONE.DEPTH,
        num_heads=cfg.MODEL.BACKBONE.NUM_HEADS,
        ce_loc=tuple(cfg.MODEL.BACKBONE.CE_LOC),
        prompt_type=cfg.TRAIN.PROMPT.TYPE,
        head_channel=cfg.MODEL.HEAD.NUM_CHANNELS,
        head_type=cfg.MODEL.HEAD.TYPE,
        drop_path_rate=cfg.TRAIN.DROP_PATH_RATE,
        dtype=dtype,
    )


def build_ostrack(cfg=None, dtype=jnp.float32, **overrides) -> ViPTrack:
    """Plain OSTrack (the RGB one-stream baseline ViPT tunes prompts on;
    RGBD/models/OSTrack/lib/models/ostrack + ViPT/lib/models/vipt/ostrack.py).

    Same architecture with prompt_type='none'; feed 3-channel crops. The
    reference's VOT22 entries map directly: RGBD entry = color frames only
    (rgbd_tracker.py:45-48); D entry = JET-colormapped depth as the image
    (d_tracker.py:25-52) — both are compositions, not model changes.
    """
    kwargs = dict(prompt_type="none", dtype=dtype)
    if cfg is not None:
        kwargs.update(
            template_size=cfg.DATA.TEMPLATE.SIZE,
            search_size=cfg.DATA.SEARCH.SIZE,
            patch_size=cfg.MODEL.BACKBONE.STRIDE,
            embed_dim=cfg.MODEL.BACKBONE.EMBED_DIM,
            depth=cfg.MODEL.BACKBONE.DEPTH,
            num_heads=cfg.MODEL.BACKBONE.NUM_HEADS,
            ce_loc=tuple(cfg.MODEL.BACKBONE.CE_LOC),
            head_channel=cfg.MODEL.HEAD.NUM_CHANNELS,
            drop_path_rate=cfg.TRAIN.DROP_PATH_RATE,
        )
    kwargs.update(overrides)
    return ViPTrack(**kwargs)
