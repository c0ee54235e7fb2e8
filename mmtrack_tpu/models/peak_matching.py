"""Learned peak matching for KeepTrack (SuperGlue-style GNN + Sinkhorn).

Rebuild of RGBD/models/keep_track_vot2021/ltr/models/memory_learning/
peak_matching.py for TPU:
  - DescriptorExtractor (4x4 conv over classification features, gathered at
    peak cells, peak_matching.py:453-474),
  - KeypointEncoder MLP over (x, y, score) (lines 127-135),
  - AttentionalGNN: alternating self/cross attentional message passing,
    4 heads, dim 256 (lines 138-208),
  - log-domain Sinkhorn optimal transport with a learned dustbin score
    (lines 211-238) and mutual-max filtering (lines 378-397).

TPU redesign: the peak set is a FIXED K slots + validity mask (the
reference's peak count is dynamic). Invalid slots get a large negative
marginal and score so the transport pushes their mass to the dustbin;
everything runs as one static-shape program. Finite -1e4 sentinels replace
-inf to keep the log-sum-exps NaN-free.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e4


class MLPBlock(nn.Module):
    """Conv1d-k1 MLP with BatchNorm+ReLU between layers (MLP(), lines
    100-111). Token-major (B, K, C)."""
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, dtype=self.dtype, name=f"lin{i}")(x)
            if i < n - 1:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{i}")(x)
                x = nn.relu(x)
        return x


def normalize_keypoints(kpts_xy: jnp.ndarray, size_wh) -> jnp.ndarray:
    """(kpts - center) / (0.7 * max extent) (lines 113-124)."""
    size = jnp.asarray(size_wh, jnp.float32)
    c = size / 2
    f = size.max() * 0.7
    return (kpts_xy - c) / f


class KeypointEncoder(nn.Module):
    layers: Sequence[int] = (32, 64, 128, 256)
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kpts_xy, scores, train: bool = False):
        x = jnp.concatenate([kpts_xy, scores[..., None]], axis=-1)
        return MLPBlock(tuple(self.layers) + (self.out_dim,),
                        dtype=self.dtype, name="encoder")(x, train)


class MultiHeadedAttention(nn.Module):
    heads: int = 4
    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, kv_valid=None):
        B, Kq = q.shape[0], q.shape[1]
        hd = self.dim // self.heads
        qh = nn.Dense(self.dim, dtype=self.dtype, name="proj_q")(q).reshape(B, Kq, self.heads, hd)
        kh = nn.Dense(self.dim, dtype=self.dtype, name="proj_k")(k).reshape(B, -1, self.heads, hd)
        vh = nn.Dense(self.dim, dtype=self.dtype, name="proj_v")(v).reshape(B, -1, self.heads, hd)
        # reference scales by head_dim**-0.5 (attention(), line 140)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd ** -0.5
        if kv_valid is not None:
            logits = jnp.where(kv_valid[:, None, None, :], logits, NEG)
        a = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", a, vh).reshape(B, Kq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="merge")(out)


class AttentionalPropagation(nn.Module):
    dim: int = 256
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, source_valid, train: bool = False):
        msg = MultiHeadedAttention(self.heads, self.dim, dtype=self.dtype,
                                   name="attn")(x, source, source, source_valid)
        return MLPBlock((2 * self.dim, self.dim), dtype=self.dtype,
                        name="mlp")(jnp.concatenate([x, msg], axis=-1), train)


class AttentionalGNN(nn.Module):
    """Alternating self/cross layers (lines 175-208)."""
    num_blocks: int = 9          # 'self','cross' x 9 = 18 layers
    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, d0, d1, v0, v1, train: bool = False):
        li = 0
        for _ in range(self.num_blocks):
            upd = AttentionalPropagation(self.dim, dtype=self.dtype,
                                         name=f"layer{li}")
            d0, d1 = d0 + upd(d0, d0, v0, train), d1 + upd(d1, d1, v1, train)
            li += 1
            upd = AttentionalPropagation(self.dim, dtype=self.dtype,
                                         name=f"layer{li}")
            d0, d1 = d0 + upd(d0, d1, v1, train), d1 + upd(d1, d0, v0, train)
            li += 1
        return d0, d1


def log_sinkhorn(couplings, log_mu, log_nu, iters: int):
    """Log-domain Sinkhorn (lines 211-217)."""
    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v
    u, v = jax.lax.fori_loop(0, iters, body,
                             (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)))
    return couplings + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores, bin_score, valid0, valid1, iters: int = 50):
    """Differentiable OT with dustbin row/col (lines 219-238); invalid slots
    get ~zero marginal mass so they drain into the dustbin."""
    B, m, n = scores.shape
    bins0 = jnp.tile(bin_score.reshape(1, 1, 1), (B, m, 1))
    bins1 = jnp.tile(bin_score.reshape(1, 1, 1), (B, 1, n))
    alpha = jnp.tile(bin_score.reshape(1, 1, 1), (B, 1, 1))
    couplings = jnp.concatenate([
        jnp.concatenate([scores, bins0], axis=2),
        jnp.concatenate([bins1, alpha], axis=2)], axis=1)  # (B, m+1, n+1)

    ms = valid0.sum(axis=1).astype(jnp.float32)
    ns = valid1.sum(axis=1).astype(jnp.float32)
    norm = -jnp.log(jnp.maximum(ms + ns, 1.0))            # (B,)
    log_mu = jnp.concatenate([
        jnp.where(valid0, norm[:, None], NEG),
        (jnp.log(jnp.maximum(ns, 1e-6)) + norm)[:, None]], axis=1)
    log_nu = jnp.concatenate([
        jnp.where(valid1, norm[:, None], NEG),
        (jnp.log(jnp.maximum(ms, 1e-6)) + norm)[:, None]], axis=1)

    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm[:, None, None]


class DescriptorExtractor(nn.Module):
    """4x4 conv over the classification feature map, gathered at peak cells
    (peak_matching.py:453-474)."""
    descriptor_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, coords_yx):
        """feat (H, W, C); coords (K, 2) float (y, x) -> (K, D)."""
        H, W = feat.shape[0], feat.shape[1]
        f = nn.Conv(self.descriptor_dim, (4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv")(feat[None])[0]
        # even kernel + pad 2: the conv output is (H+1, W+1) — exactly the
        # score-map grid the peak coords live on (feat 22x22 -> scores
        # 23x23 for the even DiMP filter), and the reference indexes that
        # full grid directly (peak_matching.py:463). Clip to H (= the last
        # valid output row), NOT H-1.
        ys = jnp.clip(coords_yx[:, 0].astype(jnp.int32), 0, H)
        xs = jnp.clip(coords_yx[:, 1].astype(jnp.int32), 0, W)
        return f[ys, xs]


class PeakMatcher(nn.Module):
    """SuperGlue matcher over two fixed-K peak sets (SuperGlue:259-403)."""
    descriptor_dim: int = 256
    input_dim: int = 256
    kenc_layers: Sequence[int] = (32, 64, 128, 256)
    gnn_blocks: int = 9
    sinkhorn_iters: int = 50
    filter_threshold: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, desc0, kpts0, scores0, valid0,
                 desc1, kpts1, scores1, valid1,
                 image_size_wh=(288.0, 288.0), train: bool = False):
        """All peak tensors carry a leading batch axis: desc (B,K,D),
        kpts (B,K,2) crop-pixel (x,y), scores (B,K), valid (B,K) bool.

        Returns dict with log_assignment (B,K0+1,K1+1), matches0 (B,K0) int
        (index into set 1 or -1), match_scores0 (B,K0)."""
        if self.input_dim != self.descriptor_dim:
            proj = nn.Dense(self.descriptor_dim, dtype=self.dtype,
                            name="input_proj")
            desc0, desc1 = proj(desc0), proj(desc1)

        kenc = KeypointEncoder(self.kenc_layers, self.descriptor_dim,
                               dtype=self.dtype, name="kenc")
        d0 = desc0 + kenc(normalize_keypoints(kpts0, image_size_wh), scores0, train)
        d1 = desc1 + kenc(normalize_keypoints(kpts1, image_size_wh), scores1, train)

        d0, d1 = AttentionalGNN(self.gnn_blocks, self.descriptor_dim,
                                dtype=self.dtype, name="gnn")(d0, d1, valid0,
                                                              valid1, train)

        fp = nn.Dense(self.descriptor_dim, dtype=self.dtype, name="final_proj")
        m0, m1 = fp(d0), fp(d1)
        scores = jnp.einsum("bkd,bld->bkl", m0, m1) / self.descriptor_dim ** 0.5
        scores = jnp.where(valid0[:, :, None] & valid1[:, None, :], scores, NEG)

        bin_score = self.param("bin_score", nn.initializers.zeros, ())
        Z = log_optimal_transport(scores, bin_score, valid0, valid1,
                                  self.sinkhorn_iters)

        inner = Z[:, :-1, :-1]
        max0 = inner.max(axis=2)
        m0_idx = inner.argmax(axis=2)
        m1_idx = inner.argmax(axis=1)
        K0, K1 = inner.shape[1], inner.shape[2]
        mutual0 = jnp.arange(K0)[None] == jnp.take_along_axis(m1_idx, m0_idx,
                                                              axis=1)
        mutual1 = jnp.arange(K1)[None] == jnp.take_along_axis(m0_idx, m1_idx,
                                                              axis=1)
        mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
        # set-1 side mirrors the reference exactly (peak_matching.py:383-393):
        # a set-1 peak inherits the coupling prob of its mutual partner and
        # is valid only if that partner passed the set-0 filter.
        mscores1 = jnp.where(mutual1,
                             jnp.take_along_axis(mscores0, m1_idx, axis=1), 0.0)
        valid_match0 = mutual0 & (mscores0 > self.filter_threshold) & valid0
        valid_match1 = mutual1 & jnp.take_along_axis(valid_match0, m1_idx,
                                                     axis=1) & valid1
        matches0 = jnp.where(valid_match0, m0_idx, -1)
        matches1 = jnp.where(valid_match1, m1_idx, -1)
        return {"log_assignment": Z, "matches0": matches0,
                "match_scores0": mscores0,
                "matches1": matches1, "match_scores1": mscores1}


def matcher_nll_loss(log_assignment, gt_matches0, valid0, valid1):
    """Negative log-likelihood of the GT assignment (the reference's
    SuperGlue nll loss): matched peaks use their coupling entry, unmatched
    valid peaks use their dustbin entry; averaged over valid slots."""
    B, M1, N1 = log_assignment.shape
    m = M1 - 1
    dustbin_col = N1 - 1  # the dustbin COLUMN index is the column count-1
    matched = gt_matches0 >= 0
    col = jnp.where(matched, gt_matches0, dustbin_col)
    rows = jnp.take_along_axis(
        log_assignment[:, :m, :], col[:, :, None], axis=2)[..., 0]
    weights = valid0.astype(jnp.float32)
    return -(rows * weights).sum() / jnp.maximum(weights.sum(), 1.0)
