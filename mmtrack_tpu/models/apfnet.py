"""APFNet: attribute-based progressive fusion RGB-T tracker (AAAI'22).

Faithful rebuild of the DEPLOYED tracking network RGBT/models/APFNet/
modules/model_tracking.py (tracking/Run.py:17 imports model_tracking.MDNet)
so reference .pth checkpoints convert exactly:

  - dual VGG-M streams layers_v / layers_i (model_tracking.py:56-64);
  - at each conv stage, FIVE challenge-attribute branches (order FM, OCC,
    SC, TC, ILL — :70-71) each run the SAME branch convs on both streams'
    PRE-conv inputs and fuse them with a 2-way selective-kernel gate
    (parallel{s} + parallel{s}_skconv, forward :817-905);
  - a 5-way SK ensemble over the attribute outputs (ensemble{s}_skconv,
    :906-921);
  - after the main stage convs, channel-attention transformers: one
    self-attention encoder per stream and per aggregate (WK shared between
    q/k, all L2-normalized, affinity softmax(dot*30) over the REDUCED
    channel axis — Transformer_feature_layer*, :352-381), then
    cross-attention decoders injecting the aggregate into each stream
    (CrossAttention_layer*_{vis,inf}agg, :620-700);
  - MDNet fc scoring on the concatenated streams (fc4 9216->512, fc5,
    per-domain fc6 branches, :66-68, 1160-1165).

The stage-1 training topology (model_stage1.py:198-262: ONE attribute
branch, additive conv(x)+V fusion, no transformers) is selected by
`active_attribute`; staged-training optimizer masks are in stage_mask.
"""

from __future__ import annotations

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.mdnet import _SharedConvs

ATTRIBUTES = ("FM", "OCC", "SC", "TC", "ILL")  # model_tracking.py:70 comment

# per-stage: (branch output channels, SK bottleneck, attention reduced dim)
_STAGE_CH = (96, 256, 512)
_SK_MID = (32, 32, 64)
_ATTN_RED = (32, 64, 128)


def _sk_gates(u, fc1, fc2, n, C):
    """Selective-kernel gates (forward :823-830): global avgpool ->
    bottleneck -> n*C logits -> softmax over the n inputs."""
    g = u.mean(axis=(1, 2), keepdims=True)          # (B,1,1,C)
    g = fc2(nn.relu(fc1(g)))                        # (B,1,1,n*C)
    g = g.reshape(g.shape[0], n, C)                 # first C = input 0
    return jax.nn.softmax(g, axis=1)


class _AttrBranch(nn.Module):
    """One challenge-attribute branch at one stage: the parallel conv path
    applied to EACH stream + the 2-way SK fusion (parallel{s}[a] +
    parallel{s}_skconv[a])."""
    stage: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C, mid = _STAGE_CH[self.stage], _SK_MID[self.stage]
        if self.stage == 0:   # conv(3->32,5,s2)+relu, conv(32->96,4,s2)
            self.conv1 = nn.Conv(32, (5, 5), strides=(2, 2), padding="VALID",
                                 dtype=self.dtype, name="conv1")
            self.conv2 = nn.Conv(96, (4, 4), strides=(2, 2), padding="VALID",
                                 dtype=self.dtype, name="conv2")
        elif self.stage == 1:  # conv(96->256,3,s2) + maxpool(8,s1), no relu
            self.conv1 = nn.Conv(256, (3, 3), strides=(2, 2), padding="VALID",
                                 dtype=self.dtype, name="conv1")
        else:                  # conv(256->512,1,s1) + maxpool(3,s1)
            self.conv1 = nn.Conv(512, (1, 1), padding="VALID",
                                 dtype=self.dtype, name="conv1")
        self.sk_fc1 = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                              name="sk_fc1")
        self.sk_fc2 = nn.Conv(2 * C, (1, 1), use_bias=False, dtype=self.dtype,
                              name="sk_fc2")

    def _path(self, x):
        if self.stage == 0:
            return self.conv2(nn.relu(self.conv1(x)))
        if self.stage == 1:
            return nn.max_pool(self.conv1(x), (8, 8), strides=(1, 1))
        return nn.max_pool(self.conv1(x), (3, 3), strides=(1, 1))

    def __call__(self, x1, x2):
        a, b = self._path(x1), self._path(x2)
        C = a.shape[-1]
        g = _sk_gates(a + b, self.sk_fc1, self.sk_fc2, 2, C)
        return (a * g[:, 0][:, None, None, :]
                + b * g[:, 1][:, None, None, :])


class _ChannelAttention(nn.Module):
    """transformer{s}_{encoder,decoder}{i}: 1x1 reduce -> L2-normalized
    WK/WV linears -> softmax(q.k * 30) over the reduced CHANNEL axis ->
    1x1 rise, residual on the full-channel input. Self-attention when
    q_src is None; cross-attention takes q from q_src, k/v from x
    (model_tracking.py:352-381 / :648-677)."""
    channels: int
    reduced: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.WK = nn.Dense(self.reduced, dtype=self.dtype, name="WK")
        self.WV = nn.Dense(self.reduced, dtype=self.dtype, name="WV")
        self.reduce = nn.Conv(self.reduced, (1, 1), use_bias=False,
                              dtype=self.dtype, name="reduce")
        self.rise = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name="rise")

    def _norm(self, t):
        return t / jnp.maximum(
            jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

    def __call__(self, x, q_src=None):
        B, H, W, _ = x.shape
        tk = self.reduce(x).reshape(B, H * W, self.reduced)
        tq = (tk if q_src is None
              else self.reduce(q_src).reshape(B, -1, self.reduced))
        wq = self._norm(self.WK(tq))
        wk = self._norm(self.WK(tk))
        wv = self._norm(self.WV(tk))
        aff = jax.nn.softmax(
            jnp.einsum("bti,btj->bij", wq, wk) * 30.0, axis=-1)
        out = jnp.einsum("bij,btj->bti", aff, wv).reshape(B, H, W,
                                                          self.reduced)
        return x + self.rise(out)


class _StageAgg(nn.Module):
    """Per-stage aggregation: the 5-way ensemble SK gate + the five
    channel-attention transformers (enc vis/inf/agg, dec vis/inf)."""
    stage: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C, red = _STAGE_CH[self.stage], _ATTN_RED[self.stage]
        self.sk_fc1 = nn.Conv(5 * red, (1, 1), use_bias=False,
                              dtype=self.dtype, name="sk_fc1")
        self.sk_fc2 = nn.Conv(5 * C, (1, 1), use_bias=False,
                              dtype=self.dtype, name="sk_fc2")
        for role in ("enc_vis", "enc_inf", "enc_agg", "dec_vis", "dec_inf"):
            setattr(self, role, _ChannelAttention(C, red, dtype=self.dtype,
                                                  name=role))

    def ensemble(self, branch_outputs):
        """branch_outputs: list of 5 (B,H,W,C) -> gated sum (forward
        :906-921)."""
        C = branch_outputs[0].shape[-1]
        u = sum(branch_outputs)
        g = _sk_gates(u, self.sk_fc1, self.sk_fc2, 5, C)
        return sum(v * g[:, i][:, None, None, :]
                   for i, v in enumerate(branch_outputs))


class APFNet(nn.Module):
    """Dual-stream VGG-M with per-stage attribute fusion + aggregation.

    extract_features((N,107,107,6)) -> (N, 1, 9216); score via fc4/fc5/fc6
    like the MDNet chassis (fc4 input 512*3*3*2, model_tracking.py:66-68).
    """
    num_branches: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers_v = _SharedConvs(dtype=self.dtype, name="layers_v")
        self.layers_i = _SharedConvs(dtype=self.dtype, name="layers_i")
        for s in range(3):
            for a in ATTRIBUTES:
                setattr(self, f"attr{s}_{a}",
                        _AttrBranch(s, dtype=self.dtype, name=f"attr{s}_{a}"))
            setattr(self, f"agg{s}",
                    _StageAgg(s, dtype=self.dtype, name=f"agg{s}"))
        self.fc4 = nn.Dense(512, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(512, dtype=self.dtype, name="fc5")
        self.branches = [nn.Dense(2, dtype=self.dtype, name=f"fc6_{k}")
                         for k in range(self.num_branches)]

    def extract_features(self, patches: jnp.ndarray,
                         active_attribute: int | None = None) -> jnp.ndarray:
        x1 = patches[..., :3]
        x2 = patches[..., 3:6]
        stages = ((self.layers_v.stage1, self.layers_i.stage1),
                  (self.layers_v.stage2, self.layers_i.stage2),
                  (self.layers_v.stage3, self.layers_i.stage3))
        for s, (conv_v, conv_i) in enumerate(stages):
            agg = getattr(self, f"agg{s}")
            if active_attribute is None:
                v_all = [getattr(self, f"attr{s}_{a}")(x1, x2)
                         for a in ATTRIBUTES]
                V = agg.ensemble(v_all)
            else:
                V = getattr(self, f"attr{s}_{ATTRIBUTES[active_attribute]}")(
                    x1, x2)
            x1, x2 = conv_v(x1), conv_i(x2)
            if active_attribute is None:
                x1 = agg.enc_vis(x1)
                V = agg.enc_agg(V)
                x2 = agg.enc_inf(x2)
                x1 = agg.dec_vis(x1, q_src=V)
                x2 = agg.dec_inf(x2, q_src=V)
            else:
                # stage-1 topology: additive fusion, no transformers
                # (model_stage1.py:255-258)
                x1 = x1 + V
                x2 = x2 + V
        f = jnp.concatenate([x1, x2], axis=-1)
        return f.reshape(f.shape[0], 1, -1)

    def score(self, feats, branch: int = 0, train: bool = False,
              dropout_rng=None):
        h = nn.relu(self.fc4(feats))
        if train and dropout_rng is not None:
            r1, r2 = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(r1, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        h = nn.relu(self.fc5(h))
        h = h.reshape(h.shape[0], -1)
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(r2, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        return self.branches[branch](h)

    def __call__(self, patches, branch: int = 0,
                 active_attribute: int | None = None):
        return self.score(self.extract_features(patches, active_attribute),
                          branch)


def stage_mask(params: dict, stage: int, attribute: int | None = None) -> dict:
    """Trainable-leaf masks for the 3-stage protocol (train_stage{1,2,3}.py).

    stage 1: one attribute's fusion branches (+ fc) — run 5x, once per
    attribute; stage 2: aggregation ensembles + transformers (+ fc);
    stage 3: everything.
    """
    flat = flax.traverse_util.flatten_dict(params)

    def trainable(path) -> bool:
        top = str(path[0])
        if stage == 3:
            return True
        if top.startswith("fc") or top.startswith("branches"):
            return True
        if stage == 1:
            return (top.startswith("attr")
                    and top.endswith(ATTRIBUTES[attribute]))
        if stage == 2:
            return top.startswith("agg")
        return False

    return flax.traverse_util.unflatten_dict(
        {k: trainable(k) for k in flat})
