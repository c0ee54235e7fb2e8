"""STM — Space-Time Memory network for mask tracking.

TPU-native rebuild of the keep_track fork's vendored STM (Oh et al.,
ICCV'19; RGBD/models/keep_track_vot2021/pytracking/tracker/stm/
model.py:8-253): a memory encoder (ResNet-50 trunk whose conv1 output is
augmented with 7x7 convs of the target mask and other-objects mask),
a query encoder (plain trunk), key/value heads on layer3 (1024 -> 128
key / 512 value), a space-time memory read (scaled dot-product attention
of query keys over ALL memory positions, softmax over time x space), and
a refinement decoder (ResBlock + two Refine stages + 2-class head,
4x bilinear upsample).

The tracker here is single-object (the fork's STM tracker runs K=2 =
background + target; the soft-aggregation + tracker-softmax round-trip
SHARPENS the object probability to sigmoid(2 logit(p)) — reproduced
exactly, clamp included, in segment()). The memory is a
STATIC ring of `mem_slots` key/value frames with a validity mask folded
into the attention softmax — the reference's unbounded concat +
first-frame-protected truncation (stm.py:100-112) expressed with fixed
shapes for ONE compiled step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrack_tpu.models.resnet import resnet50

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class ResBlock(nn.Module):
    """stm/model.py:8-29 (pre-activation, biased convs)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(nn.relu(r))
        if x.shape[-1] != self.dim:
            x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name="downsample")(x)
        return x + r


class Refine(nn.Module):
    """stm/model.py:93-105: skip fusion + 2x upsample."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, pm):
        s = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="convFS")(f)
        s = ResBlock(self.dim, dtype=self.dtype, name="ResFS")(s)
        up = jax.image.resize(pm, (pm.shape[0], 2 * pm.shape[1],
                                   2 * pm.shape[2], pm.shape[3]),
                              method="bilinear")
        return ResBlock(self.dim, dtype=self.dtype, name="ResMM")(s + up)


class STMNet(nn.Module):
    """stm/model.py:167-253, single-object runtime form."""
    keydim: int = 128
    valdim: int = 512
    mdim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder_q = resnet50(self.dtype)
        self.encoder_m = resnet50(self.dtype)
        self.conv1_m = nn.Conv(64, (7, 7), strides=(2, 2),
                               padding=[(3, 3), (3, 3)], use_bias=False,
                               dtype=self.dtype, name="conv1_m")
        self.conv1_o = nn.Conv(64, (7, 7), strides=(2, 2),
                               padding=[(3, 3), (3, 3)], use_bias=False,
                               dtype=self.dtype, name="conv1_o")
        self.kv_m_key = nn.Conv(self.keydim, (3, 3), padding="SAME",
                                dtype=self.dtype, name="KV_M_Key")
        self.kv_m_val = nn.Conv(self.valdim, (3, 3), padding="SAME",
                                dtype=self.dtype, name="KV_M_Value")
        self.kv_q_key = nn.Conv(self.keydim, (3, 3), padding="SAME",
                                dtype=self.dtype, name="KV_Q_Key")
        self.kv_q_val = nn.Conv(self.valdim, (3, 3), padding="SAME",
                                dtype=self.dtype, name="KV_Q_Value")
        self.dec_convFM = nn.Conv(self.mdim, (3, 3), padding="SAME",
                                  dtype=self.dtype, name="dec_convFM")
        self.dec_resMM = ResBlock(self.mdim, dtype=self.dtype,
                                  name="dec_ResMM")
        self.dec_rf3 = Refine(self.mdim, dtype=self.dtype, name="dec_RF3")
        self.dec_rf2 = Refine(self.mdim, dtype=self.dtype, name="dec_RF2")
        self.dec_pred = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                                name="dec_pred2")

    def _norm(self, frame):
        return (frame - jnp.asarray(_MEAN)) / jnp.asarray(_STD)

    def memorize(self, frame, mask, other: Optional[jnp.ndarray] = None):
        """frame (B, H, W, 3) in [0, 1], mask/other (B, H, W) target /
        other-objects probability -> (key (B, h, w, keydim),
        value (B, h, w, valdim)) at stride 16 (Encoder_M + KV_M)."""
        if other is None:
            other = jnp.zeros_like(mask)
        add = self.conv1_m(mask[..., None]) + self.conv1_o(other[..., None])
        r = self.encoder_m(self._norm(frame), ("layer3",), conv1_add=add)
        r4 = r["layer3"]
        return self.kv_m_key(r4), self.kv_m_val(r4)

    def query_features(self, frame):
        r = self.encoder_q(self._norm(frame),
                           ("layer1", "layer2", "layer3"))
        return r["layer3"], r["layer2"], r["layer1"]

    def segment(self, frame, mem_keys, mem_vals, mem_valid):
        """frame (1, H, W, 3); mem_keys (T, h, w, keydim), mem_vals
        (T, h, w, valdim), mem_valid (T,) in {0, 1}. Returns the object
        AGGREGATED probability (H, W)."""
        r4, r3, r2 = self.query_features(frame)
        qk = self.kv_q_key(r4)[0]            # (h, w, kd)
        qv = self.kv_q_val(r4)[0]            # (h, w, vd)

        T, h, w, kd = mem_keys.shape
        mk = mem_keys.reshape(T * h * w, kd)
        mv = mem_vals.reshape(T * h * w, self.valdim)
        logits = jnp.einsum("pk,hwk->phw", mk, qk,
                            preferred_element_type=jnp.float32) \
            / jnp.sqrt(jnp.asarray(kd, jnp.float32))
        mask = jnp.repeat(mem_valid, h * w)  # (T*h*w,)
        logits = jnp.where(mask[:, None, None] > 0, logits, -1e30)
        p = jax.nn.softmax(logits, axis=0)   # over time x space
        mem = jnp.einsum("phw,pv->hwv", p, mv)

        m4 = jnp.concatenate([mem, qv], axis=-1)[None]   # (1, h, w, 1024)
        m4 = self.dec_resMM(self.dec_convFM(m4))
        m3 = self.dec_rf3(r3, m4)
        m2 = self.dec_rf2(r2, m3)
        logit = self.dec_pred(nn.relu(m2))
        H, W = frame.shape[1:3]
        logit = jax.image.resize(logit, (1, H, W, 2), method="bilinear")
        ps = jax.nn.softmax(logit, axis=-1)[0, ..., 1]
        # Soft_aggregation + the tracker's softmax over K (model.py:212-219
        # + stm.py:131): at K=2 em=[1-p, p] -> log-odds -> softmax is NOT
        # the identity — it SHARPENS: p_out = sigmoid(2 logit(p)), with the
        # reference's 1e-7 clamp reproduced
        em1 = jnp.clip(ps, 1e-7, 1 - 1e-7)
        em0 = jnp.clip(1.0 - ps, 1e-7, 1 - 1e-7)
        l1 = jnp.log(em1 / (1.0 - em1))
        l0 = jnp.log(em0 / (1.0 - em0))
        return jnp.exp(l1 - jnp.logaddexp(l0, l1))  # aggregated object prob

    def __call__(self, frame, mask):
        """Init-time forward touching every submodule (B=1: the memorize
        batch axis doubles as the T axis)."""
        k, v = self.memorize(frame, mask)
        return self.segment(frame, k, v, jnp.ones((1,), jnp.float32))


def build_stm(dtype=jnp.float32) -> STMNet:
    return STMNet(dtype=dtype)
