"""VLDyHead: the fused vision-language dynamic head.

Behavioral contract: PartSlip/GLIP/maskrcnn_benchmark/modeling/rpn/
vldyhead.py:141-233 (DyConv: 3-branch cross-scale conv with spatial
attention fusion, modulated deformable 3x3 + GN, DyReLU) and :560-859
(tower of NUM_CONVS=8 x [VLFuse, BertEncoderLayer, DyConv]; bbox/centerness
1x1 heads with per-level Scale; dot-product token head with normalized
language embedding, /2 projection, language bias and log-scale temperature,
logits clamped to +-50000).

The reference computes deformable offsets once per level and reuses that
tensor for the stride-1 conv applied to the coarser level, whose output is
a smaller spatial size: the CUDA im2col kernel then reads the offset
buffer as if it were (18, h', w') — i.e. the flat row-major PREFIX of each
(H, W) channel plane. The published weights were trained under that
reinterpretation, so `_reinterpret_plane` reproduces it exactly here
(verified by tests/test_parity_glip.py round-trip vs the reference torch
sources).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.detection.bert import BertConfig, BertLayer
from fusionsense_tpu.detection.fusion import VLFuse
from fusionsense_tpu.detection.layers import Conv3x3Norm, DyReLU, Scale, h_sigmoid


def _upsample_bilinear_ac(x, h, w):
    """Bilinear upsample with align_corners=True (torch
    F.upsample_bilinear semantics, used at vldyhead.py:210)."""
    ih, iw = x.shape[:2]

    def axis_interp(n_in, n_out):
        if n_in == 1:
            return jnp.zeros(n_out, jnp.int32), jnp.zeros(n_out, jnp.int32), \
                jnp.zeros(n_out)
        c = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n_in - 2)
        return lo, lo + 1, c - lo

    y0, y1, fy = axis_interp(ih, h)
    x0, x1, fx = axis_interp(iw, w)
    top = x[y0][:, x0] * (1 - fx[None, :, None]) + x[y0][:, x1] * fx[None, :, None]
    bot = x[y1][:, x0] * (1 - fx[None, :, None]) + x[y1][:, x1] * fx[None, :, None]
    return top * (1 - fy[:, None, None]) + bot * fy[:, None, None]

NUM_CONVS = 8
CHANNELS = 256
LOG_SCALE_INIT = 0.0
PRIOR_BIAS = -4.59511985013459   # -log((1-0.01)/0.01), focal prior
CLAMP = 50000.0


class DyConv(nn.Module):
    """One dynamic conv stage over the 5-level pyramid."""
    channels: int = CHANNELS

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        # per-level offsets+masks at each level's own resolution
        offset_conv = nn.Conv(27, (3, 3), padding=[(1, 1)] * 2, name="offset")
        oms = [offset_conv(f) for f in feats]

        c = self.channels
        conv_same = Conv3x3Norm(c, 1, deformable=True, name="conv_mid")
        conv_down = Conv3x3Norm(c, 2, deformable=True, name="conv_down")
        conv_up = Conv3x3Norm(c, 1, deformable=True, name="conv_up")
        attn_conv = nn.Conv(1, (1, 1), name="attn_conv")
        dyrelu = DyReLU(c, name="dyrelu")

        def om(level):
            o = oms[level]
            return o[..., :18], nn.sigmoid(o[..., 18:])

        def _reinterpret_plane(t, h, w):
            """Read (H, W, C) as the row-major prefix of each channel
            plane reshaped to (h, w) — the reference CUDA kernel's view of
            a current-level offset buffer applied at a coarser level."""
            flat = t.transpose(2, 0, 1).reshape(t.shape[-1], -1)
            return flat[:, :h * w].reshape(t.shape[-1], h, w).transpose(1, 2, 0)

        out = []
        for lv, f in enumerate(feats):
            o, m = om(lv)
            branches = [conv_same(f, o, m)]
            if lv > 0:
                branches.append(conv_down(feats[lv - 1], o, m))
            if lv < n - 1:
                hc, wc = feats[lv + 1].shape[:2]
                o2 = _reinterpret_plane(o, hc, wc)
                m2 = _reinterpret_plane(m, hc, wc)
                up = conv_up(feats[lv + 1], o2, m2)
                branches.append(_upsample_bilinear_ac(up, *f.shape[:2]))
            # spatial pyramid attention fusion (vldyhead.py:214-224)
            attns = [h_sigmoid(nn.relu(attn_conv(
                jnp.mean(b, axis=(0, 1))[None, None]))) for b in branches]
            fused = sum(b * a for b, a in zip(branches, attns)) / len(branches)
            out.append(dyrelu(fused))
        return out


class VLDyHead(nn.Module):
    """Tower + prediction heads. Returns per-level (bbox, ctr, dot_logits)."""
    bert_cfg: BertConfig = BertConfig()
    channels: int = CHANNELS
    num_convs: int = NUM_CONVS
    fuse_embed: int = 2048

    @nn.compact
    def __call__(self, feats, lang, l_mask):
        attn_bias = jnp.where(l_mask > 0, 0.0, -1e9)[None, None, :]
        lang_dim = self.bert_cfg.hidden
        for i in range(self.num_convs):
            feats, lang = VLFuse(self.channels, lang_dim, self.fuse_embed,
                                 name=f"fuse_{i}")(feats, lang, l_mask)
            lang = BertLayer(self.bert_cfg, clamp=CLAMP,
                             name=f"lang_layer_{i}")(lang, attn_bias)
            feats = DyConv(self.channels, name=f"dyconv_{i}")(feats)

        # dot-product token head (vldyhead.py:765-847)
        emb = lang / jnp.maximum(
            jnp.linalg.norm(lang, axis=-1, keepdims=True), 1e-12)
        proj_tokens = nn.Dense(self.channels,
                               name="dot_product_projection_text")(
            emb / 2.0)                                   # (T, channels)
        bias_lang = self.param("bias_lang", nn.initializers.zeros,
                               (lang_dim,))
        bias0 = self.param("bias0", nn.initializers.constant(PRIOR_BIAS), (1,))
        log_scale = self.param("log_scale",
                               nn.initializers.constant(LOG_SCALE_INIT), (1,))
        tok_bias = emb @ bias_lang + bias0               # (T,)

        bbox_conv = nn.Conv(4, (1, 1), name="bbox_pred")
        ctr_conv = nn.Conv(1, (1, 1), name="centerness")
        out = []
        for lv, f in enumerate(feats):
            bbox = Scale(name=f"scale_{lv}")(bbox_conv(f))   # (H, W, 4)
            ctr = ctr_conv(f)                                # (H, W, 1)
            q = f.reshape(-1, self.channels)
            dot = q @ proj_tokens.T / jnp.exp(log_scale) + tok_bias[None]
            dot = jnp.clip(dot, -CLAMP, CLAMP)               # (HW, T)
            out.append((bbox.reshape(-1, 4), ctr.reshape(-1), dot))
        return out
