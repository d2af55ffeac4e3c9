"""Cross-modal early fusion (VLFuse / bi-directional multi-head attention).

Behavioral contract: PartSlip/GLIP/maskrcnn_benchmark/utils/fuse_helper.py:
171-427 (BiMultiHeadAttention + BiAttentionBlockForCheckpoint with
SEPARATE_BIDIRECTIONAL=False: all FPN levels flattened into one visual
sequence, a single joint attention, layer-scale residuals) and
rpn/vldyhead.py:350-557 (VLFuse MHA-B branch). Visual softmax is masked by
the language attention mask; language softmax over image positions is
unmasked but max-stabilized, matching the reference's asymmetric scheme.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

V_DIM = 256       # joint embedding size (visual)
L_DIM = 768       # language dim
EMBED = 2048      # fused attention dim
HEADS = 8
CLAMP = 50000.0


class BiMultiHeadAttention(nn.Module):
    v_dim: int = V_DIM
    l_dim: int = L_DIM
    embed: int = EMBED

    @nn.compact
    def __call__(self, v, l, l_mask):
        # v: (Nv, v_dim), l: (Nl, l_dim), l_mask: (Nl,)
        EMBED = self.embed
        hd = EMBED // HEADS

        def heads(t):
            return t.reshape(-1, HEADS, hd).transpose(1, 0, 2)

        q = heads(nn.Dense(EMBED, name="v_proj")(v) * (hd ** -0.5))
        k = heads(nn.Dense(EMBED, name="l_proj")(l))
        vv = heads(nn.Dense(EMBED, name="values_v_proj")(v))
        vl = heads(nn.Dense(EMBED, name="values_l_proj")(l))

        attn = jnp.clip(q @ k.transpose(0, 2, 1), -CLAMP, CLAMP)  # (h, Nv, Nl)

        # language->image attention: transpose, stabilize, softmax (unmasked)
        attn_l = attn.transpose(0, 2, 1)
        attn_l = attn_l - jnp.max(attn_l, axis=-1, keepdims=True)
        attn_l = jax.nn.softmax(jnp.clip(attn_l, -CLAMP, CLAMP), axis=-1)

        # image->language attention: mask padded tokens
        attn_v = jax.nn.softmax(
            attn + jnp.where(l_mask > 0, 0.0, -9e15)[None, None, :], axis=-1)

        out_v = (attn_v @ vl).transpose(1, 0, 2).reshape(-1, EMBED)
        out_l = (attn_l @ vv).transpose(1, 0, 2).reshape(-1, EMBED)
        return (nn.Dense(self.v_dim, name="out_v_proj")(out_v),
                nn.Dense(self.l_dim, name="out_l_proj")(out_l))


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with layer-scale residuals (gamma init 1/8)."""
    v_dim: int = V_DIM
    l_dim: int = L_DIM
    embed: int = EMBED
    init_values: float = 1.0 / 8.0

    @nn.compact
    def __call__(self, v, l, l_mask):
        gamma_v = self.param("gamma_v",
                             nn.initializers.constant(self.init_values),
                             (self.v_dim,))
        gamma_l = self.param("gamma_l",
                             nn.initializers.constant(self.init_values),
                             (self.l_dim,))
        vn = nn.LayerNorm(epsilon=1e-5, name="layer_norm_v")(v)
        ln = nn.LayerNorm(epsilon=1e-5, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(self.v_dim, self.l_dim, self.embed,
                                      name="attn")(vn, ln, l_mask)
        # the reference residual base is the NORMED tensor, not the raw
        # input (fuse_helper.py single_attention_call:419-426)
        return vn + gamma_v * dv, ln + gamma_l * dl


class VLFuse(nn.Module):
    """Flatten all FPN levels -> one joint bi-attention -> unflatten."""
    v_dim: int = V_DIM
    l_dim: int = L_DIM
    embed: int = EMBED

    @nn.compact
    def __call__(self, feats, lang, l_mask):
        sizes = [f.shape[:2] for f in feats]
        flat = jnp.concatenate([f.reshape(-1, f.shape[-1]) for f in feats], 0)
        new_v, new_l = BiAttentionBlock(self.v_dim, self.l_dim, self.embed,
                                        name="b_attn")(flat, lang, l_mask)
        out, start = [], 0
        for (h, w) in sizes:
            out.append(new_v[start:start + h * w].reshape(h, w, -1))
            start += h * w
        return out, new_l
