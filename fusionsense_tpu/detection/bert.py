"""BERT-base language backbone (flax, inference-only).

Behavioral contract: the reference's language backbone
(PartSlip/GLIP/maskrcnn_benchmark/modeling/language_backbone/bert_model.py:
10-79) wraps HF bert-base-uncased (12 layers, hidden 768, heads 12,
intermediate 3072, post-LN) and, for the dot-product-token configuration
used by GLIP Swin-L, only its final hidden states and the attention mask
flow into the head. The VLDyHead tower additionally interleaves standalone
BertEncoderLayer blocks with attention-logit clamping
(rpn/vldyhead.py:236-288); `BertLayer(clamp=...)` covers both uses.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    eps: float = 1e-12


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    clamp: float = 0.0     # >0: clamp attention logits to +-clamp (tower use)

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        hd = c.hidden // c.heads
        q = nn.Dense(c.hidden, name="query")(x)
        k = nn.Dense(c.hidden, name="key")(x)
        v = nn.Dense(c.hidden, name="value")(x)

        def heads(t):
            return t.reshape(-1, c.heads, hd).transpose(1, 0, 2)

        logits = heads(q) @ heads(k).transpose(0, 2, 1) / (hd ** 0.5)
        if self.clamp > 0:
            logits = jnp.clip(logits, -self.clamp, self.clamp)
        attn = jax.nn.softmax(logits + attn_bias, axis=-1)
        out = (attn @ heads(v)).transpose(1, 0, 2).reshape(-1, c.hidden)
        return nn.Dense(c.hidden, name="out")(out)


class BertLayer(nn.Module):
    """Post-LN transformer layer (HF BERT structure)."""
    cfg: BertConfig
    clamp: float = 0.0

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        a = BertSelfAttention(c, self.clamp, name="attention")(x, attn_bias)
        x = nn.LayerNorm(epsilon=c.eps, name="attention_norm")(x + a)
        y = nn.Dense(c.intermediate, name="intermediate")(x)
        y = nn.Dense(c.hidden, name="output")(nn.gelu(y, approximate=False))
        return nn.LayerNorm(epsilon=c.eps, name="output_norm")(x + y)


class BertEncoder(nn.Module):
    """Embeddings + 12 layers -> final hidden states (seq, 768)."""
    cfg: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        L = input_ids.shape[0]
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (c.vocab_size, c.hidden))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (c.max_positions, c.hidden))
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (c.type_vocab, c.hidden))
        x = word[input_ids] + pos[:L] + typ[0]
        x = nn.LayerNorm(epsilon=c.eps, name="embeddings_norm")(x)
        bias = jnp.where(attention_mask > 0, 0.0, -1e9)[None, None, :]
        for i in range(c.layers):
            x = BertLayer(c, name=f"layer_{i}")(x, bias)
        return x
