"""Swin Transformer backbone (flax, NHWC, single image).

Behavioral contract: the reference's GLIP Swin backbone
(PartSlip/GLIP/maskrcnn_benchmark/modeling/backbone/swint.py:431-646):
patch-embed conv 4x4/4 + LayerNorm, 4 stages of shifted-window attention
blocks with relative position bias, PatchMerging between stages, per-stage
output LayerNorms, outputs stages 2-5 (strides 4/8/16/32). Swin-L config:
embed 192, depths (2,2,18,2), heads (6,12,24,48), window 12.

TPU notes: all shapes static at trace time; window partition is pure
reshape/transpose (layout ops, free under XLA); attention matmuls land on
the MXU.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 192
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (6, 12, 24, 48)
    window: int = 12
    mlp_ratio: float = 4.0
    out_indices: tuple = (1, 2, 3)   # FPN consumes strides 8/16/32


def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) lookup into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


def _shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask for shifted windows (-100 blocked)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask):       # x: (nW, N, C); mask (nW, N, N)|None
        w, h = self.window, self.heads
        N = w * w
        hd = self.dim // h
        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, h))
        idx = _relative_position_index(w).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)

        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(-1, N, 3, h, hd), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)
        attn = q @ k.transpose(0, 1, 3, 2) + bias[None]
        if mask is not None:
            attn = attn + mask[:, None, :, :]
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, H, W):       # x: (H*W, C)
        w = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(H, W, self.dim)
        Hp = int(np.ceil(H / w)) * w
        Wp = int(np.ceil(W / w)) * w
        x = jnp.pad(x, ((0, Hp - H), (0, Wp - W), (0, 0)))
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(0, 1))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, w, self.shift))
        else:
            mask = None
        xw = x.reshape(Hp // w, w, Wp // w, w, self.dim)
        xw = xw.transpose(0, 2, 1, 3, 4).reshape(-1, w * w, self.dim)
        xw = WindowAttention(self.dim, self.heads, w, name="attn")(xw, mask)
        x = xw.reshape(Hp // w, Wp // w, w, w, self.dim)
        x = x.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, self.dim)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(0, 1))
        x = x[:H, :W].reshape(H * W, self.dim)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):       # (H*W, C) -> (ceil(H/2)*ceil(W/2), 2C)
        x = x.reshape(H, W, self.dim)
        x = jnp.pad(x, ((0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate([x[0::2, 0::2], x[1::2, 0::2],
                             x[0::2, 1::2], x[1::2, 1::2]], axis=-1)
        x = x.reshape(-1, 4 * self.dim)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig = SwinConfig()

    @nn.compact
    def __call__(self, img):            # (H, W, 3) -> list of (h, w, C_i)
        c = self.cfg
        H0, W0 = img.shape[:2]
        pad_h = (-H0) % 4
        pad_w = (-W0) % 4
        img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(c.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_embed_proj")(img[None])[0]
        H, W = x.shape[:2]
        x = x.reshape(H * W, c.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        outs = []
        dim = c.embed_dim
        for i, depth in enumerate(c.depths):
            for b in range(depth):
                x = SwinBlock(dim, c.num_heads[i], c.window,
                              shift=0 if b % 2 == 0 else c.window // 2,
                              mlp_ratio=c.mlp_ratio,
                              name=f"layers_{i}_blocks_{b}")(x, H, W)
            if i in c.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs.append(y.reshape(H, W, dim))
            if i < len(c.depths) - 1:
                x = PatchMerging(dim, name=f"layers_{i}_downsample")(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
                dim *= 2
        return outs
