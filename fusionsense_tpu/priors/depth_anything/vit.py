"""DINOv2 ViT encoder (flax) for the Depth-Anything-V2 port.

Behavioral contract: the `pretrained` DINOv2 backbone driven by
Depth-Anything-V2's DPT pipeline — patch14 conv embedding, cls token,
learned position embeddings (bicubically resampled for non-native grids),
pre-LN transformer blocks with LayerScale, and `get_intermediate_layers`
semantics (selected blocks' patch tokens + cls token, with the FINAL
LayerNorm applied to each selected layer — DINOv2's norm=True default).

The reference repo (ai4ce/FusionSense) drives its mono-depth prior through
torch.hub (dn_splatter/scripts/depth_from_pretrain.py:44); this is the
in-repo TPU-native generator filling that role. All tensors NHWC/(tokens,
dim); single image per call (vmap for batches).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    dim: int = 384              # vits=384, vitb=768, vitl=1024
    depth: int = 12             # vits/vitb=12, vitl=24
    heads: int = 6              # vits=6, vitb=12, vitl=16
    patch: int = 14
    mlp_ratio: float = 4.0
    native_grid: int = 37       # pos-embed grid the checkpoint was trained at
    layer_idx: tuple = (2, 5, 8, 11)   # DA-V2 intermediate layers (vits)


def tiny_vit() -> ViTConfig:
    return ViTConfig(dim=32, depth=4, heads=2, patch=14, native_grid=4,
                     layer_idx=(0, 1, 2, 3))


class Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):                       # (T, D)
        T, D = x.shape
        qkv = nn.Dense(3 * D, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(T, 3, self.heads, D // self.heads)
                            .transpose(1, 2, 0, 3), 3, axis=0)
        q, k, v = q[0], k[0], v[0]               # (H, T, hd)
        scale = (D // self.heads) ** -0.5
        att = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, -1, -2), axis=-1)
        out = (att @ v).transpose(1, 0, 2).reshape(T, D)
        return nn.Dense(D, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2", nn.initializers.ones, (self.dim,))
        h = Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(name="norm1")(x))
        x = x + ls1 * h
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(nn.gelu(y, approximate=False))
        return x + ls2 * y


def resample_pos_embed(pos: jax.Array, native: int, h: int, w: int):
    """(1 + native^2, D) learned pos embeds -> (1 + h*w, D) for the actual
    patch grid (DINOv2 interpolate_pos_encoding, bicubic)."""
    if h == native and w == native:
        return pos
    cls_pos, patch_pos = pos[:1], pos[1:]
    grid = patch_pos.reshape(native, native, -1)
    grid = jax.image.resize(grid, (h, w, grid.shape[-1]), method="bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(h * w, -1)], axis=0)


class DinoViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, img):                     # (H, W, 3) normalized
        c = self.cfg
        H, W, _ = img.shape
        h, w = H // c.patch, W // c.patch
        x = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    name="patch_embed")(img)     # (h, w, D)
        x = x.reshape(h * w, c.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, c.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + c.native_grid ** 2, c.dim))
        x = jnp.concatenate([cls, x], axis=0)
        x = x + resample_pos_embed(pos, c.native_grid, h, w)

        final_norm = nn.LayerNorm(name="norm")
        outs = []
        want = set(c.layer_idx)
        for i in range(c.depth):
            x = Block(c.dim, c.heads, c.mlp_ratio, name=f"block{i}")(x)
            if i in want:
                y = final_norm(x)
                outs.append((y[1:].reshape(h, w, c.dim), y[0]))
        return outs                              # [(patch (h,w,D), cls (D,))]
