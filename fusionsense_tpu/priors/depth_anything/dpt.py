"""DPT decode head for the Depth-Anything-V2 port (flax).

Behavioral contract: Depth-Anything-V2's DPTHead (use_clstoken=False, the
released relative-depth checkpoints) — per-level 1x1 projection, resize
stack (x4 / x2 / identity / stride-2), 3x3 "scratch" convs onto a common
feature width, top-down FeatureFusionBlocks with two ResidualConvUnits
each, then the two-stage output conv producing non-negative relative
INVERSE depth at input resolution.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.priors.depth_anything.vit import (
    DinoViT, ViTConfig, tiny_vit,
)


@dataclasses.dataclass(frozen=True)
class DAConfig:
    vit: ViTConfig = ViTConfig()
    out_channels: tuple = (48, 96, 192, 384)   # vits; vitb (96,192,384,768)
    features: int = 64                         # vits; vitb 128, vitl 256


def tiny_da() -> DAConfig:
    return DAConfig(vit=tiny_vit(), out_channels=(8, 16, 24, 32), features=16)


def _resize(x, h, w):
    """Bilinear with torch align_corners=True semantics — what upstream
    DPT uses for every refinenet/output interpolate. jax.image.resize only
    offers half-pixel sampling, so index directly: out i maps to input
    i*(H-1)/(h-1)."""
    H, W, _ = x.shape
    ys = jnp.linspace(0.0, H - 1.0, h)
    xs = jnp.linspace(0.0, W - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(H - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(W - 2, 0))
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    top = x[y0][:, x0] * (1 - wx) + x[y0][:, x1] * wx
    bot = x[y1][:, x0] * (1 - wx) + x[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(
            nn.relu(x))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(
            nn.relu(y))
        return x + y


class FusionBlock(nn.Module):
    """FeatureFusionBlock: merge skip via RCU1, refine via RCU2, upsample
    2x, 1x1 out_conv."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        h, w = out_hw if out_hw is not None else (x.shape[0] * 2,
                                                  x.shape[1] * 2)
        x = _resize(x, h, w)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    cfg: DAConfig

    @nn.compact
    def __call__(self, feats, patch_hw, out_hw):
        c = self.cfg
        h, w = patch_hw
        # per-level projection + resize stack
        levels = []
        for i, (patch, _cls) in enumerate(feats):
            y = nn.Conv(c.out_channels[i], (1, 1), name=f"project{i}")(patch)
            if i == 0:
                y = nn.ConvTranspose(c.out_channels[i], (4, 4),
                                     strides=(4, 4), name="resize0")(y)
            elif i == 1:
                y = nn.ConvTranspose(c.out_channels[i], (2, 2),
                                     strides=(2, 2), name="resize1")(y)
            elif i == 3:
                y = nn.Conv(c.out_channels[i], (3, 3), strides=(2, 2),
                            padding=1, name="resize3")(y)
            levels.append(nn.Conv(c.features, (3, 3), padding=1,
                                  use_bias=False, name=f"scratch{i}")(y))

        l1, l2, l3, l4 = levels                 # 4h, 2h, h, h/2 grids
        p4 = FusionBlock(c.features, name="refine4")(
            l4, out_hw=(l3.shape[0], l3.shape[1]))
        p3 = FusionBlock(c.features, name="refine3")(
            p4, l3, out_hw=(l2.shape[0], l2.shape[1]))
        p2 = FusionBlock(c.features, name="refine2")(
            p3, l2, out_hw=(l1.shape[0], l1.shape[1]))
        # refine1 upsamples 2x from the 4h grid (reference: FeatureFusionBlock
        # default scale_factor=2) so out_conv1 runs on the 8h grid it was
        # trained at; the final bilinear resize to (H, W) happens after.
        p1 = FusionBlock(c.features, name="refine1")(
            p2, l1, out_hw=(l1.shape[0] * 2, l1.shape[1] * 2))

        y = nn.Conv(c.features // 2, (3, 3), padding=1, name="out_conv1")(p1)
        y = _resize(y, out_hw[0], out_hw[1])
        y = nn.Conv(32, (3, 3), padding=1, name="out_conv2a")(y)
        y = nn.Conv(1, (1, 1), name="out_conv2b")(nn.relu(y))
        return nn.relu(y[..., 0])               # (H, W) relative inv depth


class DepthAnything(nn.Module):
    cfg: DAConfig = DAConfig()

    @nn.compact
    def __call__(self, img):                    # (H, W, 3) normalized
        c = self.cfg
        H, W, _ = img.shape
        feats = DinoViT(c.vit, name="pretrained")(img)
        return DPTHead(c, name="depth_head")(
            feats, (H // c.vit.patch, W // c.vit.patch), (H, W))
