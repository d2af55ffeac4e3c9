"""Metric3D-v2-class metric depth + normal network (flax).

Fills the orchestrator's default depth-prior slot (reference
utils/metric3dv2_depth_generation.py:79-81 loads `metric3d_vit_small` /
`metric3d_vit_giant2` via torch.hub) with an in-repo TPU-native net of the
published Metric3D v2 design (arXiv 2404.15506):

- DINOv2 ViT backbone WITH register tokens (4), tapped at four depths,
- DPT-style reassembly/fusion pyramid for a context feature,
- joint depth+normal prediction refined by a RAFT-style ConvGRU loop
  (iterative residual updates on [depth, normal, kappa]),
- learned convex upsampling to input resolution,
- bounded canonical depth via sigmoid scaling into [d_min, d_max]; the
  caller de-canonicalizes by fx/1000 (priors/metric3d/wrapper.py, which
  mirrors the reference wrapper exactly).

Verification boundary (stated honestly): the reference does not vendor
the Metric3D torch source and the hub is unreachable air-gapped, so —
unlike the DSINE/GLIP ports — numerical identity to the released hub
weights cannot be pinned here. What IS pinned: converter round-trip
against the torch replica (tests/torch_ref/metric3d_torch.py,
tests/test_parity_metric3d.py) and the exact wrapper pre/post contract
against the on-disk reference code.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.priors.dsine.model import ConvGRU, convex_upsample
from fusionsense_tpu.priors.depth_anything.dpt import (
    FusionBlock, _resize,
)


@dataclasses.dataclass(frozen=True)
class M3DConfig:
    dim: int = 384               # vit_small
    depth: int = 12
    heads: int = 6
    patch: int = 14
    registers: int = 4
    native_grid: int = 37
    layer_idx: tuple = (2, 5, 8, 11)
    out_channels: tuple = (48, 96, 192, 384)
    features: int = 128          # decoder width
    hidden_dim: int = 64         # GRU hidden
    num_iter: int = 4
    downsample: int = 7          # convex-upsample factor (patch/2)
    d_min: float = 0.3           # canonical depth range (metres at f=1000)
    d_max: float = 150.0


def tiny_m3d() -> M3DConfig:
    return M3DConfig(dim=32, depth=4, heads=2, registers=2, native_grid=4,
                     layer_idx=(0, 1, 2, 3), out_channels=(8, 16, 24, 32),
                     features=16, hidden_dim=8, num_iter=2)


class RegisterViT(nn.Module):
    """DINOv2-with-registers: [cls, reg x R, patches]; pos embed applies to
    cls+patches only (registers are position-free)."""
    cfg: M3DConfig

    @nn.compact
    def __call__(self, img):
        from fusionsense_tpu.priors.depth_anything.vit import (
            Block, resample_pos_embed,
        )

        c = self.cfg
        H, W, _ = img.shape
        h, w = H // c.patch, W // c.patch
        x = nn.Conv(c.dim, (c.patch, c.patch), strides=(c.patch, c.patch),
                    name="patch_embed")(img).reshape(h * w, c.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, c.dim))
        reg = self.param("register_tokens", nn.initializers.zeros,
                         (c.registers, c.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + c.native_grid ** 2, c.dim))
        pe = resample_pos_embed(pos, c.native_grid, h, w)
        x = jnp.concatenate([cls + pe[:1], reg, x + pe[1:]], axis=0)

        final_norm = nn.LayerNorm(name="norm")
        outs = []
        want = set(c.layer_idx)
        for i in range(c.depth):
            x = Block(c.dim, c.heads, 4.0, name=f"block{i}")(x)
            if i in want:
                y = final_norm(x)
                outs.append(y[1 + c.registers:].reshape(h, w, c.dim))
        return outs


class M3DDecoder(nn.Module):
    """DPT reassembly + fusion -> context; initial joint prediction; RAFT
    ConvGRU refinement; convex upsample."""
    cfg: M3DConfig

    @nn.compact
    def __call__(self, feats, out_hw):
        c = self.cfg
        # reassemble: per-level projection + resize stack (4h, 2h, h, h/2)
        levels = []
        for i, patch in enumerate(feats):
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
        l1, l2, l3, l4 = levels
        p4 = FusionBlock(c.features, name="refine4")(
            l4, out_hw=(l3.shape[0], l3.shape[1]))
        p3 = FusionBlock(c.features, name="refine3")(
            p4, l3, out_hw=(l2.shape[0], l2.shape[1]))
        p2 = FusionBlock(c.features, name="refine2")(
            p3, l2, out_hw=(l1.shape[0], l1.shape[1]))
        ctx = FusionBlock(c.features, name="refine1")(
            p2, l1, out_hw=(l1.shape[0] * 2, l1.shape[1] * 2))
        # ctx grid = 8h = out/downsample for patch 14 with ds 7 ... the
        # working grid of the iterative head
        gh, gw = out_hw[0] // c.downsample, out_hw[1] // c.downsample
        ctx = _resize(ctx, gh, gw)

        # initial joint prediction: [depth_logit, nx, ny, nz, kappa]
        pred = nn.Conv(5, (3, 3), padding=1, name="init_pred")(ctx)
        hidden = jnp.tanh(nn.Conv(c.hidden_dim, (3, 3), padding=1,
                                  name="init_hidden")(ctx))
        inp = nn.relu(nn.Conv(c.hidden_dim, (3, 3), padding=1,
                              name="init_context")(ctx))

        gru = ConvGRU(c.hidden_dim, ks=3, name="gru")
        delta_hidden = nn.Conv(c.hidden_dim, (3, 3), padding=1,
                               name="delta_hidden")
        delta_head = nn.Conv(5, (3, 3), padding=1, name="delta_head")
        for _ in range(c.num_iter):
            hidden = gru(hidden, jnp.concatenate([inp, pred], -1))
            pred = pred + delta_head(nn.relu(delta_hidden(hidden)))

        up_mask = nn.Conv(9 * c.downsample ** 2, (3, 3), padding=1,
                          name="up_mask")(hidden)
        up = convex_upsample(pred, up_mask, c.downsample)
        up = _resize(up, out_hw[0], out_hw[1])

        s = jax.nn.sigmoid(up[..., 0])
        depth = c.d_min * jnp.exp(s * math.log(c.d_max / c.d_min))
        n = up[..., 1:4]
        normal = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        kappa = jax.nn.softplus(up[..., 4])
        return depth, normal, kappa


class Metric3D(nn.Module):
    """(H, W, 3) normalized image -> (canonical depth (H, W),
    normal (H, W, 3), kappa (H, W))."""
    cfg: M3DConfig = M3DConfig()

    @nn.compact
    def __call__(self, img):
        c = self.cfg
        H, W, _ = img.shape
        feats = RegisterViT(c, name="encoder")(img)
        return M3DDecoder(c, name="decoder")(feats, (H, W))
