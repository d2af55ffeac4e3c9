"""Omnidata DPT-Hybrid surface-normal network (flax).

Behavioral contract: the reference's alternate normal prior — omnidata's
``DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)`` loaded from
``omnidata_dpt_normal_v2.ckpt`` (reference
dn_splatter/scripts/normals_from_pretrain.py:309-322, 149-245). The
omnidata_tools package is not vendored by the reference, so this
implements the published MiDaS DPT-Hybrid architecture:

- ResNetV2-50 stem (weight-standardized convs + GroupNorm(32), pre-act
  bottlenecks, stage layout (3, 4, 9)) whose stage-1/2 outputs feed the
  DPT pyramid directly,
- ViT-B/16 on the /16 stem feature (1x1 patch embed, cls token, 24x24
  learned pos-embed grid, 12 pre-LN blocks, exact GELU), tapped after
  blocks 9 and 12,
- "project" readout (cls token concat + Linear + GELU) and the two
  act_postprocess convs,
- DPT scratch/refinenet stack (align_corners=True bilinear) with the
  3-channel normal head (final ReLU; callers clamp to [0, 1] like the
  reference script does).

Round-trip parity vs a torch replica with the upstream (MiDaS/timm)
state_dict layout is pinned by tests/test_parity_omnidata.py. All tensors
NHWC, single image per call.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class OmniConfig:
    stem_width: int = 64
    stage_layout: tuple = (3, 4, 9)
    stage_width: int = 256            # stage i width = stage_width * 2**i
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    hooks: tuple = (8, 11)            # transformer taps (blocks 9 and 12)
    native_grid: int = 24             # pos-embed grid (384/16)
    features: int = 256               # DPT feature width
    out_channels: tuple = (256, 512, 768, 768)


def tiny_omni() -> OmniConfig:
    return OmniConfig(stem_width=8, stage_layout=(1, 1, 1), stage_width=16,
                      vit_dim=32, vit_depth=4, vit_heads=2, hooks=(1, 3),
                      native_grid=4, features=16, out_channels=(16, 32, 32, 32))


class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2d: per-out-channel
    mean/var over (in, kh, kw), eps 1e-6, UNBIASED=False variance)."""
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        flat = k.reshape(-1, self.features)
        mean = jnp.mean(flat, axis=0)
        var = jnp.var(flat, axis=0)
        kn = (k - mean) * jax.lax.rsqrt(var + 1e-6)
        pad = (self.kernel - 1) // 2
        y = jax.lax.conv_general_dilated(
            x[None], kn, (self.stride, self.stride), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


def _gn(x, name_scope, module, groups=32):
    return module(x[None])[0]


class PreActBottleneck(nn.Module):
    """timm ResNetV2 pre-activation bottleneck."""
    mid: int
    out: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        # groups = min(32, C): equals timm's 32 at real widths, shrinks for
        # the tiny test config
        def gn(n, c):
            return nn.GroupNorm(num_groups=min(32, c), epsilon=1e-5, name=n)

        xp = nn.relu(gn("norm1", x.shape[-1])(x[None])[0])
        shortcut = x
        if self.downsample:
            shortcut = StdConv(self.out, 1, self.stride,
                               name="downsample_conv")(xp)
        y = StdConv(self.mid, 1, 1, name="conv1")(xp)
        y = nn.relu(gn("norm2", self.mid)(y[None])[0])
        y = StdConv(self.mid, 3, self.stride, name="conv2")(y)
        y = nn.relu(gn("norm3", self.mid)(y[None])[0])
        y = StdConv(self.out, 1, 1, name="conv3")(y)
        return y + shortcut


class ResNetV2Stem(nn.Module):
    cfg: OmniConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = StdConv(c.stem_width, 7, 2, name="stem_conv")(x)
        y = nn.relu(nn.GroupNorm(num_groups=min(32, c.stem_width),
                                 epsilon=1e-5,
                                 name="stem_norm")(y[None])[0])
        # 3x3/2 max pool, SAME-ish padding 1
        y = jax.lax.reduce_window(
            jnp.pad(y, ((1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf),
            -jnp.inf, jax.lax.max, (3, 3, 1), (2, 2, 1), "VALID")
        outs = []
        for si, reps in enumerate(c.stage_layout):
            out_ch = c.stage_width * (2 ** si) * 1
            mid = out_ch // 4
            for bi in range(reps):
                stride = 2 if (bi == 0 and si > 0) else 1
                down = bi == 0
                y = PreActBottleneck(mid, out_ch, stride, down,
                                     name=f"stage{si}_block{bi}")(y)
            outs.append(y)
        return outs          # [/4 (256), /8 (512), /16 (1024)]


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):                       # (T, D)
        T, D = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(h)
        q, k, v = (qkv.reshape(T, 3, self.heads, D // self.heads)
                   .transpose(1, 2, 0, 3))
        att = jax.nn.softmax(
            (q * (D // self.heads) ** -0.5) @ jnp.swapaxes(k, -1, -2), -1)
        o = (att @ v).transpose(1, 0, 2).reshape(T, D)
        x = x + nn.Dense(D, name="attn_proj")(o)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(4 * D, name="fc1")(y)
        y = nn.Dense(D, name="fc2")(nn.gelu(y, approximate=False))
        return x + y


def _resize_ac_true(x, h, w):
    """align_corners=True bilinear over (H, W, C)."""
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
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = _resize_ac_true(x, x.shape[0] * 2, x.shape[1] * 2)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


def resample_pos_embed(pos, native, h, w):
    if h == native and w == native:
        return pos
    cls_pos, patch_pos = pos[:1], pos[1:]
    grid = patch_pos.reshape(native, native, -1)
    grid = jax.image.resize(grid, (h, w, grid.shape[-1]), method="bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(h * w, -1)], axis=0)


class OmnidataNormals(nn.Module):
    """(H, W, 3) image in [0, 1] -> (H, W, 3) normal map in [0, 1]
    (the omnidata encoding: n = out * 2 - 1, LUF camera frame — the
    reference converts LUF->RUF and [0,1]->[-1,1] downstream)."""
    cfg: OmniConfig = OmniConfig()

    @nn.compact
    def __call__(self, img):
        c = self.cfg
        H, W, _ = img.shape
        r1, r2, r3 = ResNetV2Stem(c, name="backbone")(img)

        h, w = r3.shape[:2]
        x = nn.Dense(c.vit_dim, name="patch_embed")(
            r3.reshape(h * w, -1))
        cls = self.param("cls_token", nn.initializers.zeros, (1, c.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + c.native_grid ** 2, c.vit_dim))
        x = jnp.concatenate([cls, x], axis=0)
        x = x + resample_pos_embed(pos, c.native_grid, h, w)
        taps = []
        want = set(c.hooks)
        for i in range(c.vit_depth):
            x = ViTBlock(c.vit_dim, c.vit_heads, name=f"block{i}")(x)
            if i in want:
                taps.append(x)

        # "project" readout: concat cls onto every token, Linear + GELU
        def readout(t, name):
            tok, cl = t[1:], t[0]
            y = jnp.concatenate(
                [tok, jnp.broadcast_to(cl, tok.shape)], axis=-1)
            y = nn.gelu(nn.Dense(c.vit_dim, name=f"{name}_proj")(y),
                        approximate=False)
            return y.reshape(h, w, c.vit_dim)

        l3 = readout(taps[0], "readout3")
        l4 = readout(taps[1], "readout4")
        l3 = nn.Conv(c.out_channels[2], (1, 1), name="post3")(l3)
        l4 = nn.Conv(c.out_channels[3], (1, 1), name="post4a")(l4)
        l4 = nn.Conv(c.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                     name="post4b")(l4[None])[0]

        f = c.features
        s1 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="scratch1")(r1)
        s2 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="scratch2")(r2)
        s3 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="scratch3")(l3)
        s4 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="scratch4")(l4)

        p4 = FusionBlock(f, name="refine4")(s4)
        p3 = FusionBlock(f, name="refine3")(p4, s3)
        p2 = FusionBlock(f, name="refine2")(p3, s2)
        p1 = FusionBlock(f, name="refine1")(p2, s1)

        y = nn.Conv(f // 2, (3, 3), padding=1, name="head0")(p1)
        y = _resize_ac_true(y, y.shape[0] * 2, y.shape[1] * 2)
        y = nn.Conv(32, (3, 3), padding=1, name="head2")(y)
        y = nn.Conv(3, (1, 1), name="head4")(nn.relu(y))
        return nn.relu(y)        # non_negative head; callers clamp to <=1
