"""EfficientNet feature encoder (tf SAME padding, inference-only flax).

Behavioral contract: DSINE's encoder is geffnet `tf_efficientnet_b5_ap`
run module-by-module, keeping the outputs of every block stage (reference
dn_splatter/scripts/dsine/submodules.py:19-39). The decoder consumes
stages at strides /2, /4, /8, /16 and the 2048-channel conv_head output
at /32 (dsine.py:50-57, channels INPUT_CHANNELS_DICT[5] =
[2048, 176, 64, 40, 24]).

tf_ semantics reproduced exactly: asymmetric SAME padding on stride-2
convs, BatchNorm eps 1e-3 (inference: running stats as parameters),
swish activation, SE squeeze on block INPUT channels.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


def _same_pads(size: int, k: int, s: int) -> tuple[int, int]:
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def conv_same(x, features, kernel, stride, name, groups=1, use_bias=False):
    """tf-SAME conv over (H, W, C)."""
    h, w = x.shape[:2]
    ph = _same_pads(h, kernel, stride)
    pw = _same_pads(w, kernel, stride)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[ph, pw], feature_group_count=groups,
                   use_bias=use_bias, name=name)(x)


class BatchNormInference(nn.Module):
    """BN with stored running stats (tf eps 1e-3)."""
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * scale * jax.lax.rsqrt(var + self.eps) + bias


def swish(x):
    return x * jax.nn.sigmoid(x)


class SqueezeExcite(nn.Module):
    reduced: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(0, 1))
        s = swish(nn.Dense(self.reduced, name="conv_reduce")(s))
        s = jax.nn.sigmoid(nn.Dense(x.shape[-1], name="conv_expand")(s))
        return x * s


class DepthwiseSeparable(nn.Module):
    """Stage-0 block: dw conv + SE + pointwise (no expansion)."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    se_reduced: int = 0

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        y = conv_same(x, c_in, self.kernel, self.stride, "conv_dw",
                      groups=c_in)
        y = swish(BatchNormInference(name="bn1")(y))
        if self.se_reduced:
            y = SqueezeExcite(self.se_reduced, name="se")(y)
        y = conv_same(y, self.out_ch, 1, 1, "conv_pw")
        y = BatchNormInference(name="bn2")(y)
        if self.stride == 1 and c_in == self.out_ch:
            y = y + x
        return y


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand + dw + SE + 1x1 project."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    se_reduced: int = 0

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = c_in * self.expand
        y = conv_same(x, mid, 1, 1, "conv_pw")
        y = swish(BatchNormInference(name="bn1")(y))
        y = conv_same(y, mid, self.kernel, self.stride, "conv_dw", groups=mid)
        y = swish(BatchNormInference(name="bn2")(y))
        if self.se_reduced:
            y = SqueezeExcite(self.se_reduced, name="se")(y)
        y = conv_same(y, self.out_ch, 1, 1, "conv_pwl")
        y = BatchNormInference(name="bn3")(y)
        if self.stride == 1 and c_in == self.out_ch:
            y = y + x
        return y


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    """B5 by default; `tiny` below for tests."""
    stem: int = 48
    head: int = 2048
    # per stage: (repeats, out_ch, kernel, stride, expand)
    stages: tuple = ((3, 24, 3, 1, 1), (5, 40, 3, 2, 6), (5, 64, 5, 2, 6),
                     (7, 128, 3, 2, 6), (7, 176, 5, 1, 6), (9, 304, 5, 2, 6),
                     (3, 512, 3, 1, 6))


def tiny_effnet() -> EffNetConfig:
    return EffNetConfig(
        stem=8, head=64,
        stages=((1, 8, 3, 1, 1), (1, 12, 3, 2, 6), (1, 16, 5, 2, 6),
                (1, 24, 3, 2, 6), (1, 32, 5, 1, 6), (1, 40, 5, 2, 6),
                (1, 48, 3, 1, 6)))


class EfficientNetEncoder(nn.Module):
    """(H, W, 3) -> dict of stage outputs {s2, s4, s8, s16, head(/32)}."""
    cfg: EffNetConfig = EffNetConfig()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = conv_same(x, c.stem, 3, 2, "conv_stem")
        x = swish(BatchNormInference(name="bn1")(x))
        stage_out = []
        for i, (reps, out_ch, k, s, exp) in enumerate(c.stages):
            for j in range(reps):
                stride = s if j == 0 else 1
                c_in = x.shape[-1]
                # tf convention: SE squeeze = block input channels // 4
                se_red = max(1, c_in // 4)
                name = f"blocks_{i}_{j}"
                if exp == 1:
                    x = DepthwiseSeparable(out_ch, k, stride, se_red,
                                           name=name)(x)
                else:
                    x = InvertedResidual(out_ch, k, stride, exp, se_red,
                                         name=name)(x)
            stage_out.append(x)
        head = conv_same(x, c.head, 1, 1, "conv_head")
        # DSINE consumes conv_head PRE-bn2 (submodules.py feature index 11)
        return {"s2": stage_out[0], "s4": stage_out[1], "s8": stage_out[2],
                "s16": stage_out[4], "head": head}
