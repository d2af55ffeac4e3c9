"""Pure-torch replica of geffnet's ``tf_efficientnet_b5_ap`` (structure +
semantics), used ONLY by the parity harness: geffnet is not installed in
this environment, and the reference DSINE encoder is
``geffnet.create_model('tf_efficientnet_b5_ap')`` run module-by-module
(reference dn_splatter/scripts/dsine/submodules.py:19-39).

Faithful to geffnet for everything the encoder path exercises:
- module order conv_stem, bn1, act1, blocks, conv_head, bn2, act2,
  global_pool, classifier (iterated via ``_modules`` by the reference
  Encoder.forward)
- state_dict keys: ``conv_stem.weight``, ``bn1.*``,
  ``blocks.{i}.{j}.{conv_dw,conv_pw,conv_pwl,bn1,bn2,bn3,se.*}``,
  ``conv_head.weight``, ``bn2.*``
- TF-style asymmetric SAME padding on every conv, swish activation,
  BatchNorm eps 1e-3, SE squeeze channels = block input channels // 4

Register with ``sys.modules['geffnet'] = <this module>`` before importing
the reference DSINE sources.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _same_pad(size, k, s):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


class Conv2dSame(nn.Conv2d):
    """TF SAME padding computed dynamically from the input size."""

    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, bias=False):
        super().__init__(in_ch, out_ch, k, stride=stride, padding=0,
                         groups=groups, bias=bias)

    def forward(self, x):
        ph = _same_pad(x.shape[-2], self.kernel_size[0], self.stride[0])
        pw = _same_pad(x.shape[-1], self.kernel_size[1], self.stride[1])
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3)


class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class SqueezeExcite(nn.Module):
    def __init__(self, c, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(c, reduced, 1, bias=True)
        self.conv_expand = nn.Conv2d(reduced, c, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_reduce(s)
        s = s * torch.sigmoid(s)          # swish
        return x * torch.sigmoid(self.conv_expand(s))


class DepthwiseSeparableConv(nn.Module):
    """geffnet DS block: dw -> bn1 -> act -> SE -> pw -> bn2 (+residual)."""

    def __init__(self, c_in, c_out, k, stride, se_reduced):
        super().__init__()
        self.conv_dw = Conv2dSame(c_in, c_in, k, stride, groups=c_in)
        self.bn1 = _bn(c_in)
        self.se = SqueezeExcite(c_in, se_reduced)
        self.conv_pw = Conv2dSame(c_in, c_out, 1)
        self.bn2 = _bn(c_out)
        self.has_residual = stride == 1 and c_in == c_out
        self.act = Swish()

    def forward(self, x):
        y = self.act(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return y + x if self.has_residual else y


class InvertedResidual(nn.Module):
    """geffnet MBConv: pw-expand -> dw -> SE -> pwl-project (+residual)."""

    def __init__(self, c_in, c_out, k, stride, expand, se_reduced):
        super().__init__()
        mid = c_in * expand
        self.conv_pw = Conv2dSame(c_in, mid, 1)
        self.bn1 = _bn(mid)
        self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid)
        self.bn2 = _bn(mid)
        self.se = SqueezeExcite(mid, se_reduced)
        self.conv_pwl = Conv2dSame(mid, c_out, 1)
        self.bn3 = _bn(c_out)
        self.has_residual = stride == 1 and c_in == c_out
        self.act = Swish()

    def forward(self, x):
        y = self.act(self.bn1(self.conv_pw(x)))
        y = self.act(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_residual else y


# (repeats, out_ch, kernel, stride, expand) per stage — B5 widths/depths
B5_STAGES = ((3, 24, 3, 1, 1), (5, 40, 3, 2, 6), (5, 64, 5, 2, 6),
             (7, 128, 3, 2, 6), (7, 176, 5, 1, 6), (9, 304, 5, 2, 6),
             (3, 512, 3, 1, 6))
TINY_STAGES = ((1, 8, 3, 1, 1), (1, 12, 3, 2, 6), (1, 16, 5, 2, 6),
               (1, 24, 3, 2, 6), (1, 32, 5, 1, 6), (1, 40, 5, 2, 6),
               (1, 48, 3, 1, 6))


class EfficientNet(nn.Module):
    def __init__(self, stem=48, head=2048, stages=B5_STAGES):
        super().__init__()
        self.conv_stem = Conv2dSame(3, stem, 3, 2)
        self.bn1 = _bn(stem)
        self.act1 = Swish()
        blocks = []
        c_in = stem
        for reps, c_out, k, s, exp in stages:
            stage = []
            for j in range(reps):
                stride = s if j == 0 else 1
                se_red = max(1, c_in // 4)
                if exp == 1:
                    stage.append(DepthwiseSeparableConv(
                        c_in, c_out, k, stride, se_red))
                else:
                    stage.append(InvertedResidual(
                        c_in, c_out, k, stride, exp, se_red))
                c_in = c_out
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)
        self.conv_head = Conv2dSame(c_in, head, 1)
        self.bn2 = _bn(head)
        self.act2 = Swish()
        self.global_pool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Linear(head, 1000)


def create_model(name: str, pretrained: bool = False, **kw):
    assert name == "tf_efficientnet_b5_ap", name
    torch.manual_seed(0)
    m = EfficientNet()
    if pretrained:
        # randomize running stats too so BN parity is actually exercised
        _randomize_bn(m)
    return m


def _randomize_bn(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)
                mod.weight.normal_(1.0, 0.2, generator=g)
                mod.bias.normal_(0, 0.2, generator=g)
