"""Pure-torch CPU replacement for maskrcnn_benchmark.layers.deform_conv
(the reference's _C CUDA ops raise NotImplementedError on CPU).

Registered into ``sys.modules['maskrcnn_benchmark.layers.deform_conv']``
BEFORE ``maskrcnn_benchmark.layers`` is imported, so the reference GLIP
modules run on CPU for the parity harness.  Semantics follow the mmcv/_C
kernels (csrc/cuda/deform_conv_kernel_cuda.cu): offset channel layout is
interleaved (tap_y, tap_x) per kernel tap within each deformable group,
bilinear taps outside the image contribute zero.

Module/parameter structure (weight/bias names, shapes) matches the
reference classes exactly so ``state_dict()`` round-trips are faithful.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.modules.utils import _pair


def _dcn_core(x, offset, mask, weight, bias, stride, padding, dilation,
              groups, deformable_groups):
    """Shared forward: ``mask=None`` gives DCNv1 semantics."""
    N, C, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    oh = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    ow = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    dg = deformable_groups
    kk = kh * kw

    if offset.shape[-2:] != (oh, ow):
        # the CUDA kernel reads the offset/mask buffers as contiguous
        # (C, oh, ow) planes regardless of their true spatial size — i.e.
        # the flat row-major prefix of each channel plane (this happens in
        # DyConv's top-down branch, vldyhead.py:199-210). Replicate for
        # the single-image case the harness uses.
        assert N == 1, "offset reinterpretation implemented for N=1 only"
        offset = offset.reshape(N, offset.shape[1], -1)[
            :, :, :oh * ow].reshape(N, offset.shape[1], oh, ow)
        if mask is not None:
            mask = mask.reshape(N, mask.shape[1], -1)[
                :, :, :oh * ow].reshape(N, mask.shape[1], oh, ow)

    off = offset.view(N, dg, kk, 2, oh, ow)
    msk = None if mask is None else mask.view(N, dg, kk, oh, ow)
    base_y = torch.arange(oh, dtype=x.dtype, device=x.device) * sh - ph
    base_x = torch.arange(ow, dtype=x.dtype, device=x.device) * sw - pw

    def _sample(img, py, px):
        """CUDA dmcn_im2col_bilinear: per-corner zero outside (exact at
        size-1 dims, unlike grid_sample's align_corners mapping)."""
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        ly = (py - y0).unsqueeze(1)
        lx = (px - x0).unsqueeze(1)
        y0 = y0.long()
        x0 = x0.long()
        out = 0.0
        for (yi, xi, wt) in ((y0, x0, (1 - ly) * (1 - lx)),
                             (y0, x0 + 1, (1 - ly) * lx),
                             (y0 + 1, x0, ly * (1 - lx)),
                             (y0 + 1, x0 + 1, ly * lx)):
            ok = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            yc = yi.clamp(0, H - 1)
            xc = xi.clamp(0, W - 1)
            flat = img.flatten(2)                      # (N, C', H*W)
            idx = (yc * W + xc).flatten(1)             # (N, oh*ow)
            v = flat.gather(2, idx.unsqueeze(1).expand(
                -1, img.shape[1], -1)).view(*img.shape[:2], *yi.shape[1:])
            out = out + wt * v * ok.unsqueeze(1)
        return out

    xg = x.view(N, dg, C // dg, H, W)
    col = []                        # dg-major, tap-minor channel blocks
    for g in range(dg):
        taps = []
        for t in range(kk):
            i, j = t // kw, t % kw
            py = base_y[:, None] + i * dh + off[:, g, t, 0]      # (N,oh,ow)
            px = base_x[None, :] + j * dw + off[:, g, t, 1]
            s = _sample(xg[:, g], py, px)
            if msk is not None:
                s = s * msk[:, g, t][:, None]
            taps.append(s)
        col.append(torch.stack(taps, dim=2))     # (N, C/dg, kk, oh, ow)
    col = torch.cat(col, dim=1)                  # (N, C, kk, oh, ow)

    cg = C // groups
    og = Cout // groups
    outs = []
    for g in range(groups):
        c = col[:, g * cg:(g + 1) * cg].reshape(N, cg * kk, oh * ow)
        w = weight[g * og:(g + 1) * og].reshape(og, cg * kk)
        outs.append((w @ c).view(N, og, oh, ow))
    out = torch.cat(outs, dim=1)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def deform_conv(input, offset, weight, stride=1, padding=0, dilation=1,
                groups=1, deformable_groups=1, im2col_step=64):
    return _dcn_core(input, offset, None, weight, None, stride, padding,
                     dilation, groups, deformable_groups)


def modulated_deform_conv(input, offset, mask, weight, bias=None, stride=1,
                          padding=0, dilation=1, groups=1,
                          deformable_groups=1):
    return _dcn_core(input, offset, mask, weight, bias, stride, padding,
                     dilation, groups, deformable_groups)


class DeformConv(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=False):
        assert not bias
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.weight = nn.Parameter(torch.Tensor(
            out_channels, in_channels // groups, *self.kernel_size))
        self.reset_parameters()

    def reset_parameters(self):
        n = self.in_channels
        for k in self.kernel_size:
            n *= k
        self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))

    def forward(self, input, offset):
        return deform_conv(input, offset, self.weight, self.stride,
                           self.padding, self.dilation, self.groups,
                           self.deformable_groups)


class ModulatedDeformConv(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.with_bias = bias
        self.weight = nn.Parameter(torch.Tensor(
            out_channels, in_channels // groups, *self.kernel_size))
        if bias:
            self.bias = nn.Parameter(torch.Tensor(out_channels))
        else:
            self.register_parameter("bias", None)
        self.reset_parameters()

    def reset_parameters(self):
        n = self.in_channels
        for k in self.kernel_size:
            n *= k
        self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))
        if self.bias is not None:
            self.bias.data.zero_()

    def forward(self, input, offset, mask):
        return modulated_deform_conv(
            input, offset, mask, self.weight, self.bias, self.stride,
            self.padding, self.dilation, self.groups,
            self.deformable_groups)


class ModulatedDeformConvPack(ModulatedDeformConv):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__(in_channels, out_channels, kernel_size, stride,
                         padding, dilation, groups, deformable_groups, bias)
        self.conv_offset_mask = nn.Conv2d(
            in_channels // groups,
            deformable_groups * 3 * self.kernel_size[0] * self.kernel_size[1],
            kernel_size=self.kernel_size, stride=_pair(stride),
            padding=_pair(padding), bias=True)
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, input):
        out = self.conv_offset_mask(input)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return modulated_deform_conv(
            input, offset, mask, self.weight, self.bias, self.stride,
            self.padding, self.dilation, self.groups,
            self.deformable_groups)
