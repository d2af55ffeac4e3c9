"""Torch replica of the in-repo Metric3D-class net (see
fusionsense_tpu/priors/metric3d/model.py for the verification-boundary
note: the hub source is not on disk, so this replica pins the converter
layout and the flax semantics, not hub-release numerics)."""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_ref.depth_anything_torch import (
    Block, FeatureFusionBlock,
)


class RegisterViT(nn.Module):
    def __init__(self, dim, depth, heads, patch, registers, native):
        super().__init__()
        self.patch = patch
        self.registers = registers
        self.native = native
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.register_tokens = nn.Parameter(torch.zeros(1, registers, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + native ** 2, dim))
        self.blocks = nn.ModuleList([Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, img, idx):
        B = img.shape[0]
        y = self.patch_embed.proj(img)
        _, D, h, w = y.shape
        tok = y.flatten(2).transpose(1, 2)
        pos = self.pos_embed
        if h != self.native or w != self.native:
            cls_pos, grid = pos[:, :1], pos[:, 1:]
            g = self.native
            grid = grid.reshape(1, g, g, -1).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, (h, w), mode="bicubic",
                                 align_corners=False)
            pos = torch.cat(
                [cls_pos, grid.permute(0, 2, 3, 1).reshape(1, h * w, -1)], 1)
        x = torch.cat([self.cls_token.expand(B, -1, -1) + pos[:, :1],
                       self.register_tokens.expand(B, -1, -1),
                       tok + pos[:, 1:]], dim=1)
        outs = []
        want = set(idx)
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in want:
                y = self.norm(x)
                outs.append(y[:, 1 + self.registers:])
        return outs, (h, w)


class ConvGRU(nn.Module):
    def __init__(self, hidden, inp, ks=3):
        super().__init__()
        p = (ks - 1) // 2
        self.convz = nn.Conv2d(hidden + inp, hidden, ks, padding=p)
        self.convr = nn.Conv2d(hidden + inp, hidden, ks, padding=p)
        self.convq = nn.Conv2d(hidden + inp, hidden, ks, padding=p)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


def convex_upsample(out, mask, k):
    B, C, H, W = out.shape
    m = mask.view(B, 1, 9, k, k, H, W).softmax(dim=2)
    pad = F.pad(out, (1, 1, 1, 1), mode="replicate")
    nb = F.unfold(pad, [3, 3], padding=0).view(B, C, 9, 1, 1, H, W)
    up = torch.sum(m * nb, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(B, C, k * H, k * W)


def _resize_ac(x, h, w):
    return F.interpolate(x, (h, w), mode="bilinear", align_corners=True)


class M3DDecoder(nn.Module):
    def __init__(self, dim, out_channels, features, hidden, num_iter, ds,
                 d_min, d_max):
        super().__init__()
        self.num_iter = num_iter
        self.ds = ds
        self.d_min, self.d_max = d_min, d_max
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim, oc, 1) for oc in out_channels])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, stride=4),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, stride=2,
                      padding=1)])
        self.scratch = nn.ModuleList(
            [nn.Conv2d(oc, features, 3, padding=1, bias=False)
             for oc in out_channels])
        for i in range(1, 5):
            setattr(self, f"refinenet{i}", FeatureFusionBlock(features))
        self.init_pred = nn.Conv2d(features, 5, 3, padding=1)
        self.init_hidden = nn.Conv2d(features, hidden, 3, padding=1)
        self.init_context = nn.Conv2d(features, hidden, 3, padding=1)
        self.gru = ConvGRU(hidden, hidden + 5)
        self.delta_hidden = nn.Conv2d(hidden, hidden, 3, padding=1)
        self.delta_head = nn.Conv2d(hidden, 5, 3, padding=1)
        self.up_mask = nn.Conv2d(hidden, 9 * ds * ds, 3, padding=1)

    def forward(self, feats, hw, out_hw):
        h, w = hw
        B = feats[0].shape[0]
        levels = []
        for i, t in enumerate(feats):
            y = t.transpose(1, 2).reshape(B, -1, h, w)
            y = self.projects[i](y)
            y = self.resize_layers[i](y)
            levels.append(self.scratch[i](y))
        l1, l2, l3, l4 = levels
        p4 = self.refinenet4(l4, size=l3.shape[2:])
        p3 = self.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.refinenet2(p3, l2, size=l1.shape[2:])
        ctx = self.refinenet1(p2, l1)
        gh, gw = out_hw[0] // self.ds, out_hw[1] // self.ds
        ctx = _resize_ac(ctx, gh, gw)

        pred = self.init_pred(ctx)
        hidden = torch.tanh(self.init_hidden(ctx))
        inp = F.relu(self.init_context(ctx))
        for _ in range(self.num_iter):
            hidden = self.gru(hidden, torch.cat([inp, pred], 1))
            pred = pred + self.delta_head(F.relu(self.delta_hidden(hidden)))
        up = convex_upsample(pred, self.up_mask(hidden), self.ds)
        up = _resize_ac(up, *out_hw)

        s = torch.sigmoid(up[:, 0])
        depth = self.d_min * torch.exp(s * math.log(self.d_max / self.d_min))
        n = up[:, 1:4]
        normal = n / torch.clamp(n.norm(dim=1, keepdim=True), min=1e-12)
        kappa = F.softplus(up[:, 4])
        return depth, normal, kappa


class Metric3DTorch(nn.Module):
    def __init__(self, dim=384, depth=12, heads=6, patch=14, registers=4,
                 native=37, layer_idx=(2, 5, 8, 11),
                 out_channels=(48, 96, 192, 384), features=128, hidden=64,
                 num_iter=4, ds=7, d_min=0.3, d_max=150.0):
        super().__init__()
        self.layer_idx = layer_idx
        self.encoder = RegisterViT(dim, depth, heads, patch, registers,
                                   native)
        self.decoder = M3DDecoder(dim, out_channels, features, hidden,
                                  num_iter, ds, d_min, d_max)

    def forward(self, img):
        H, W = img.shape[2:]
        feats, hw = self.encoder(img, self.layer_idx)
        return self.decoder(feats, hw, (H, W))
