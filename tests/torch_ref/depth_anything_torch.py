"""Pure-torch replica of Depth-Anything-V2 (DINOv2 backbone + DPT head),
used ONLY by the parity harness.

The reference obtains its mono-depth prior via torch.hub
(dn_splatter/scripts/depth_from_pretrain.py:153-155,
utils/metric3dv2_depth_generation.py:79-81), so no torch source exists on
disk; this replica reproduces the PUBLISHED DepthAnythingV2 architecture
and state_dict key layout (``pretrained.*`` DINOv2, ``depth_head.*`` DPT)
so the repo's converter can be round-trip-tested without downloads.

Forward semantics match upstream: pre-LN ViT blocks with LayerScale,
``get_intermediate_layers(norm=True, return_class_token=True)``, DPT
refinenets with align_corners=True bilinear resizes, final upsample to
(patch_h*14, patch_w*14).
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, T, D = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (D // self.heads) ** -0.5
        out = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, T, D)
        return self.proj(out)


class LayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)   # DINOv2 uses eps 1e-6
        self.attn = Attention(dim, heads)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)   # (B, T, D)


class DinoViT(nn.Module):
    def __init__(self, dim=384, depth=12, heads=6, patch=14, native_grid=37):
        super().__init__()
        self.patch = patch
        self.native_grid = native_grid
        self.patch_embed = PatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, 1 + native_grid ** 2, dim))
        self.blocks = nn.ModuleList(
            [Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def _pos(self, h, w):
        pos = self.pos_embed
        if h == self.native_grid and w == self.native_grid:
            return pos
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        g = self.native_grid
        grid = patch_pos.reshape(1, g, g, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, (h, w), mode="bicubic",
                             align_corners=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, h * w, -1)
        return torch.cat([cls_pos, grid], dim=1)

    def get_intermediate_layers(self, img, idx):
        B, _, H, W = img.shape
        h, w = H // self.patch, W // self.patch
        x = self.patch_embed(img)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self._pos(h, w)
        want = set(idx)
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in want:
                y = self.norm(x)
                outs.append((y[:, 1:], y[:, 0]))
        return outs


class ResidualConvUnit(nn.Module):
    def __init__(self, feat):
        super().__init__()
        self.conv1 = nn.Conv2d(feat, feat, 3, padding=1)
        self.conv2 = nn.Conv2d(feat, feat, 3, padding=1)

    def forward(self, x):
        y = self.conv1(F.relu(x))
        y = self.conv2(F.relu(y))
        return x + y


class FeatureFusionBlock(nn.Module):
    def __init__(self, feat):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(feat)
        self.resConfUnit2 = ResidualConvUnit(feat)
        self.out_conv = nn.Conv2d(feat, feat, 1)

    def forward(self, x, skip=None, size=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        if size is None:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
        else:
            x = F.interpolate(x, size=size, mode="bilinear",
                              align_corners=True)
        return self.out_conv(x)


class DPTHead(nn.Module):
    def __init__(self, dim, features=64, out_channels=(48, 96, 192, 384)):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim, oc, 1) for oc in out_channels])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, stride=4),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, stride=2,
                      padding=1),
        ])
        scratch = nn.Module()
        for i, oc in enumerate(out_channels):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(oc, features, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(scratch, f"refinenet{i}", FeatureFusionBlock(features))
        scratch.output_conv1 = nn.Conv2d(features, features // 2, 3,
                                         padding=1)
        scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU())
        self.scratch = scratch

    def forward(self, feats, patch_h, patch_w):
        out = []
        for i, (patch_tok, _cls) in enumerate(feats):
            x = patch_tok.permute(0, 2, 1).reshape(
                patch_tok.shape[0], -1, patch_h, patch_w)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            out.append(x)
        l1, l2, l3, l4 = out
        s = self.scratch
        l1, l2, l3, l4 = (s.layer1_rn(l1), s.layer2_rn(l2),
                          s.layer3_rn(l3), s.layer4_rn(l4))
        p4 = s.refinenet4(l4, size=l3.shape[2:])
        p3 = s.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = s.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = s.refinenet1(p2, l1)               # scale_factor=2 path
        y = s.output_conv1(p1)
        y = F.interpolate(y, (patch_h * 14, patch_w * 14), mode="bilinear",
                          align_corners=True)
        return s.output_conv2(y)[:, 0]          # (B, H, W)


class DepthAnythingV2(nn.Module):
    def __init__(self, dim=384, depth=12, heads=6, native_grid=37,
                 features=64, out_channels=(48, 96, 192, 384),
                 layer_idx=(2, 5, 8, 11)):
        super().__init__()
        self.layer_idx = layer_idx
        self.pretrained = DinoViT(dim, depth, heads, 14, native_grid)
        self.depth_head = DPTHead(dim, features, out_channels)

    def forward(self, img):
        _, _, H, W = img.shape
        feats = self.pretrained.get_intermediate_layers(img, self.layer_idx)
        return self.depth_head(feats, H // 14, W // 14)
