"""Pure-torch replica of omnidata's DPT-Hybrid normal model
(MiDaS ``DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)``) with
the upstream state_dict key layout, for the parity harness — the
omnidata_tools package is not installed and the reference does not vendor
it (dn_splatter/scripts/normals_from_pretrain.py:30 imports it).
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class StdConv2d(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        m = w.mean(dim=(1, 2, 3), keepdim=True)
        v = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-6)
        return F.conv2d(x, w, self.bias, self.stride, self.padding,
                        self.dilation, self.groups)


class PreActBottleneck(nn.Module):
    def __init__(self, cin, cout, mid, stride=1):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, cin), cin)
        self.conv1 = StdConv2d(cin, mid, 1, bias=False)
        self.norm2 = nn.GroupNorm(min(32, mid), mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride=stride, padding=1,
                               bias=False)
        self.norm3 = nn.GroupNorm(min(32, mid), mid)
        self.conv3 = StdConv2d(mid, cout, 1, bias=False)
        if stride != 1 or cin != cout:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2d(cin, cout, 1, stride=stride,
                                             bias=False)
        else:
            self.downsample = None

    def forward(self, x):
        xp = F.relu(self.norm1(x))
        shortcut = self.downsample.conv(xp) if self.downsample else x
        y = self.conv1(xp)
        y = self.conv2(F.relu(self.norm2(y)))
        y = self.conv3(F.relu(self.norm3(y)))
        return y + shortcut


class ResNetV2Backbone(nn.Module):
    def __init__(self, stem=64, layout=(3, 4, 9), width=256):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = StdConv2d(3, stem, 7, stride=2, padding=3,
                                   bias=False)
        self.stem.norm = nn.GroupNorm(min(32, stem), stem)
        stages = []
        cin = stem
        for si, reps in enumerate(layout):
            cout = width * 2 ** si
            blocks = []
            for bi in range(reps):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(PreActBottleneck(cin, cout, cout // 4, stride))
                cin = cout
            stage = nn.Module()
            stage.blocks = nn.Sequential(*blocks)
            stages.append(stage)
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        y = F.relu(self.stem.norm(self.stem.conv(x)))
        y = F.max_pool2d(y, 3, stride=2, padding=1)
        outs = []
        for stage in self.stages:
            y = stage.blocks(y)
            outs.append(y)
        return outs


class Mlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

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


class Block(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class HybridViT(nn.Module):
    def __init__(self, stem, layout, width, dim, depth, heads, native):
        super().__init__()
        self.native = native
        self.patch_embed = nn.Module()
        self.patch_embed.backbone = ResNetV2Backbone(stem, layout, width)
        self.patch_embed.proj = nn.Conv2d(width * 4, dim, 1)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + native ** 2, dim))
        self.blocks = nn.ModuleList([Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)   # unused by DPT hooks

    def forward_features(self, x, hooks):
        feats = self.patch_embed.backbone(x)
        y = self.patch_embed.proj(feats[-1])
        B, D, h, w = y.shape
        tok = y.flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(B, -1, -1), tok], dim=1)
        pos = self.pos_embed
        if h != self.native or w != self.native:
            cls_pos, grid = pos[:, :1], pos[:, 1:]
            g = self.native
            grid = grid.reshape(1, g, g, -1).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, (h, w), mode="bicubic",
                                 align_corners=False)
            pos = torch.cat(
                [cls_pos, grid.permute(0, 2, 3, 1).reshape(1, h * w, -1)], 1)
        tok = tok + pos
        taps = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in hooks:
                taps.append(tok)
        return feats, taps, (h, w)


class ProjectReadout(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, t):
        cls = t[:, :1].expand_as(t[:, 1:])
        return self.project(torch.cat([t[:, 1:], cls], dim=-1))


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

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class DPTHybridNormals(nn.Module):
    """State-dict layout matches the omnidata checkpoint:
    pretrained.model.* / pretrained.act_postprocess{3,4}.* / scratch.*."""

    def __init__(self, stem=64, layout=(3, 4, 9), width=256, dim=768,
                 depth=12, heads=12, hooks=(8, 11), native=24, features=256,
                 out_channels=(256, 512, 768, 768)):
        super().__init__()
        self.hooks = hooks
        self.pretrained = nn.Module()
        self.pretrained.model = HybridViT(stem, layout, width, dim, depth,
                                          heads, native)
        ap3 = nn.Sequential(ProjectReadout(dim), nn.Identity(), nn.Identity(),
                            nn.Conv2d(dim, out_channels[2], 1))
        ap4 = nn.Sequential(ProjectReadout(dim), nn.Identity(), nn.Identity(),
                            nn.Conv2d(dim, out_channels[3], 1),
                            nn.Conv2d(out_channels[3], out_channels[3], 3,
                                      stride=2, padding=1))
        self.pretrained.act_postprocess3 = ap3
        self.pretrained.act_postprocess4 = ap4
        scratch = nn.Module()
        for i, oc in enumerate(out_channels):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(oc, features, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(scratch, f"refinenet{i}", FeatureFusionBlock(features))
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, padding=1),
            nn.Identity(),                    # Interpolate module (no params)
            nn.Conv2d(features // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, 3, 1),
            nn.ReLU(), nn.Identity())
        self.scratch = scratch

    def forward(self, x):
        feats, taps, (h, w) = self.pretrained.model.forward_features(
            x, self.hooks)
        B = x.shape[0]

        def unflat(t):
            return t.transpose(1, 2).reshape(B, -1, h, w)

        l1, l2 = feats[0], feats[1]
        l3 = self.pretrained.act_postprocess3[3](
            unflat(self.pretrained.act_postprocess3[0](taps[0])))
        l4 = self.pretrained.act_postprocess4[0](taps[1])
        l4 = self.pretrained.act_postprocess4[3](unflat(l4))
        l4 = self.pretrained.act_postprocess4[4](l4)

        s = self.scratch
        r1 = s.layer1_rn(l1)
        r2 = s.layer2_rn(l2)
        r3 = s.layer3_rn(l3)
        r4 = s.layer4_rn(l4)
        p4 = s.refinenet4(r4)
        p3 = s.refinenet3(p4, r3)
        p2 = s.refinenet2(p3, r2)
        p1 = s.refinenet1(p2, r1)
        y = s.output_conv[0](p1)
        y = F.interpolate(y, scale_factor=2, mode="bilinear",
                          align_corners=True)
        for i in range(2, 7):
            y = s.output_conv[i](y)
        return y
