"""Pure-torch replica of LPIPS v0.1 (vgg) for the parity harness.

Neither `lpips` nor `torchvision` is installed here, so this replicates
the PUBLISHED architecture with the upstream state_dict key layout
(torchvision `features.{i}.weight` for the VGG-16 trunk, LPIPS
`lin{k}.model.1.weight` for the heads) so the repo converter can be
round-trip-tested without downloads.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
SLICE_ENDS = (4, 9, 16, 23, 30)     # feature indices AFTER relu1_2..relu5_3


class VGG16Features(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        c = 3
        for v in VGG_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(c, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                c = v
        self.features = nn.Sequential(*layers)

    def slices(self, x):
        outs = []
        prev = 0
        for end in SLICE_ENDS:
            for i in range(prev, end):
                x = self.features[i](x)
            outs.append(x)
            prev = end
        return outs


class LinLayer(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.model = nn.Sequential(nn.Dropout(),
                                   nn.Conv2d(c, 1, 1, bias=False))


class LPIPSVgg(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = VGG16Features()
        chans = [64, 128, 256, 512, 512]
        for i, c in enumerate(chans):
            setattr(self, f"lin{i}", LinLayer(c))
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    @staticmethod
    def _unit(f, eps=1e-10):
        return f / torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True) + eps)

    def forward(self, x0, x1):
        """inputs in [-1, 1]."""
        x0 = (x0 - self.shift) / self.scale
        x1 = (x1 - self.shift) / self.scale
        f0 = self.net.slices(x0)
        f1 = self.net.slices(x1)
        total = 0.0
        for i in range(5):
            d = (self._unit(f0[i]) - self._unit(f1[i])) ** 2
            lin = getattr(self, f"lin{i}").model[1]
            total = total + lin(d).mean(dim=(2, 3))
        return total[:, 0]
