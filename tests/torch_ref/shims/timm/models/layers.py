"""Inference-equivalent stand-ins for the timm layers GLIP imports."""
import collections.abc

import torch
import torch.nn as nn


class DropPath(nn.Module):
    """Stochastic depth — identity at eval time (and the harness only
    runs eval forwards)."""

    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x


def to_2tuple(x):
    if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
        return tuple(x)
    return (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        tensor.normal_(mean, std).clamp_(a * std + mean, b * std + mean)
    return tensor
