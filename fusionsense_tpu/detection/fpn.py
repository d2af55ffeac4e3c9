"""RetinaNet-style FPN over the Swin stages.

Behavioral contract: PartSlip/GLIP/maskrcnn_benchmark/modeling/backbone/
fpn.py (lateral 1x1 + top-down nearest upsample + 3x3 output convs) with
LastLevelP6P7 (fpn.py:137-154, use_P5) producing P6 = conv/2(P5),
P7 = conv/2(relu(P6)); builder __init__.py:37-80 (in_channels
[384, 768, 1536] -> 256).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest(x, h, w):
    ry = h // x.shape[0] + (h % x.shape[0] > 0)
    y = jnp.repeat(jnp.repeat(x, ry, axis=0), ry, axis=1)
    return y[:h, :w]


class FPN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):       # [C3, C4, C5] NHWC -> [P3..P7]
        n = len(feats)
        inners = [
            nn.Conv(self.out_channels, (1, 1), name=f"fpn_inner{i + 1}")(f)
            for i, f in enumerate(feats)
        ]
        last = inners[-1]
        results = [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                           name=f"fpn_layer{n}")(last)]
        for i in range(n - 2, -1, -1):
            top_down = _upsample_nearest(last, *inners[i].shape[:2])
            last = inners[i] + top_down
            results.insert(0, nn.Conv(self.out_channels, (3, 3),
                                      padding=[(1, 1)] * 2,
                                      name=f"fpn_layer{i + 1}")(last))
        p5 = results[-1]
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                     padding=[(1, 1)] * 2, name="p6")(p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                     padding=[(1, 1)] * 2, name="p7")(nn.relu(p6))
        return results + [p6, p7]
