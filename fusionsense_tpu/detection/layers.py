"""Shared flax layers for the grounded detector.

Behavioral contracts from the reference (not ports of its code):
- Conv3x3Norm / ModulatedDeformConv: PartSlip/GLIP/.../rpn/vldyhead.py:97-138
  + layers/deform_conv.py (CUDA kernel deform_conv_cuda.cu:694).
- DYReLU: layers/dyrelu.py:39-110 (K2 + bias variant, reduction 4).
- h_sigmoid: rpn/vldyhead.py:28-35 (relu6(x+3)/6).
All tensors NHWC (TPU-native layout; the converter transposes torch NCHW).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.ops.detection import deform_conv2d


def h_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class Conv3x3Norm(nn.Module):
    """Conv (optionally modulated-deformable) + GroupNorm.

    When `deformable`, the caller passes (offset, mask) sampled at the
    OUTPUT spatial size — same contract as the reference's
    ModulatedDeformConv (vldyhead.py:108).
    """
    features: int
    stride: int = 1
    deformable: bool = False

    @nn.compact
    def __call__(self, x, offset: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None):
        if self.deformable:
            w = self.param("weight", nn.initializers.normal(0.01),
                           (3, 3, x.shape[-1], self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if offset is None:
                Ho = (x.shape[0] + 2 - 3) // self.stride + 1
                Wo = (x.shape[1] + 2 - 3) // self.stride + 1
                offset = jnp.zeros((Ho, Wo, 18), x.dtype)
                mask = jnp.ones((Ho, Wo, 9), x.dtype)
            y = deform_conv2d(x, offset, w, b, mask=mask, stride=self.stride,
                              padding=1)
        else:
            y = nn.Conv(self.features, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], name="conv")(x[None])[0]
        # flax GroupNorm treats axis 0 as batch — feed (1, H, W, C) so the
        # per-group statistics span the whole image like torch's
        return nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn")(y[None])[0]


class DyReLU(nn.Module):
    """Dynamic ReLU-B: out = max(x*a1+b1, x*a2+b2) with (a, b) predicted
    from the global-pooled feature (reference layers/dyrelu.py, exp=4)."""
    features: int

    @nn.compact
    def __call__(self, x):            # x: (H, W, C)
        c = x.shape[-1]
        squeeze = c // 4
        y = jnp.mean(x, axis=(0, 1))
        y = nn.relu(nn.Dense(squeeze, name="fc1")(y))
        y = h_sigmoid(nn.Dense(self.features * 4, name="fc2")(y))
        a1, b1, a2, b2 = jnp.split(y, 4)
        a1 = (a1 - 0.5) * 2.0 + 1.0       # lambda_a = 2, init_a = [1, 0]
        a2 = (a2 - 0.5) * 2.0
        b1 = b1 - 0.5                     # init_b = [0, 0]
        b2 = b2 - 0.5
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class Scale(nn.Module):
    """Learnable scalar multiplier (one per FPN level on bbox_pred)."""
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init), ())
        return x * s
