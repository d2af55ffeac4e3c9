"""LPIPS (VGG-16 variant) in pure JAX — the reference's perceptual metric
(reference dn_splatter/metrics.py:11 RGBMetrics via torchmetrics) without a
torch runtime dependency.

Architecture follows the published LPIPS v0.1 "vgg" net: ScalingLayer
normalization, VGG-16 features at relu1_2/2_2/3_3/4_3/5_3, channel-unit
normalization, squared difference, learned 1x1 linear heads, spatial mean,
sum over the five layers.

Weights-gated like the other ports: `convert_lpips_weights` maps the torch
state dicts (torchvision VGG-16 `features.*` + LPIPS `lin*.model.1.weight`)
onto this tree; round-trip parity vs a torch replica is pinned by
tests/test_parity_lpips.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG-16 feature indices of the conv layers in each slice
VGG_SLICES = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return y + b


def _features(params, x):
    """(H, W, 3) scaled input -> list of 5 slice outputs (post-ReLU)."""
    outs = []
    for si, slice_convs in enumerate(VGG_SLICES):
        for ci in range(len(slice_convs)):
            p = params[f"conv{si}_{ci}"]
            x = jax.nn.relu(_conv(x, p["kernel"], p["bias"]))
        outs.append(x)
        if si < len(VGG_SLICES) - 1:
            # 2x2 max pool stride 2 between slices
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (2, 2, 1), (2, 2, 1), "VALID")
    return outs


def _unit_norm(f, eps=1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips_pair(params, img0, img1):
    """(H, W, 3) in [0, 1] pair -> scalar LPIPS distance."""
    def prep(x):
        x = x * 2.0 - 1.0                      # [-1, 1], LPIPS convention
        return (x - _SHIFT) / _SCALE

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = 0.0
    for si in range(len(VGG_SLICES)):
        d = (_unit_norm(f0[si]) - _unit_norm(f1[si])) ** 2
        w = params[f"lin{si}"]                 # (C,) nonneg head weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def convert_lpips_weights(vgg_state: dict, lpips_state: dict) -> dict:
    """torchvision VGG-16 `features.*` + LPIPS `lin{k}` state dicts ->
    params for lpips_pair. Accepts tensors or ndarrays."""
    def arr(v):
        return np.asarray(getattr(v, "detach", lambda: v)().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    params: dict = {}
    for si, slice_convs in enumerate(VGG_SLICES):
        for ci, (idx, _c) in enumerate(slice_convs):
            params[f"conv{si}_{ci}"] = {
                "kernel": arr(vgg_state[f"features.{idx}.weight"])
                .transpose(2, 3, 1, 0),
                "bias": arr(vgg_state[f"features.{idx}.bias"]),
            }
    for si in range(5):
        # lpips lin heads: (1, C, 1, 1) conv kernels, no bias
        for key in (f"lin{si}.model.1.weight", f"lins.{si}.model.1.weight"):
            if key in lpips_state:
                params[f"lin{si}"] = arr(lpips_state[key])[0, :, 0, 0]
                break
        else:
            raise KeyError(f"lin{si} head missing from LPIPS state dict")
    return params


def load_lpips_params(path: str) -> dict:
    """Load converted params saved by `save_lpips_params` (npz)."""
    z = np.load(path)
    params: dict = {}
    for k in z.files:
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[k]
    return params


def save_lpips_params(path: str, params: dict) -> None:
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(key, v)
            else:
                flat[key] = np.asarray(v)

    walk("", params)
    np.savez(path, **flat)
