"""Loss primitives and the composite DN-Splatter loss.

Functional JAX equivalents of the reference's loss system:
- RGB DSSIM+L1 main loss (inherited by the reference from splatfacto;
  see SURVEY.md §2.4 inheritance note)
- depth losses {MSE, L1, LogL1, HuberL1, TV, EdgeAwareLogL1, EdgeAwareTV}
  (reference dn_splatter/losses.py:19-289)
- normal L1 / TV / cosine + pseudo-normal-from-depth supervision
  (reference dn_splatter/dn_model.py:767-815)
- 2D flatness `min(exp(scales))` (dn_model.py:817-819)
- sparse opacity entropy (dn_model.py:821-836)
- touch-normal MSE on anchored Gaussians (dn_model.py:893-904)

All take (pred, gt, mask) with mask broadcastable; reductions are
mask-weighted means so padded pixels never contribute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------- RGB ------

def gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _band_matrix(n_out: int, n_in: int, taps: jax.Array) -> jax.Array:
    """(n_out, n_in) banded matrix B with B[i, i+j] = taps[j] (VALID conv)."""
    k = taps.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    off = col - row
    inband = jnp.logical_and(off >= 0, off < k)
    return jnp.where(inband, taps[jnp.clip(off, 0, k - 1)], 0.0)


def _filter2d_batch(imgs: jax.Array, k1: jax.Array) -> jax.Array:
    """Separable filter over a (B, H, W) batch, VALID, as banded matmuls.

    A depthwise conv lowers to slow VPU code on TPU; expressing each 1D
    pass as a dense banded (out, in) matrix matmul puts the filter on the
    MXU instead (measured: full SSIM fwd+bwd 6.5 ms -> ~1 ms at 640x480).
    f32 precision is required: the default bf16 TPU matmul visibly skews
    the E[x^2] - mu^2 variance terms."""
    _, H, W = imgs.shape
    k = k1.shape[0]
    hi = jax.lax.Precision.HIGH
    Bv = _band_matrix(H - k + 1, H, k1)                     # (H', H)
    Bw = _band_matrix(W - k + 1, W, k1)                     # (W', W)
    t = jnp.einsum("oh,bhw->bow", Bv, imgs, precision=hi)   # (B, H', W)
    return jnp.einsum("bow,pw->bop", t, Bw, precision=hi)   # (B, H', W')


def _filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable Gaussian filter of an (H, W, C) image, VALID padding."""
    k1 = kernel[:, 0]
    k1 = k1 / jnp.sum(k1)
    out = _filter2d_batch(jnp.moveaxis(img, -1, 0), k1)
    return jnp.moveaxis(out, 0, -1)


def ssim(a: jax.Array, b: jax.Array, *, size: int = 11, sigma: float = 1.5,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """Mean SSIM over an (H, W, C) pair in [0, 1]."""
    x = jnp.moveaxis(a, -1, 0)                     # (C, H, W)
    y = jnp.moveaxis(b, -1, 0)
    k1 = gaussian_window(size, sigma)[:, 0]
    k1 = k1 / jnp.sum(k1)
    # one batched banded-matmul pass filters all five statistic maps
    stack = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
    f = _filter2d_batch(stack, k1)
    C = x.shape[0]
    mu_a, mu_b = f[:C], f[C:2 * C]
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = f[2 * C:3 * C] - mu_aa
    sig_b = f[3 * C:4 * C] - mu_bb
    sig_ab = f[4 * C:] - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s)


def rgb_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None,
             ssim_lambda: float = 0.2) -> jax.Array:
    """(1 - λ)·L1 + λ·DSSIM — the splatfacto main loss."""
    if mask is not None:
        pred = pred * mask
        gt = gt * mask
    l1 = jnp.mean(jnp.abs(pred - gt))
    # splatfacto uses simloss = 1 - ssim (NOT the (1-ssim)/2 DSSIM form);
    # match it exactly so ssim_lambda=0.2 carries the reference's weight.
    simloss = 1.0 - ssim(pred, gt)
    return (1 - ssim_lambda) * l1 + ssim_lambda * simloss


# -------------------------------------------------------------- depth ------

def depth_l1(pred, gt, mask=None):
    return _masked_mean(jnp.abs(pred - gt), mask)


def depth_mse(pred, gt, mask=None):
    return _masked_mean((pred - gt) ** 2, mask)


def depth_logl1(pred, gt, mask=None):
    return _masked_mean(jnp.log1p(jnp.abs(pred - gt)), mask)


def depth_huberl1(pred, gt, mask=None, delta: float = 0.2):
    err = jnp.abs(pred - gt)
    loss = jnp.where(err < delta, 0.5 * err * err / delta, err - 0.5 * delta)
    return _masked_mean(loss, mask)


def edge_weight(rgb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """exp(-mean|∇rgb|) along x and y; shapes (H, W-1), (H-1, W)."""
    gx = jnp.mean(jnp.abs(rgb[:, 1:] - rgb[:, :-1]), axis=-1)
    gy = jnp.mean(jnp.abs(rgb[1:, :] - rgb[:-1, :]), axis=-1)
    return jnp.exp(-gx), jnp.exp(-gy)


def depth_edge_aware_logl1(pred, gt, rgb, mask=None):
    """LogL1 weighted by image-gradient edge awareness
    (reference losses.py EdgeAwareLogL1)."""
    logl1 = jnp.log1p(jnp.abs(pred - gt))
    wx, wy = edge_weight(rgb)
    lx = logl1[:, 1:] * wx
    ly = logl1[1:, :] * wy
    mx = None if mask is None else mask[:, 1:] * mask[:, :-1]
    my = None if mask is None else mask[1:, :] * mask[:-1, :]
    return 0.5 * (_masked_mean(lx, mx) + _masked_mean(ly, my))


def tv_loss(img: jax.Array, mask=None) -> jax.Array:
    """Total variation over (H, W) or (H, W, C)."""
    gx = jnp.abs(img[:, 1:] - img[:, :-1])
    gy = jnp.abs(img[1:, :] - img[:-1, :])
    if img.ndim == 3:
        gx, gy = jnp.mean(gx, -1), jnp.mean(gy, -1)
    mx = None if mask is None else mask[:, 1:] * mask[:, :-1]
    my = None if mask is None else mask[1:, :] * mask[:-1, :]
    return _masked_mean(gx, mx) + _masked_mean(gy, my)


def edge_aware_tv(img: jax.Array, rgb: jax.Array, mask=None) -> jax.Array:
    gx = jnp.abs(img[:, 1:] - img[:, :-1])
    gy = jnp.abs(img[1:, :] - img[:-1, :])
    if img.ndim == 3:
        gx, gy = jnp.mean(gx, -1), jnp.mean(gy, -1)
    wx, wy = edge_weight(rgb)
    mx = None if mask is None else mask[:, 1:] * mask[:, :-1]
    my = None if mask is None else mask[1:, :] * mask[:-1, :]
    return _masked_mean(gx * wx, mx) + _masked_mean(gy * wy, my)


DEPTH_LOSSES = {
    "MSE": depth_mse,
    "L1": depth_l1,
    "LogL1": depth_logl1,
    "HuberL1": depth_huberl1,
}


# ------------------------------------------------------------- normal ------

def normal_l1(pred: jax.Array, gt: jax.Array, mask=None) -> jax.Array:
    return _masked_mean(jnp.mean(jnp.abs(pred - gt), axis=-1), mask)


def normal_cosine(pred: jax.Array, gt: jax.Array, mask=None, eps=1e-8) -> jax.Array:
    pn = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + eps)
    gn = gt / (jnp.linalg.norm(gt, axis=-1, keepdims=True) + eps)
    return _masked_mean(1.0 - jnp.sum(pn * gn, axis=-1), mask)


def normals_from_depth(depth: jax.Array, camera) -> jax.Array:
    """(H, W) depth -> (H, W, 3) camera-frame pseudo-normals via cross
    products of backprojected neighbor differences
    (reference dn_splatter/utils/normal_utils.py:7-46)."""
    from fusionsense_tpu.core.cameras import backproject_depth

    H, W = depth.shape
    pts = backproject_depth(depth, camera).reshape(H, W, 3)
    dx = pts[:, 2:, :] - pts[:, :-2, :]
    dy = pts[2:, :, :] - pts[:-2, :, :]
    dx = jnp.pad(dx, ((0, 0), (1, 1), (0, 0)), mode="edge")
    dy = jnp.pad(dy, ((1, 1), (0, 0), (0, 0)), mode="edge")
    n = jnp.cross(dx, dy)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
    # orient toward the camera
    view = camera.origin - pts
    flip = jnp.sum(n * view, axis=-1, keepdims=True) < 0
    return jnp.where(flip, -n, n)


# ------------------------------------------------------- regularizers ------

def flatness_loss(log_scales: jax.Array, alive: jax.Array) -> jax.Array:
    """Encourage 2D (disc) Gaussians: mean over alive of min(exp(scales))
    (reference dn_model.py:817-819)."""
    min_scale = jnp.min(jnp.exp(log_scales), axis=-1)
    return jnp.sum(jnp.where(alive, min_scale, 0.0)) / jnp.maximum(
        jnp.sum(alive), 1)


def opacity_entropy_loss(logit_opacities: jax.Array, alive: jax.Array) -> jax.Array:
    """Sparse-opacity binary entropy (reference dn_model.py:821-836)."""
    o = jax.nn.sigmoid(logit_opacities)
    o = jnp.clip(o, 1e-6, 1 - 1e-6)
    ent = -(o * jnp.log(o) + (1 - o) * jnp.log(1 - o))
    return jnp.sum(jnp.where(alive, ent, 0.0)) / jnp.maximum(jnp.sum(alive), 1)


def touch_normal_loss(normals: jax.Array, target_normals: jax.Array,
                      frozen: jax.Array) -> jax.Array:
    """MSE between current Gaussian normals and tactile patch normals on the
    anchored set (reference dn_model.py:893-904, λ=1)."""
    err = jnp.sum((normals - target_normals) ** 2, axis=-1)
    return jnp.sum(jnp.where(frozen, err, 0.0)) / jnp.maximum(jnp.sum(frozen), 1)
