"""DSINE: decoder + rotation-based neighborhood refinement (flax/JAX).

Behavioral contract: reference dn_splatter/scripts/dsine/dsine.py (Decoder
:20-69, DSINE :72-300) and submodules.py (UpSampleGN with weight-
standardized convs :112-178, ConvGRU :42-57, RayReLU :59-84, convex
upsampling :205-218, prediction heads :231-238). All tensors NHWC; the
refinement's per-neighbor axis-angle rotation of neighbor normals is the
same closed-form Rodrigues construction, vectorized over the 5x5 patch.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.priors.dsine.efficientnet import (
    EffNetConfig, EfficientNetEncoder,
)


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _bilinear_ac_false(x, h, w):
    """torch F.interpolate(mode=bilinear, align_corners=False) over (H,W,C)."""
    return jax.image.resize(x, (h, w, x.shape[-1]), method="bilinear")


class ConvWS(nn.Module):
    """Weight-standardized 3x3 conv (submodules.py Conv2d_WS:112-149).

    Standardization follows torch: mean over (in, kh, kw); std is the
    UNBIASED std over the flattened per-output-channel weights + 1e-5.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        flat = k.reshape(-1, self.features)
        mean = jnp.mean(flat, axis=0)
        std = jnp.std(flat, axis=0, ddof=1) + 1e-5
        kn = (k - mean) / std
        y = jax.lax.conv_general_dilated(
            x[None], kn, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return y + b


class UpSampleGN(nn.Module):
    """Bilinear-upsample x to skip's size, concat, two WS-conv+GN+LeakyReLU."""
    features: int

    @nn.compact
    def __call__(self, x, skip):
        up = _bilinear_ac_false(x, *skip.shape[:2])
        y = jnp.concatenate([up, skip], axis=-1)
        # flax GroupNorm treats axis 0 as batch — feed (1, H, W, C) so the
        # per-group statistics span the whole image like torch's
        gn0 = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn0")
        gn1 = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn1")
        y = ConvWS(self.features, name="conv0")(y)
        y = nn.leaky_relu(gn0(y[None])[0])
        y = ConvWS(self.features, name="conv1")(y)
        return nn.leaky_relu(gn1(y[None])[0])


class PredictionHead(nn.Module):
    """conv3x3 -> relu -> conv1x1 -> relu -> conv1x1 (submodules.py:231)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.hidden, (3, 3), padding=[(1, 1)] * 2,
                            name="conv0")(x))
        y = nn.relu(nn.Conv(self.hidden, (1, 1), name="conv1")(y))
        return nn.Conv(self.out, (1, 1), name="conv2")(y)


class ConvGRU(nn.Module):
    hidden: int
    ks: int = 5

    @nn.compact
    def __call__(self, h, x):
        p = [( (self.ks - 1) // 2, (self.ks - 1) // 2 )] * 2
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (self.ks, self.ks),
                                   padding=p, name="convz")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (self.ks, self.ks),
                                   padding=p, name="convr")(hx))
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = jnp.tanh(nn.Conv(self.hidden, (self.ks, self.ks),
                             padding=p, name="convq")(rhx))
        return (1 - z) * h + z * q


def ray_relu(pred_norm, ray, eps=1e-2):
    """Clamp the normal's component along the per-pixel ray to >= eps
    (submodules.py RayReLU:59-84: new_cos = max(cos, eps))."""
    cos = jnp.sum(pred_norm * ray, axis=-1, keepdims=True)
    return _normalize(pred_norm + ray * (jnp.maximum(cos, eps) - cos))


def _unfold_patches(x, ps: int):
    """(H, W, C) -> (H, W, ps*ps, C) replicate-padded neighborhoods."""
    pad = (ps - 1) // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    H, W = x.shape[:2]
    rows = []
    for dy in range(ps):
        for dx in range(ps):
            rows.append(xp[dy:dy + H, dx:dx + W])
    return jnp.stack(rows, axis=2)


def convex_upsample(out, up_mask, k: int):
    """(H, W, C) low-res + (H, W, 9*k*k) mask -> (kH, kW, C)
    (submodules.py convex_upsampling:205-218, replicate-padded 3x3)."""
    H, W, C = out.shape
    m = up_mask.reshape(H, W, 9, k, k)
    m = jax.nn.softmax(m, axis=2)
    nb = _unfold_patches(out, 3)                     # (H, W, 9, C)
    up = jnp.einsum("hwnuv,hwnc->hwuvc", m, nb)      # (H, W, k, k, C)
    return up.transpose(0, 2, 1, 3, 4).reshape(H * k, W * k, C)


def axis_angle_to_matrix(axis_angle):
    """(..., 3) axis*angle -> (..., 3, 3) (rotations.py, PyTorch3D form)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angle * 0.5
    small = jnp.abs(angle) < 1e-6
    sin_over = jnp.where(small, 0.5 - angle * angle / 48.0,
                         jnp.sin(half) / jnp.where(small, 1.0, angle))
    quat = jnp.concatenate([jnp.cos(half), axis_angle * sin_over], axis=-1)
    r, i, j, k = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j),
    ], axis=-1)
    return o.reshape(o.shape[:-1] + (3, 3))


@dataclasses.dataclass(frozen=True)
class DSINEConfig:
    effnet: EffNetConfig = EffNetConfig()
    nf: int = 2048
    feature_dim: int = 64
    hidden_dim: int = 64
    ps: int = 5
    num_iter: int = 5
    downsample: int = 8


def tiny_dsine() -> DSINEConfig:
    from fusionsense_tpu.priors.dsine.efficientnet import tiny_effnet

    return DSINEConfig(effnet=tiny_effnet(), nf=32, feature_dim=8,
                       hidden_dim=8, num_iter=2)


def _uv_grid(K, H, W, orig_H, orig_W, normalized=False):
    """Per-pixel (u, v) camera-plane coords at a downsampled resolution
    (dsine.py get_ray:127-142; pixel centers at +0.5... +1.0 because the
    predictor adds 0.5 to the principal point, dsine.py:272-273)."""
    fu = K[0, 0] * (W / orig_W)
    cu = K[0, 2] * (W / orig_W)
    fv = K[1, 1] * (H / orig_H)
    cv = K[1, 2] * (H / orig_H)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - cu) / fu
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - cv) / fv
    u = jnp.broadcast_to(xs[None, :], (H, W))
    v = jnp.broadcast_to(ys[:, None], (H, W))
    uv = jnp.stack([u, v], axis=-1)
    if not normalized:
        return uv
    ray = jnp.concatenate([uv, jnp.ones((H, W, 1))], axis=-1)
    return _normalize(ray)


class DSINE(nn.Module):
    """(H, W, 3) image (ImageNet-normalized) + (3, 3) intrinsics ->
    (H, W, 3) camera-space normals (final refinement iteration)."""
    cfg: DSINEConfig = DSINEConfig()

    @nn.compact
    def __call__(self, img, K):
        c = self.cfg
        H, W = img.shape[:2]
        feats = EfficientNetEncoder(c.effnet, name="encoder")(img)

        # the reference predictor shifts the principal point by +0.5
        K = jnp.asarray(K).at[0, 2].add(0.5).at[1, 2].add(0.5)
        uv32 = _uv_grid(K, H // 32, W // 32, H, W)
        uv16 = _uv_grid(K, H // 16, W // 16, H, W)
        uv8 = _uv_grid(K, H // 8, W // 8, H, W)
        ray8 = _uv_grid(K, H // 8, W // 8, H, W, normalized=True)

        # ---- decoder (dsine.py:50-69) ----
        nf = c.nf
        x_d0 = nn.Conv(nf, (1, 1), name="conv2")(
            jnp.concatenate([feats["head"], uv32], -1))
        x_d1 = UpSampleGN(nf // 2, name="up1")(
            x_d0, jnp.concatenate([feats["s16"], uv16], -1))
        x_feat = UpSampleGN(nf // 4, name="up2")(
            x_d1, jnp.concatenate([feats["s8"], uv8], -1))
        x_feat = jnp.concatenate([x_feat, uv8], -1)

        pred_norm = PredictionHead(128, 3, name="normal_head")(x_feat)
        pred_norm = ray_relu(_normalize(pred_norm), ray8)
        feat_map = PredictionHead(128, c.feature_dim, name="feature_head")(x_feat)
        h = PredictionHead(128, c.hidden_dim, name="hidden_head")(x_feat)
        feat_map = jnp.concatenate([feat_map, uv8], -1)

        gru = ConvGRU(c.hidden_dim, c.ps, name="gru")
        prob_head = PredictionHead(64, c.ps * c.ps, name="prob_head")
        xy_head = PredictionHead(64, c.ps * c.ps * 2, name="xy_head")
        angle_head = PredictionHead(64, c.ps * c.ps, name="angle_head")
        up_prob_head = PredictionHead(64, 9 * c.downsample ** 2,
                                      name="up_prob_head")

        # ---- NRN refinement (dsine.py refine:150-264) ----
        h8, w8 = pred_norm.shape[:2]
        fu = K[0, 0] * (w8 / W)
        cu = K[0, 2] * (w8 / W)
        fv = K[1, 1] * (h8 / H)
        cv = K[1, 2] * (h8 / H)
        pix = jnp.stack(jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32) + 0.5,
                                     jnp.arange(h8, dtype=jnp.float32) + 0.5,
                                     indexing="xy"), -1)        # (h, w, 2)
        nghbr_pix = _unfold_patches(pix, c.ps)                  # (h, w, n, 2)

        for _ in range(c.num_iter):
            h = gru(h, feat_map)
            hx = jnp.concatenate([h, uv8], -1)
            prob = jax.nn.sigmoid(prob_head(hx))                # (h, w, n)
            nghbr_n = _unfold_patches(jax.lax.stop_gradient(pred_norm), c.ps)
            xy = xy_head(hx)                                    # (h, w, 2n)
            n = c.ps * c.ps
            xys = jnp.stack([xy[..., :n], xy[..., n:]], -1)     # (h, w, n, 2)
            xys = _normalize(xys)
            ang = jax.nn.sigmoid(angle_head(hx)) * math.pi      # (h, w, n)

            du_fu = xys[..., 0] / fu
            dv_fv = xys[..., 1] / fv
            term_u = (nghbr_pix[..., 0] + xys[..., 0] - cu) / fu
            term_v = (nghbr_pix[..., 1] + xys[..., 1] - cv) / fv
            nx, ny, nz = (nghbr_n[..., 0], nghbr_n[..., 1], nghbr_n[..., 2])
            num = -(du_fu * nx + dv_fv * ny)
            den = term_u * nx + term_v * ny + nz
            den = jnp.where(jnp.abs(den) < 1e-8,
                            1e-8 * jnp.sign(den + 1e-30), den)
            dz = num / den
            axes = jnp.stack([du_fu + dz * term_u, dv_fv + dz * term_v, dz],
                             -1)
            axes = _normalize(axes)
            axes = jnp.where(jnp.isfinite(axes).all(-1, keepdims=True),
                             axes, 0.0)
            R = axis_angle_to_matrix(axes * ang[..., None])
            rot = jnp.einsum("hwnij,hwnj->hwni", R, nghbr_n)
            rot = _normalize(rot)
            rot = ray_relu(rot, ray8[:, :, None, :])
            pred_norm = _normalize(
                jnp.sum(prob[..., None] * rot, axis=2))

        up_mask = up_prob_head(jnp.concatenate([h, uv8], -1))
        up = convex_upsample(pred_norm, up_mask, c.downsample)
        return _normalize(up)
