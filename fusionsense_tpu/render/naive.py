"""Brute-force reference rasterizer: every pixel composites every Gaussian.

O(H*W*N) — test oracle only. The tiled rasterizer must match this (up to
tile-capacity truncation). Also serves as the "CPU rasterizer" config from
BASELINE.json's vanilla-3DGS entry.
"""
from __future__ import annotations

import jax.numpy as jnp

from fusionsense_tpu.core.cameras import Camera, pixel_centers
from fusionsense_tpu.core.sh import eval_sh
from fusionsense_tpu.core.transforms import normalize
from fusionsense_tpu.render.composite import ALPHA_MAX, ALPHA_MIN
from fusionsense_tpu.render.project import project_gaussians
from fusionsense_tpu.render.rasterize import (
    RasterizeConfig, expected_depth, gaussian_flat_normals,
)


def rasterize_naive(
    means, quats, scales, opacities, colors, camera: Camera,
    cfg: RasterizeConfig = RasterizeConfig(), *, normals=None, background=None,
):
    proj = project_gaussians(
        means, quats, scales, opacities, camera,
        near=cfg.near, far=cfg.far, eps2d=cfg.eps2d, antialiased=cfg.antialiased,
        radius_clip=cfg.radius_clip,
    )
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))

    cam_origin = camera.origin
    if colors.ndim == 3:
        viewdir = normalize(means - cam_origin)
        rgb_g = jnp.clip(eval_sh(colors, viewdir, cfg.sh_degree) + 0.5, 0.0, None)
    else:
        rgb_g = colors
    if normals is None:
        normals = gaussian_flat_normals(quats, scales, means, cam_origin)
    channels = jnp.concatenate([rgb_g, proj.depth[:, None], normals], -1)

    op = opacities * (proj.compensation if cfg.antialiased else 1.0)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    op = jnp.where(proj.valid[order], op[order], 0.0)
    chan = channels[order]

    pix = pixel_centers(camera.width, camera.height).reshape(-1, 2)  # (P, 2)
    d = pix[:, None, :] - mean2d[None, :, :]                         # (P, N, 2)
    power = -0.5 * (conic[None, :, 0] * d[..., 0] ** 2
                    + conic[None, :, 2] * d[..., 1] ** 2) \
        - conic[None, :, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(op[None, :] * jnp.exp(power), ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    log_t = jnp.log1p(-alpha)
    cum = jnp.cumsum(log_t, axis=-1)
    trans_excl = jnp.exp(cum - log_t)
    w = alpha * trans_excl                                           # (P, N)
    out = w @ chan                                                   # (P, C)
    acc = 1.0 - jnp.exp(cum[:, -1])

    H, W = camera.height, camera.width
    img = out.reshape(H, W, -1)
    alpha_map = acc.reshape(H, W)
    rgb = img[..., :3]
    if background is not None:
        rgb = rgb + (1.0 - alpha_map)[..., None] * background
    return dict(rgb=rgb, depth=expected_depth(img[..., 3], alpha_map),
                normal=img[..., 4:7], alpha=alpha_map)
