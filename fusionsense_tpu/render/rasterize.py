"""Top-level differentiable Gaussian rasterizer (project -> bin -> composite).

One call renders RGB + expected depth + world-space normal + alpha in a single
compositing pass — fusing the reference's two CUDA rasterizer invocations
(gsplat.rasterization at dn_splatter/dn_model.py:570-591 and the legacy
rasterize_gaussians normals pass at :618-656) into one TPU program.

Differentiable wrt means/quats/scales/opacities/colors/normals via XLA
autodiff; the `mean2d_tap` dummy input surfaces per-Gaussian screen-space
position gradients (take grad wrt it) for the densification schedule.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.core.sh import eval_sh
from fusionsense_tpu.core.transforms import normalize, quat_to_rotmat
from fusionsense_tpu.render.binning import bin_gaussians
from fusionsense_tpu.render.composite import (
    TileGrid,
    composite_tiles,
    pixel_features,
    tiles_to_image,
)
from fusionsense_tpu.render.project import alpha_coefficients, project_gaussians


@jax.custom_vjp
def _tile_select(table_n, aux):
    """(N, W) table -> (T, K, W) tile rows; masked slots 0.

    The backward runs as a GATHER from the gaussian side using the
    binning landing map (pair -> flat tile slot) instead of XLA's
    scatter-add transpose: TPU dynamic scatters cost ~2x gathers per row,
    and at K=2048 the tile arrays hold ~600k rows.
    """
    idx, mask, landing = aux
    return jnp.where(mask[..., None], table_n[idx], 0.0)


def _tile_select_fwd(table_n, aux):
    idx, mask, landing = aux
    out = jnp.where(mask[..., None], table_n[idx], 0.0)
    return out, (landing, table_n.shape)


def _tile_select_bwd(res, g):
    landing, (N, W) = res
    C = landing.shape[1]
    flat = g.reshape(-1, W)
    l = landing.reshape(-1)
    gp = flat[jnp.maximum(l, 0)] * (l >= 0)[:, None]
    return gp.reshape(N, C, W).sum(axis=1), None


_tile_select.defvjp(_tile_select_fwd, _tile_select_bwd)


@jax.custom_vjp
def _flat_select_scatter(table_n, aux):
    """(N, W) table -> (PB, W) flat pair rows; masked slots 0.

    Backward: ONE unsorted segment-sum (scatter-add) of the (PB, W) grad
    rows into (N, W) keyed by gauss_ids — PB rows instead of the landing
    path's N*C gather rows, and it frees flat_bin_gaussians from computing
    the landing map at all (a second full N*C sort + three N*C scans;
    measured 3.94 -> ~2.3 ms binning at bench scale, DESIGN.md §6 r5)."""
    gauss_ids, valid = aux
    return jnp.where(valid[..., None], table_n[gauss_ids], 0.0)


def _flat_select_scatter_fwd(table_n, aux):
    gauss_ids, valid = aux
    out = jnp.where(valid[..., None], table_n[gauss_ids], 0.0)
    return out, (gauss_ids, valid, table_n.shape[0])


def _flat_select_scatter_bwd(res, g):
    gauss_ids, valid, n = res
    g = jnp.where(valid[..., None], g, 0.0)
    ids = jnp.where(valid, gauss_ids, n)      # dead rows -> dropped segment
    return jax.ops.segment_sum(g, ids, num_segments=n + 1)[:n], None


_flat_select_scatter.defvjp(_flat_select_scatter_fwd,
                            _flat_select_scatter_bwd)


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer knobs (hashable -> usable as jit static arg)."""

    tile_size: int = 16
    tile_capacity: int = 512
    max_tiles_per_gaussian: int = 32
    tile_chunk: int = 64
    near: float = 0.01
    far: float = 1e10
    eps2d: float = 0.3
    antialiased: bool = False
    sh_degree: int = 3
    radius_clip: float = 0.0
    # compositing backend: "jax" (XLA cumsum formulation), "pallas" (dense
    # (T, K) streaming kernel with early termination), or "flat" (block-
    # aligned segmented pair layout — scales with the LIVE pair population
    # instead of T*K and has no per-tile capacity cliff; tile_capacity is
    # reinterpreted as the mean pair budget per tile)
    backend: str = "jax"
    pallas_chunk: int = 128
    # bf16 blend matmuls in the pallas kernel (alpha math stays f32)
    blend_bf16: bool = False
    # flat backend gradient transpose: "landing" = gather-from-gaussian-
    # side via the pair->slot landing map (round 3); "scatter" = one
    # segment-sum over the PB flat rows keyed by gauss_ids, skipping the
    # landing machinery (a second N*C sort + three N*C scans) entirely.
    # Measured on-chip at bench-profile scale (r5): landing 9.77 ms/step
    # vs scatter 10.90 — the TPU scatter-add costs more than the landing
    # sort it saves (segment_sum 3.3 ms vs sort+scans ~0.3 + gather 2.0),
    # so landing stays the default; scatter is kept for shapes where the
    # pair budget is far below N*C.
    flat_grad_transpose: str = "landing"


def expected_depth(depth_acc: jax.Array, alpha: jax.Array) -> jax.Array:
    """gsplat "ED" semantics (reference dn_model.py:560 render_mode=
    "RGB+ED" + gsplat's expected-depth normalization): the accumulated
    depth divided by the accumulation — depth conditioned on the ray
    hitting the surface. Unnormalized depth is biased toward the camera
    by exactly (1 - alpha), which poisons TSDF fusion and depth losses
    whenever alpha doesn't saturate (binary opacities cap per-splat
    alpha at sigmoid(1) = 0.731). Empty pixels report 0 — the reference
    substitutes max depth there (dn_model.py:610-613) purely for its
    loss masking; consumers here mask by alpha / sensor validity.

    The denominator floor is 1e-3 (not epsilon): the depth-loss gradient
    through the quotient scales like depth_acc/alpha^2, and at a pixel
    with valid sensor depth but near-zero accumulation an epsilon floor
    produces a huge-but-finite value that sails past the trainers'
    non-finite step guard (ADVICE r4). Above the floor the value is
    exactly gsplat's; below it depth scales DOWN toward 0 (by
    alpha/1e-3), so a sub-floor-alpha pixel reports a too-small depth
    rather than a huge one. Consumers that need clean depth gate by
    alpha themselves (mesh_export._render_depths uses alpha > 0.5); the
    eval battery does NOT alpha-gate, so thin-coverage in-mask pixels
    show up as honestly-large depth errors instead of optimistic
    normalized values."""
    return jnp.where(alpha > 0, depth_acc / jnp.maximum(alpha, 1e-3), 0.0)


class RenderOutputs(NamedTuple):
    rgb: jax.Array        # (H, W, 3)
    depth: jax.Array      # (H, W) expected depth (alpha-normalized)
    normal: jax.Array     # (H, W, 3) composited world-space normal
    alpha: jax.Array      # (H, W) accumulation
    mean2d: jax.Array     # (N, 2) screen positions (aux, non-diff path)
    radius: jax.Array     # (N,) screen radii (0 = culled)
    overflow: jax.Array   # scalar: tile-capacity overflow pair count
    truncated: jax.Array  # scalar: per-Gaussian tile-cover truncation count
    trunc_by_win: jax.Array  # (5,) counterfactual truncation at windows 1..5
    # flat backend only: block-aligned live pair total (budget policy input)
    pairs_used: int = 0


def gaussian_flat_normals(
    quats: jax.Array, scales: jax.Array, means: jax.Array, cam_origin: jax.Array
) -> jax.Array:
    """Per-Gaussian normal = rotation axis of the smallest scale, camera-facing.

    Mirrors the reference's convention (dn_splatter/dn_model.py:618-643:
    normals from min-scale axis, flipped toward the view direction).
    """
    R = quat_to_rotmat(quats)                       # (N, 3, 3) columns = axes
    min_axis = jnp.argmin(scales, axis=-1)          # (N,)
    onehot = jax.nn.one_hot(min_axis, 3, dtype=quats.dtype)  # (N, 3)
    n = jnp.einsum("nij,nj->ni", R, onehot)
    viewdir = normalize(means - cam_origin)
    flip = jnp.sum(n * viewdir, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def rasterize(
    means: jax.Array,          # (N, 3)
    quats: jax.Array,          # (N, 4) wxyz
    scales: jax.Array,         # (N, 3) std-devs (activated, not log)
    opacities: jax.Array,      # (N,) in (0, 1) (activated)
    colors: jax.Array,         # (N, 3) RGB or (N, K, 3) SH coefficients
    camera: Camera,
    cfg: RasterizeConfig = RasterizeConfig(),
    *,
    normals: Optional[jax.Array] = None,   # (N, 3); default: min-scale axis
    background: Optional[jax.Array] = None,  # (3,)
    mean2d_tap: Optional[jax.Array] = None,  # (N, 2) zeros; signed grad tap
    absgrad_tap: Optional[jax.Array] = None,  # (N, 2) zeros; |grad| tap
    #   (pallas backend only: its custom-vjp gradient accumulates the
    #   per-tile ABSOLUTE screen-position gradients — gsplat's absgrad)
    bins=None,   # flat backend: precomputed FlatBins (trainer bin cache —
    #   the binning stage is pure integer selection machinery, so a
    #   trainer may reuse a few-steps-stale layout; compositing always
    #   uses CURRENT projected values via the fresh table gather)
) -> RenderOutputs:
    N = means.shape[0]
    grid = TileGrid(width=camera.width, height=camera.height, tile_size=cfg.tile_size)

    if N == 0:  # static check: empty scene renders pure background
        H, W = camera.height, camera.width
        zero = jnp.zeros((H, W))
        rgb = jnp.zeros((H, W, 3))
        if background is not None:
            rgb = rgb + background
        return RenderOutputs(
            rgb=rgb, depth=zero, normal=jnp.zeros((H, W, 3)), alpha=zero,
            mean2d=jnp.zeros((0, 2)), radius=jnp.zeros((0,)),
            overflow=jnp.zeros((), jnp.int32), truncated=jnp.zeros((), jnp.int32),
            trunc_by_win=jnp.zeros((5,), jnp.int32),
        )

    proj = project_gaussians(
        means, quats, scales, opacities, camera,
        near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
        antialiased=cfg.antialiased, radius_clip=cfg.radius_clip,
    )
    mean2d = proj.mean2d
    if mean2d_tap is not None:
        mean2d = mean2d + mean2d_tap

    op = opacities * (proj.compensation if cfg.antialiased else 1.0)

    # view-dependent color
    cam_origin = camera.origin
    if colors.ndim == 3:
        viewdir = normalize(means - cam_origin)
        rgb_g = jnp.clip(eval_sh(colors, viewdir, cfg.sh_degree) + 0.5, 0.0, None)
    else:
        rgb_g = colors

    if normals is None:
        normals = gaussian_flat_normals(quats, scales, means, cam_origin)

    channels = jnp.concatenate(
        [rgb_g, proj.depth[:, None], normals], axis=-1
    )  # (N, 7)

    if cfg.backend == "flat":
        from fusionsense_tpu.render.binning import (
            auto_expand_budget, flat_bin_gaussians)
        from fusionsense_tpu.render.pallas_flat import flat_composite

        B = cfg.pallas_chunk
        # pair budget: tile_capacity is reinterpreted as MEAN pairs/tile, so
        # the trainer's auto-capacity policy (overflow-telemetry bump)
        # carries over unchanged from the dense layout
        PB = -(-cfg.tile_capacity * grid.num_tiles // B) * B
        if bins is not None:
            fb = bins
        else:
            fb = flat_bin_gaussians(
                jax.lax.stop_gradient(proj.mean2d),
                jax.lax.stop_gradient(proj.radius),
                jax.lax.stop_gradient(proj.depth),
                width=camera.width, height=camera.height,
                tile_size=cfg.tile_size, pair_budget=PB,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian, block=B,
                compute_landing=cfg.flat_grad_transpose != "scatter",
                expand_budget=auto_expand_budget(
                    PB, N, cfg.max_tiles_per_gaussian, B),
            )
        # the gradient transpose must match what the layout provides
        use_scatter = (cfg.flat_grad_transpose == "scatter"
                       or fb.landing is None)
        nchan = channels.shape[-1]
        pad_c = (-nchan) % 8
        log_op = jnp.where(proj.valid,
                           jnp.log(jnp.maximum(op, 1e-12)), -1e10)
        if absgrad_tap is None:
            absgrad_tap = jnp.zeros((N, 2))
        cols = [mean2d[:, 0:1], mean2d[:, 1:2], proj.conic[:, 0:1],
                proj.conic[:, 1:2], proj.conic[:, 2:3], log_op[:, None],
                absgrad_tap, channels]
        if pad_c:
            cols.append(jnp.zeros((N, pad_c)))
        table_n = jnp.concatenate(cols, axis=-1)          # (N, 8 + Cpad)
        dead = jnp.zeros((table_n.shape[-1],)).at[5].set(-1e10)
        if use_scatter:
            sel = _flat_select_scatter(table_n, (fb.gauss_ids, fb.valid))
        else:
            sel = _tile_select(table_n, (fb.gauss_ids, fb.valid, fb.landing))
        tab_flat = sel + jnp.where(fb.valid[..., None], 0.0, dead)
        out_tiled, alpha_tiled = flat_composite(
            tab_flat, fb.blk_tile, fb.blk_first, fb.blk_count,
            fb.blk_tile, grid.num_tiles, grid.tiles_x, cfg.tile_size,
            B, cfg.blend_bf16)
        out_tiled = out_tiled[..., :nchan]
        img = tiles_to_image(out_tiled, grid)
        alpha = tiles_to_image(alpha_tiled, grid)
        rgb = img[..., 0:3]
        depth = expected_depth(img[..., 3], alpha)
        normal = img[..., 4:7]
        if background is not None:
            rgb = rgb + (1.0 - alpha)[..., None] * background
        return RenderOutputs(
            rgb=rgb, depth=depth, normal=normal, alpha=alpha,
            mean2d=proj.mean2d, radius=proj.radius,
            overflow=fb.overflow, truncated=fb.truncated,
            trunc_by_win=fb.trunc_by_win, pairs_used=fb.used,
        )

    # binning runs on non-differentiable integer machinery
    bins = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        jax.lax.stop_gradient(proj.radius),
        jax.lax.stop_gradient(proj.depth),
        width=camera.width, height=camera.height,
        tile_size=cfg.tile_size, tile_capacity=cfg.tile_capacity,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
    )

    # gather per-tile data; empty slots (-1) -> index 0 but payload forced dead
    idx = jnp.maximum(bins.indices, 0)

    if cfg.backend == "pallas":
        from fusionsense_tpu.render.pallas_composite2 import pallas_composite2

        nchan = channels.shape[-1]
        pad_c = (-nchan) % 8
        counts = jnp.sum(bins.mask, axis=-1).astype(jnp.int32)
        log_op = jnp.where(proj.valid,
                           jnp.log(jnp.maximum(op, 1e-12)), -1e10)
        if absgrad_tap is None:
            absgrad_tap = jnp.zeros((N, 2))
        # ONE fused per-gaussian table [mx, my, ca, cb, cc, log_op, abs_tap,
        # abs_tap, chan...] so the tile stage is ONE (T, K, 8+C) gather and
        # its backward ONE scatter-add (TPU gathers are per-row bound; three
        # narrow gathers cost ~3x one wide one)
        cols = [mean2d[:, 0:1], mean2d[:, 1:2], proj.conic[:, 0:1],
                proj.conic[:, 1:2], proj.conic[:, 2:3], log_op[:, None],
                absgrad_tap, channels]
        if pad_c:
            cols.append(jnp.zeros((N, pad_c)))
        table_n = jnp.concatenate(cols, axis=-1)          # (N, 8 + Cpad)
        dead = jnp.zeros((table_n.shape[-1],)).at[5].set(-1e10)
        sel = _tile_select(table_n, (idx, bins.mask, bins.landing))
        tile_table = sel + jnp.where(bins.mask[..., None], 0.0, dead)
        out_tiled, alpha_tiled = pallas_composite2(
            tile_table, counts,
            jnp.arange(grid.num_tiles, dtype=jnp.int32),
            grid.tiles_x, cfg.tile_size, cfg.pallas_chunk, cfg.blend_bf16)
        out_tiled = out_tiled[..., :nchan]
    else:
        tile_chan = jnp.where(bins.mask[..., None], channels[idx], 0.0)
        coeff = alpha_coefficients(mean2d, proj.conic, op, proj.valid)
        tile_coeff = jnp.where(
            bins.mask[..., None], coeff[idx],
            jnp.zeros_like(coeff[idx]).at[..., 5].set(-1e10),
        )
        feats = pixel_features(grid)
        out_tiled, alpha_tiled = composite_tiles(
            feats, tile_coeff, tile_chan, tile_chunk=cfg.tile_chunk
        )

    img = tiles_to_image(out_tiled, grid)                     # (H, W, 7)
    alpha = tiles_to_image(alpha_tiled, grid)                 # (H, W)

    rgb = img[..., 0:3]
    depth = expected_depth(img[..., 3], alpha)
    normal = img[..., 4:7]
    if background is not None:
        rgb = rgb + (1.0 - alpha)[..., None] * background

    return RenderOutputs(
        rgb=rgb, depth=depth, normal=normal, alpha=alpha,
        mean2d=proj.mean2d, radius=proj.radius,
        overflow=bins.overflow, truncated=bins.truncated,
        trunc_by_win=bins.trunc_by_win,
    )
