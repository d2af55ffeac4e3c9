"""Multi-chip SPMD training step: data-parallel cameras x tile-parallel
rasterization x depth-sliced Gaussian shards under shard_map.

Design (SURVEY.md §5, §7.1, §7.3 hard-part 5):
- "tile": the per-tile compositing — the FLOPs-dominant stage — shards
  along image tiles; the composited tile block all_gathers over ICI to
  form the full image for the windowed losses (SSIM crosses tile borders).
- "gauss": alpha compositing does not commute across arbitrary Gaussian
  shards, but it decomposes EXACTLY across a per-camera depth partition:
  shard g masks to its log-depth slice, and slices merge front-to-back
  with out = sum_g T_{<g} out_g, log T = sum_g log T_g. No resharding of
  the (replicated) store; each shard contributes its own per-tile
  capacity, so effective capacity is G x K.
- "data": cameras; parameter gradients psum over the shard axes and pmean
  over data — the SPMD equivalent of the reference's DDP all-reduce
  (reference dn_splatter/dn_pipeline.py:161-167), but over tiles and
  depth slices as well as batch. Optional ZeRO-1: gradients
  reduce-scatter over `data` along the Gaussian-slot axis, Adam moments
  live sharded, fresh params all_gather back.

Projection/binning stay replicated: they are O(N) vector math and a sort,
dwarfed by the O(T*P*K) compositing that does shard.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fusionsense_tpu.config import ExperimentConfig
from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.core.sh import eval_sh
from fusionsense_tpu.core.transforms import normalize
from fusionsense_tpu.gaussians.adc import accumulate_stats
from fusionsense_tpu.gaussians.store import GaussianState, activated
from fusionsense_tpu.render.binning import bin_gaussians
from fusionsense_tpu.render.composite import (
    TileGrid, composite_tiles, pixel_features, tiles_to_image,
)
from fusionsense_tpu.core.transforms import apply_se3_delta
from fusionsense_tpu.render.project import alpha_coefficients, project_gaussians
from fusionsense_tpu.render.rasterize import RenderOutputs, gaussian_flat_normals


from fusionsense_tpu.train import losses as L
from fusionsense_tpu.train.optim import DEFAULT_GROUPS, adam_step
from fusionsense_tpu.train.trainer import TrainData, loss_terms, sh_band_mask


@jax.custom_vjp
def _tile_select_local(table_n, aux):
    """(N, W) table -> (T_loc, K, W) rows of THIS device's tile block.

    Same backward-as-gather trick as rasterize._tile_select, restricted to
    the local block: landing entries outside [base, base + T_loc*K) gather
    zero here and are produced by the owning shard instead (the step_fn
    psums parameter grads over the tile axis, which sums the per-shard
    contributions back into the full scatter)."""
    idx_loc, mask_loc, landing, base = aux
    return jnp.where(mask_loc[..., None], table_n[idx_loc], 0.0)


def _tile_select_local_fwd(table_n, aux):
    idx_loc, mask_loc, landing, base = aux
    out = jnp.where(mask_loc[..., None], table_n[idx_loc], 0.0)
    return out, (landing, base, table_n.shape, mask_loc.shape)


def _tile_select_local_bwd(res, g):
    landing, base, (N, W), (T_loc, K) = res
    flat = g.reshape(-1, W)
    l = landing.reshape(-1) - base
    ok = (l >= 0) & (l < T_loc * K)
    gp = flat[jnp.where(ok, l, 0)] * ok[:, None]
    C = landing.shape[1]
    return gp.reshape(N, C, W).sum(axis=1), None


_tile_select_local.defvjp(_tile_select_local_fwd, _tile_select_local_bwd)


def _render_local_tiles(gaussians: GaussianState, camera: Camera, cam_idx,
                        cfg: ExperimentConfig, tap, step, tile_axis: str,
                        gauss_axis: str = "gauss", n_gauss: int = 1,
                        cam_delta=None, render_n=None, abs_tap=None):
    """Rasterize only this device's tile block — restricted to this
    device's depth slice of the Gaussians when n_gauss > 1. Returns
    (local_tiles (T_loc, P, C+1 last=alpha), proj aux).

    render_n: static alive-first prefix length (same contract as
    compute_losses — the trainer keeps alive slots compacted to the
    front, so projection/binning/compositing only touch the prefix)."""
    mc = cfg.model
    rcfg = mc.rasterize
    means, quats, scales, op, colors = activated(gaussians)
    colors = colors * sh_band_mask(mc.sh_degree, step,
                                   mc.sh_degree_interval)[None, :, None]
    if render_n is not None and render_n < gaussians.capacity:
        means, quats, scales, op, colors = (
            means[:render_n], quats[:render_n], scales[:render_n],
            op[:render_n], colors[:render_n])
        tap = tap[:render_n]
        if abs_tap is not None:
            abs_tap = abs_tap[:render_n]
    if abs_tap is None:
        abs_tap = jnp.zeros((means.shape[0], 2))
    cam_i = camera.index(cam_idx)
    if cam_delta is not None:
        # the reference camera optimizer applied per forward
        # (dn_model.py:488 camera_optimizer.apply_to_camera)
        cam_i = cam_i.replace(
            viewmat=apply_se3_delta(cam_i.viewmat, cam_delta))
    grid = TileGrid(width=camera.width, height=camera.height,
                    tile_size=rcfg.tile_size)
    n_shards = jax.lax.axis_size(tile_axis)
    me = jax.lax.axis_index(tile_axis)
    T = grid.num_tiles
    T_pad = -(-T // n_shards) * n_shards
    T_loc = T_pad // n_shards

    proj = project_gaussians(means, quats, scales, op, cam_i,
                             near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d,
                             antialiased=rcfg.antialiased)
    valid = proj.valid
    if n_gauss > 1:
        # this shard's per-camera log-depth slice: front-to-back order across
        # shards is exact, so compositing decomposes as out = sum T_{<g} out_g
        gme = jax.lax.axis_index(gauss_axis)
        big = jnp.float32(3.4e38)
        logd = jnp.log(jnp.maximum(proj.depth, 1e-12))
        lo = jnp.min(jnp.where(valid, logd, big))
        hi = jnp.max(jnp.where(valid, logd, -big))
        span = jnp.maximum(hi - lo, 1e-9)
        f0 = lo + span * gme.astype(jnp.float32) / n_gauss
        f1 = lo + span * (gme + 1).astype(jnp.float32) / n_gauss
        in_slice = (logd >= f0) & ((logd < f1) | (gme == n_gauss - 1))
        valid = valid & in_slice
    mean2d = proj.mean2d + tap
    opc = op * (proj.compensation if rcfg.antialiased else 1.0)
    coeff = alpha_coefficients(mean2d, proj.conic, opc, valid)

    viewdir = normalize(means - cam_i.origin)
    rgb_g = jnp.clip(eval_sh(colors, viewdir, mc.sh_degree) + 0.5, 0.0, None)
    normals_g = gaussian_flat_normals(quats, scales, means, cam_i.origin)
    channels = jnp.concatenate([rgb_g, proj.depth[:, None], normals_g], -1)

    if rcfg.backend == "flat":
        # per-shard flat segmented layout over the LOCAL tile block: the
        # landing map is local (-1 for other shards' pairs), so the
        # parameter-grad psum over the tile axis reassembles the transpose
        from fusionsense_tpu.render.binning import flat_bin_gaussians
        from fusionsense_tpu.render.pallas_flat import flat_composite
        from fusionsense_tpu.render.rasterize import _tile_select

        B = rcfg.pallas_chunk
        PB = -(-rcfg.tile_capacity * T_loc // B) * B
        fb = flat_bin_gaussians(
            jax.lax.stop_gradient(proj.mean2d),
            jax.lax.stop_gradient(jnp.where(valid, proj.radius, 0.0)),
            jax.lax.stop_gradient(proj.depth),
            width=camera.width, height=camera.height,
            tile_size=rcfg.tile_size, pair_budget=PB,
            max_tiles_per_gaussian=rcfg.max_tiles_per_gaussian, block=B,
            tile_lo=me * T_loc, num_tiles_local=T_loc)
        nchan = channels.shape[-1]
        pad_c = (-nchan) % 8
        log_op = jnp.where(valid, jnp.log(jnp.maximum(opc, 1e-12)), -1e10)
        cols = [mean2d[:, 0:1], mean2d[:, 1:2], proj.conic[:, 0:1],
                proj.conic[:, 1:2], proj.conic[:, 2:3], log_op[:, None],
                abs_tap, channels]
        if pad_c:
            cols.append(jnp.zeros((mean2d.shape[0], pad_c)))
        table_n = jnp.concatenate(cols, axis=-1)
        dead = jnp.zeros((table_n.shape[-1],)).at[5].set(-1e10)
        sel = _tile_select(table_n, (fb.gauss_ids, fb.valid, fb.landing))
        tab_flat = sel + jnp.where(fb.valid[..., None], 0.0, dead)
        out_loc, alpha_loc = flat_composite(
            tab_flat, fb.blk_tile, fb.blk_first, fb.blk_count,
            fb.blk_tile + me * T_loc, T_loc, grid.tiles_x, rcfg.tile_size,
            B, rcfg.blend_bf16)
        out_loc = out_loc[..., :nchan]
        local = jnp.concatenate([out_loc, alpha_loc[..., None]], -1)
        aux = {"radius": proj.radius, "grid": grid, "T": T,
               "overflow": fb.overflow, "trunc_by_win": fb.trunc_by_win,
               "pairs_used": fb.used, "cam_i": cam_i,
               "normals_g": normals_g}
        return local, aux

    bins = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        jax.lax.stop_gradient(jnp.where(valid, proj.radius, 0.0)),
        jax.lax.stop_gradient(proj.depth),
        width=camera.width, height=camera.height, tile_size=rcfg.tile_size,
        tile_capacity=rcfg.tile_capacity,
        max_tiles_per_gaussian=rcfg.max_tiles_per_gaussian)

    def pad_tiles(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((T_pad - T,) + x.shape[1:], fill, x.dtype)], 0)

    idx = pad_tiles(jnp.maximum(bins.indices, 0))
    mask = pad_tiles(bins.mask, False)
    idx_loc = jax.lax.dynamic_slice_in_dim(idx, me * T_loc, T_loc, 0)
    mask_loc = jax.lax.dynamic_slice_in_dim(mask, me * T_loc, T_loc, 0)

    if rcfg.backend == "pallas":
        from fusionsense_tpu.render.pallas_composite2 import (
            pallas_composite2,
        )

        K = idx.shape[1]
        nchan = channels.shape[-1]
        pad_c = (-nchan) % 8
        log_op = jnp.where(valid, jnp.log(jnp.maximum(opc, 1e-12)), -1e10)
        cols = [mean2d[:, 0:1], mean2d[:, 1:2], proj.conic[:, 0:1],
                proj.conic[:, 1:2], proj.conic[:, 2:3], log_op[:, None],
                abs_tap, channels]
        if pad_c:
            cols.append(jnp.zeros((mean2d.shape[0], pad_c)))
        table_n = jnp.concatenate(cols, axis=-1)
        dead = jnp.zeros((table_n.shape[-1],)).at[5].set(-1e10)
        sel = _tile_select_local(
            table_n, (idx_loc, mask_loc, bins.landing, me * T_loc * K))
        tile_table = sel + jnp.where(mask_loc[..., None], 0.0, dead)
        counts_loc = jnp.sum(mask_loc, axis=-1).astype(jnp.int32)
        tile_ids = me * T_loc + jnp.arange(T_loc, dtype=jnp.int32)
        out_loc, alpha_loc = pallas_composite2(
            tile_table, counts_loc, tile_ids,
            grid.tiles_x, rcfg.tile_size, rcfg.pallas_chunk,
            rcfg.blend_bf16)
        out_loc = out_loc[..., :nchan]
    else:
        tile_coeff = jnp.where(
            mask_loc[..., None], coeff[idx_loc],
            jnp.zeros_like(coeff[idx_loc]).at[..., 5].set(-1e10))
        tile_chan = jnp.where(mask_loc[..., None], channels[idx_loc], 0.0)

        feats = pad_tiles(pixel_features(grid))
        feats_loc = jax.lax.dynamic_slice_in_dim(feats, me * T_loc, T_loc, 0)

        out_loc, alpha_loc = composite_tiles(
            feats_loc, tile_coeff, tile_chan, tile_chunk=rcfg.tile_chunk)
    local = jnp.concatenate([out_loc, alpha_loc[..., None]], -1)
    aux = {"radius": proj.radius, "grid": grid, "T": T,
           "overflow": bins.overflow, "trunc_by_win": bins.trunc_by_win,
           "pairs_used": jnp.zeros((), jnp.int32), "cam_i": cam_i,
           "normals_g": normals_g}
    return local, aux


def _sharded_losses(gaussians, camera, data: TrainData, cam_idx, step,
                    cfg: ExperimentConfig, tap, tile_axis: str,
                    gauss_axis: str = "gauss", n_gauss: int = 1,
                    cam_delta=None, render_n=None, abs_tap=None):
    local, aux = _render_local_tiles(gaussians, camera, cam_idx, cfg, tap,
                                     step, tile_axis,
                                     gauss_axis=gauss_axis, n_gauss=n_gauss,
                                     cam_delta=cam_delta, render_n=render_n,
                                     abs_tap=abs_tap)
    if n_gauss > 1:
        # merge depth slices front-to-back: shard g's tile block attenuated
        # by the product of the nearer shards' transmittances
        g_all = jax.lax.all_gather(local, gauss_axis, axis=0)  # (G,T,P,C+1)
        outs = g_all[..., :-1]
        alphas = jnp.minimum(g_all[..., -1], 1.0 - 1e-7)
        logt = jnp.log1p(-alphas)                              # (G, T, P)
        t_excl = jnp.exp(jnp.cumsum(logt, axis=0) - logt)
        out = jnp.sum(t_excl[..., None] * outs, axis=0)
        alpha = 1.0 - jnp.exp(jnp.sum(logt, axis=0))
        local = jnp.concatenate([out, alpha[..., None]], axis=-1)
    # gather full image over the tile axis (grads flow back as slices)
    full = jax.lax.all_gather(local, tile_axis, axis=0, tiled=True)
    grid: TileGrid = aux["grid"]
    img = tiles_to_image(full[: aux["T"]], grid)
    rgb, depth, normal, alpha = (img[..., :3], img[..., 3],
                                 img[..., 4:7], img[..., 7])
    # ED normalization AFTER the depth-slice merge: the slice identity
    # out = sum_g T_{<g} out_g holds for the RAW accumulated channels only
    from fusionsense_tpu.render.rasterize import expected_depth

    depth = expected_depth(depth, alpha)
    mc = cfg.model
    bg = jnp.asarray(mc.background, jnp.float32)
    rgb = rgb + (1.0 - alpha)[..., None] * bg

    out = RenderOutputs(rgb=rgb, depth=depth, normal=normal, alpha=alpha,
                        mean2d=jnp.zeros((1, 2)), radius=aux["radius"],
                        overflow=aux["overflow"],
                        truncated=jnp.zeros((), jnp.int32),
                        trunc_by_win=jnp.zeros((5,), jnp.int32))
    # the FULL DN-Splatter loss stack — identical objective to the
    # single-device path (train/trainer.py loss_terms), incl. masks, mono
    # depth, touch-normal anchoring, sparsity, SDF
    alive_r = (gaussians.alive[:render_n]
               if render_n is not None and render_n < gaussians.capacity
               else gaussians.alive)
    total, (parts, laux) = loss_terms(
        out, aux["normals_g"], gaussians, aux["cam_i"], data, cam_idx, step,
        cfg, alive_r, render_n=render_n)
    # The full-image loss is computed redundantly on every (tile, gauss)
    # member (each all_gathers the same image). Under check_vma=False the
    # transpose of all_gather is psum_scatter, which SUMS the identical
    # cotangents from all members — so grads through the gathered image come
    # out n_tile*n_gauss x too large, while grads through direct param paths
    # (flatness) don't. Dividing the loss by n_tile*n_gauss makes
    # psum(grad, (tile, gauss)) reconstruct the exact per-camera gradient
    # for BOTH paths; the step_fn recovers the true loss value for metrics
    # with a psum over the same axes.
    n_tile = jax.lax.axis_size(tile_axis)
    return total / (n_tile * n_gauss), (aux["radius"], laux["psnr"],
                                        aux["overflow"],
                                        aux["trunc_by_win"],
                                        aux["pairs_used"])


def _build_sharded_step(cfg: ExperimentConfig, camera: Camera,
                        data: TrainData, mesh: Mesh, adam_groups=None,
                        shard_optimizer: bool = False, render_n=None):
    """One DP x tile-parallel training step over `mesh`.

    cam_indices: (n_data,) int32 — one camera per data shard.

    shard_optimizer=True additionally shards the Adam update + moments
    across the `data` axis along the Gaussian-capacity dimension (the
    ZeRO-1 pattern): each device applies the optimizer to its slot slice
    and the fresh params all_gather back over ICI. The optimizer state
    pytree then LIVES sharded (pass it back in as returned). The capacity
    must divide the data-axis size.
    """
    adam_groups = adam_groups or DEFAULT_GROUPS
    n_data = mesh.shape["data"]
    n_gauss = mesh.shape.get("gauss", 1)
    shard_axes = ("tile", "gauss") if "gauss" in mesh.shape else ("tile",)
    use_cam_opt = cfg.train.camera_opt
    from fusionsense_tpu.train.optim import GroupSpec
    cam_group = {"cam_delta": GroupSpec(cfg.train.camera_opt_lr,
                                        every_k=cfg.train.camera_opt_every_k,
                                        eps=1e-8)}

    # both Pallas backends write per-tile |d mean2d| into table cols 6-7;
    # the tap's gradient is then gsplat's absgrad statistic. The "jax"
    # backend has no tap (its gradient is identically zero), so it keeps
    # the signed summed gradient.
    use_absgrad = cfg.model.rasterize.backend in ("pallas", "flat")

    def step_fn(gaussians, opt, cam_state, stats, step, cam_indices):
        cam_idx = cam_indices[0]   # local shard has exactly one camera
        cam_deltas, cam_opt = cam_state

        if cfg.model.binary_opacities:
            # logit-space surgery, identical to the single-device chunk
            # (reference dn_model.py:492-503); deterministic on replicated
            # logits, so every shard computes the same snapped values
            from fusionsense_tpu.gaussians.store import (
                binary_opacity_surgery,
            )

            adc_c = cfg.train.adc
            gaussians = gaussians.replace(
                logit_opacities=binary_opacity_surgery(
                    gaussians.logit_opacities, step,
                    threshold=cfg.model.binary_opacity_threshold,
                    warmup=adc_c.warmup,
                    skip=adc_c.reset_alpha_every * adc_c.refine_every,
                    margin=cfg.model.binary_opacity_margin))

        def loss_fn(params, tap, deltas, a_tap):
            g = gaussians.replace(**params)
            delta = deltas[cam_idx] if use_cam_opt else None
            return _sharded_losses(g, camera, data, cam_idx, step, cfg, tap,
                                   "tile", n_gauss=n_gauss, cam_delta=delta,
                                   render_n=render_n, abs_tap=a_tap)

        tap0 = jnp.zeros((gaussians.capacity, 2))
        (loss, (radius, psnr, overflow, trunc_by_win, pairs_used)), grads = (
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)
            (gaussians.params(), tap0, cam_deltas, tap0))
        param_grads, tap_grad, delta_grads, abs_grad = grads
        if use_absgrad:
            # per-tile absolute contributions: each (tile, splat) pair lives
            # on exactly one tile/gauss shard, so the psum over shard axes
            # below reassembles the exact single-device sum over tiles
            tap_grad = abs_grad

        # non-finite step guard (same as the single-device chunk): every
        # shard checks its LOCAL loss/grads, then a pmin over all mesh axes
        # makes the verdict global — one poisoned shard must skip the
        # update everywhere or params diverge across devices.
        ok = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves((param_grads, delta_grads)):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        ok_i = jax.lax.pmin(jax.lax.pmin(ok.astype(jnp.int32), "data"),
                            shard_axes)
        ok = ok_i.astype(bool)
        tap_grad = jnp.where(ok, tap_grad, 0.0)

        def _keep_if_ok(new, old):
            return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

        if use_cam_opt:
            # each data shard contributes its own camera's row; psum over
            # shard axes collapses the redundant tile/gauss members, psum
            # over data merges the disjoint camera rows — then the shared
            # accumulated-Adam path applies the update replicated
            delta_grads = jax.lax.psum(
                jax.lax.psum(delta_grads, shard_axes), "data")
            cam_p, cam_opt2 = adam_step(
                {"cam_delta": cam_deltas}, {"cam_delta": delta_grads},
                cam_opt, step, jnp.ones(cam_deltas.shape[0], bool),
                groups=cam_group)
            cam_deltas = jnp.where(ok, cam_p["cam_delta"], cam_deltas)
            cam_opt = _keep_if_ok(cam_opt2, cam_opt)

        # gradient reduction: mean over cameras, sum over tile/gauss shards
        tap_grad = jax.lax.pmean(jax.lax.psum(tap_grad, shard_axes), "data")

        if shard_optimizer:
            # ZeRO-1: reduce-scatter grads over `data`, update the local
            # slot slice against the (sharded) moments, all_gather params
            me = jax.lax.axis_index("data")
            C = gaussians.capacity
            local = C // n_data

            def rs(g):
                g = jax.lax.psum(g, shard_axes)
                return jax.lax.psum_scatter(
                    g, "data", scatter_dimension=0, tiled=True) / n_data

            local_grads = jax.tree.map(rs, param_grads)
            full_params = gaussians.params()
            local_params = jax.tree.map(
                lambda p: jax.lax.dynamic_slice_in_dim(p, me * local,
                                                       local, 0),
                full_params)
            local_alive = jax.lax.dynamic_slice_in_dim(
                gaussians.alive, me * local, local, 0)
            new_local, opt2 = adam_step(local_params, local_grads, opt, step,
                                        local_alive, groups=adam_groups)
            new_local = _keep_if_ok(new_local, local_params)
            opt2 = _keep_if_ok(opt2, opt)
            params = jax.tree.map(
                lambda p: jax.lax.all_gather(p, "data", axis=0, tiled=True),
                new_local)
        else:
            param_grads = jax.tree.map(
                lambda g: jax.lax.pmean(jax.lax.psum(g, shard_axes), "data"),
                param_grads)
            params, opt2 = adam_step(gaussians.params(), param_grads, opt,
                                     step, gaussians.alive,
                                     groups=adam_groups)
            params = _keep_if_ok(params, gaussians.params())
            opt2 = _keep_if_ok(opt2, opt)
        g2 = gaussians.replace(**params)
        # stats: radius is per-camera; accumulate the max over the batch
        radius = jax.lax.pmax(jax.lax.pmax(radius, "data"), shard_axes)
        if radius.shape[0] < gaussians.capacity:   # rendered prefix -> pad
            radius = jnp.concatenate(
                [radius, jnp.zeros(gaussians.capacity - radius.shape[0],
                                   radius.dtype)])
        stats2 = accumulate_stats(stats, tap_grad, radius,
                                  camera.width, camera.height)
        # skipped steps must not dilute the densification average
        stats2 = _keep_if_ok(stats2, stats)
        # per-device loss is true_loss/(n_tile*n_gauss) (see _sharded_losses),
        # so the shard-axes psum recovers the true per-camera loss before the
        # camera mean
        metrics = {
            "loss": jax.lax.pmean(jax.lax.psum(loss, shard_axes), "data"),
            "psnr": jax.lax.pmean(jax.lax.pmean(psnr, "data"), shard_axes),
            # overflow telemetry feeds the auto-tile-capacity policy; it is
            # identical across tile/gauss members, summed over cameras
            "overflow": jax.lax.pmax(jax.lax.psum(overflow, "data"),
                                     shard_axes),
            # max over cameras: the window must fit the worst view
            "trunc_by_win": jax.lax.pmax(
                jax.lax.pmax(trunc_by_win, "data"), shard_axes),
            # flat backend: worst shard's aligned pair total (budget policy)
            "pairs_used": jax.lax.pmax(
                jax.lax.pmax(pairs_used, "data"), shard_axes),
            "nonfinite": 1 - ok_i,      # identical on every shard (pmin)
        }
        return g2, opt2, (cam_deltas, cam_opt), stats2, metrics

    if shard_optimizer:
        # moments shard along the capacity axis; the per-group update
        # counters stay replicated scalars
        from fusionsense_tpu.gaussians.store import PARAM_KEYS
        from fusionsense_tpu.train.optim import AdamState

        sharded_leaves = {k: P("data") for k in PARAM_KEYS}
        opt_spec = AdamState(
            m=dict(sharded_leaves), v=dict(sharded_leaves),
            acc=dict(sharded_leaves),
            counts={k: P() for k in PARAM_KEYS})
    else:
        opt_spec = P()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), opt_spec, P(), P(), P(), P("data")),
        out_specs=(P(), opt_spec, P(), P(), P()),
        # check_vma=False everywhere: with vma tracking ON, cotangents of
        # replicated inputs are auto-psummed over ALL mesh axes, which would
        # double-count on top of the manual psum/pmean reductions here (and
        # weight direct-path loss terms differently from all_gather-path
        # ones). With it OFF, grads are per-device contributions and the
        # 1/n_tile loss scaling in _sharded_losses makes the manual
        # reductions exactly the mean-over-cameras gradient.
        check_vma=False,
    )
    return sharded, opt_spec


def _override_tile_capacity(cfg: ExperimentConfig, tile_capacity,
                            cover_tiles=None):
    import dataclasses as _dc

    rc = cfg.model.rasterize
    if tile_capacity is not None and tile_capacity != rc.tile_capacity:
        rc = _dc.replace(rc, tile_capacity=tile_capacity)
    if cover_tiles is not None and cover_tiles != rc.max_tiles_per_gaussian:
        rc = _dc.replace(rc, max_tiles_per_gaussian=cover_tiles)
    if rc is cfg.model.rasterize:
        return cfg
    return _dc.replace(cfg, model=_dc.replace(cfg.model, rasterize=rc))


def make_sharded_train_step(cfg: ExperimentConfig, camera: Camera,
                            data: TrainData, mesh: Mesh, adam_groups=None,
                            shard_optimizer: bool = False,
                            tile_capacity=None, cover_tiles=None):
    sharded, _ = _build_sharded_step(
        _override_tile_capacity(cfg, tile_capacity, cover_tiles), camera,
        data, mesh, adam_groups, shard_optimizer)
    return jax.jit(sharded)


def make_sharded_train_chunk(cfg: ExperimentConfig, camera: Camera,
                             data: TrainData, mesh: Mesh, adam_groups=None,
                             shard_optimizer: bool = False,
                             tile_capacity=None, cover_tiles=None,
                             render_n=None):
    """Fuse `n` sharded steps into ONE dispatch via lax.scan — the
    multi-chip analog of trainer.make_train_chunk.

    Returns (chunk_fn, opt_spec): chunk_fn(gaussians, opt, cam_state,
    stats, step0, cam_indices (n, n_data)) -> (gaussians, opt, cam_state,
    stats, metrics (n,)-dicts).
    """
    sharded, opt_spec = _build_sharded_step(
        _override_tile_capacity(cfg, tile_capacity, cover_tiles), camera,
        data, mesh, adam_groups, shard_optimizer, render_n=render_n)

    @jax.jit
    def chunk_fn(gaussians, opt, cam_state, stats, step0, cam_indices):
        def body(carry, cams):
            g, o, cs, st, step = carry
            g, o, cs, st, metrics = sharded(g, o, cs, st, step, cams)
            return (g, o, cs, st, step + 1), metrics

        (g, o, cs, st, _), metrics = jax.lax.scan(
            body, (gaussians, opt, cam_state, stats, step0), cam_indices)
        return g, o, cs, st, metrics

    return chunk_fn, opt_spec
