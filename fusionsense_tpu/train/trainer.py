"""The training loop: one jitted scan per refine interval.

Replaces the reference's nerfstudio Trainer + callbacks architecture
(reference scripts/train.py -> ns-train -> Trainer.train(), SURVEY.md §3.2)
with a TPU-native loop:

- all views live on device; a `lax.scan` fuses `scan_chunk` optimization
  steps into ONE dispatch (the per-step Python->device round trip would
  otherwise dominate on a networked TPU),
- the ADC refinement runs as a separately-jitted shape-static program
  between chunks (the reference's refinement_after/callback machinery),
- SH degree warm-up is a differentiable band mask instead of re-tracing.
"""
from __future__ import annotations

import math
import time
from typing import Optional

import chex
import jax
import jax.numpy as jnp

from fusionsense_tpu.config import ExperimentConfig
from fusionsense_tpu.core.cameras import Camera
from fusionsense_tpu.gaussians.adc import accumulate_stats, init_stats, refine
from fusionsense_tpu.gaussians.resize import (
    compact_train_state, pick_capacity, render_bucket, resize_train_state,
)
from fusionsense_tpu.gaussians.store import GaussianState, activated
from fusionsense_tpu.core.transforms import apply_se3_delta
from fusionsense_tpu.render.rasterize import (
    gaussian_flat_normals, rasterize,
)
from fusionsense_tpu.train import losses as L
from fusionsense_tpu.train.optim import (
    DEFAULT_GROUPS, GroupSpec, adam_step, init_adam,
)


@chex.dataclass
class TrainData:
    """All training views, stacked on device. Optional fields may be None."""

    images: jax.Array                 # (V, H, W, 3)
    sensor_depths: Optional[jax.Array] = None   # (V, H, W)
    mono_depths: Optional[jax.Array] = None     # (V, H, W)
    normals: Optional[jax.Array] = None         # (V, H, W, 3) world-space
    masks: Optional[jax.Array] = None           # (V, H, W) {0,1}


def sh_band_mask(sh_degree: int, step: jax.Array, interval: int) -> jax.Array:
    """(K,) multiplier activating one SH band per `interval` steps."""
    k = (sh_degree + 1) ** 2
    bands = jnp.floor(jnp.sqrt(jnp.arange(k, dtype=jnp.float32)))
    active = jnp.minimum(step // interval, sh_degree).astype(jnp.float32)
    return (bands <= active).astype(jnp.float32)


def compute_losses(
    gaussians: GaussianState,
    camera: Camera,
    data: TrainData,
    cam_idx: jax.Array,
    step: jax.Array,
    cfg: ExperimentConfig,
    tap: jax.Array,
    cam_delta: Optional[jax.Array] = None,   # (6,) SE3 pose correction
    absgrad_tap: Optional[jax.Array] = None,
    render_n: Optional[int] = None,
    bins=None,   # precomputed FlatBins (trainer bin cache, flat backend)
):
    """Forward + composite DN-Splatter loss for one camera.

    render_n: static prefix length — when the trainer maintains the
    alive-first compaction invariant (resize.compact_train_state), the
    rasterizer only needs the first render_n slots, cutting projection/
    binning/sort work from the capacity bucket to the live population.
    """
    mc, lc = cfg.model, cfg.loss
    means, quats, scales, op, colors = activated(gaussians)
    colors = colors * sh_band_mask(mc.sh_degree, step, mc.sh_degree_interval)[None, :, None]
    alive_r = gaussians.alive
    if render_n is not None and render_n < gaussians.capacity:
        means, quats, scales, op, colors = (
            means[:render_n], quats[:render_n], scales[:render_n],
            op[:render_n], colors[:render_n])
        alive_r = alive_r[:render_n]
        tap = tap[:render_n]
        if absgrad_tap is not None:
            absgrad_tap = absgrad_tap[:render_n]

    cam_i = camera.index(cam_idx)
    if cam_delta is not None:
        # the reference's camera optimizer applied per forward
        # (dn_model.py:488 camera_optimizer.apply_to_camera)
        cam_i = cam_i.replace(
            viewmat=apply_se3_delta(cam_i.viewmat, cam_delta))
    normals_g = gaussian_flat_normals(quats, scales, means, cam_i.origin)
    out = rasterize(
        means, quats, scales, op, colors, cam_i, mc.rasterize,
        normals=normals_g,
        background=jnp.asarray(mc.background, jnp.float32),
        mean2d_tap=tap,
        absgrad_tap=absgrad_tap,
        bins=bins,
    )

    return loss_terms(out, normals_g, gaussians, cam_i, data, cam_idx,
                      step, cfg, alive_r, render_n=render_n)


def loss_terms(out, normals_g, gaussians, cam_i, data, cam_idx, step, cfg,
               alive_r, render_n=None):
    """DN-Splatter loss stack on rendered outputs — shared between the
    single-device path (compute_losses) and the multi-chip path
    (parallel/sharded.py), so both optimize the IDENTICAL objective.

    `out` needs .rgb/.depth/.normal/.alpha/.radius/.overflow.
    """
    mc, lc = cfg.model, cfg.loss
    image_gt = data.images[cam_idx]
    mask = data.masks[cam_idx][..., None] if data.masks is not None else None

    total = L.rgb_loss(out.rgb, image_gt, mask, lc.ssim_lambda)
    parts = {"rgb": total}

    # the reference floors the GT image at 10/255 before edge-aware
    # depth/smoothness weighting (dn_model.py get_loss_dict), so dark
    # pixels don't produce spurious strong edges
    image_floor = jnp.maximum(image_gt, 10.0 / 255.0)

    def depth_term(gt_depth):
        valid = (gt_depth > lc.depth_tolerance).astype(jnp.float32)
        if mask is not None:
            valid = valid * mask[..., 0]
        if lc.depth_loss == "EdgeAwareLogL1":
            return L.depth_edge_aware_logl1(out.depth, gt_depth, image_floor,
                                            valid)
        return L.DEPTH_LOSSES[lc.depth_loss](out.depth, gt_depth, valid)

    if data.sensor_depths is not None and lc.sensor_depth_lambda > 0:
        d = depth_term(data.sensor_depths[cam_idx])
        parts["sensor_depth"] = d
        total = total + lc.sensor_depth_lambda * d
    if data.mono_depths is not None and lc.mono_depth_lambda > 0:
        d = depth_term(data.mono_depths[cam_idx])
        parts["mono_depth"] = d
        total = total + lc.mono_depth_lambda * d

    if lc.smooth_lambda > 0:
        sm = (L.edge_aware_tv(out.depth, image_floor)
              if lc.use_depth_smooth_edge_aware else L.tv_loss(out.depth))
        parts["smooth"] = sm
        total = total + lc.smooth_lambda * sm

    if lc.normal_lambda > 0:
        if data.normals is not None and lc.normal_supervision == "mono":
            gt_n = data.normals[cam_idx]
        else:
            # pseudo-normals from the rendered depth (reference
            # dn_model.py:767-815 "depth" supervision mode), in world frame
            n_cam = L.normals_from_depth(jax.lax.stop_gradient(out.depth), cam_i)
            c2w = cam_i.camtoworld
            gt_n = n_cam @ c2w[:3, :3].T
        nl = L.normal_l1(out.normal, gt_n, None if mask is None else mask[..., 0])
        if lc.use_normal_tv:
            nl = nl + L.tv_loss(out.normal)
        if lc.use_normal_cosine:
            nl = nl + L.normal_cosine(out.normal, gt_n,
                                      None if mask is None else mask[..., 0])
        parts["normal"] = nl
        total = total + lc.normal_lambda * nl

    if lc.flatness_lambda > 0:
        fl = L.flatness_loss(gaussians.log_scales, gaussians.alive)
        parts["flatness"] = fl
        total = total + lc.flatness_lambda * fl

    if lc.sparse_lambda > 0:
        sp = L.opacity_entropy_loss(gaussians.logit_opacities, gaussians.alive)
        parts["sparse"] = sp
        total = total + lc.sparse_lambda * sp

    if lc.touch_normal_lambda > 0:
        n_gt = gaussians.normals
        frz = gaussians.frozen
        if render_n is not None and render_n < gaussians.capacity:
            n_gt, frz = n_gt[:render_n], frz[:render_n]
        tn = L.touch_normal_loss(normals_g, n_gt, frz)
        parts["touch_normal"] = tn
        total = total + lc.touch_normal_lambda * tn

    if lc.sdf_lambda > 0:
        from fusionsense_tpu.train.sdf_loss import sdf_loss

        s_means, s_quats, s_scales, s_op, _ = activated(gaussians)
        if render_n is not None and render_n < gaussians.capacity:
            s_means, s_quats, s_scales, s_op = (
                s_means[:render_n], s_quats[:render_n],
                s_scales[:render_n], s_op[:render_n])
        sdfl = sdf_loss(jax.random.PRNGKey(step), s_means, s_quats, s_scales,
                        s_op, alive_r, out.depth, cam_i,
                        n_samples=lc.sdf_samples)
        parts["sdf"] = sdfl
        total = total + lc.sdf_lambda * sdfl

    aux = {
        "radius": out.radius,
        "psnr": -10.0 * jnp.log10(jnp.mean((out.rgb - image_gt) ** 2) + 1e-10),
        "overflow": out.overflow,
        "trunc_by_win": out.trunc_by_win,
        "pairs_used": getattr(out, "pairs_used", 0),
    }
    return total, (parts, aux)


def _patched_cfg(cfg: ExperimentConfig,
                 tile_capacity: Optional[int] = None,
                 cover_tiles: Optional[int] = None) -> ExperimentConfig:
    """Apply the trainer's adaptive rasterizer overrides to the config."""
    import dataclasses as _dc

    rc = cfg.model.rasterize
    if tile_capacity is not None and tile_capacity != rc.tile_capacity:
        rc = _dc.replace(rc, tile_capacity=tile_capacity)
    if cover_tiles is not None and cover_tiles != rc.max_tiles_per_gaussian:
        rc = _dc.replace(rc, max_tiles_per_gaussian=cover_tiles)
    if rc is not cfg.model.rasterize:
        cfg = _dc.replace(cfg, model=_dc.replace(cfg.model, rasterize=rc))
    return cfg


def make_train_chunk(cfg: ExperimentConfig, camera: Camera, data: TrainData,
                     adam_groups=None, render_n: Optional[int] = None,
                     tile_capacity: Optional[int] = None,
                     cover_tiles: Optional[int] = None):
    """Build the jitted multi-step training function.

    Returns f(gaussians, opt, stats, step0, cam_indices) ->
    (gaussians, opt, stats, metrics) running len(cam_indices) fused steps.
    render_n statically bounds the rasterized prefix (see compute_losses);
    tile_capacity overrides the rasterizer K (the trainer auto-bumps it
    when overflow telemetry shows pixel starvation); cover_tiles overrides
    the static per-Gaussian tile-cover window (the trainer sizes it from
    truncation telemetry — the sort population scales linearly with it).
    """
    cfg = _patched_cfg(cfg, tile_capacity, cover_tiles)
    body, extra_init = _make_step_body(cfg, camera, data, adam_groups,
                                       render_n)

    @jax.jit
    def train_chunk(gaussians, opt, cam_state, stats, step0, cam_indices):
        init = (gaussians, opt, cam_state, stats, step0) + extra_init()
        carry, metrics = jax.lax.scan(body, init, cam_indices)
        gaussians, opt, cam_state, stats = carry[:4]
        return gaussians, opt, cam_state, stats, metrics

    return train_chunk


def _bin_cache_fns(cfg: ExperimentConfig, camera: Camera, nv: int,
                   render_n: Optional[int], use_cam_opt: bool):
    """(empty_bins, bin_one) for the carry-cached per-view binning.

    bin_one(gaussians, cam_deltas, v) projects view v (current params,
    current pose deltas) and builds its flat segmented layout; the step
    body caches it in the scan carry and REUSES it on later visits of the
    same view until it ages past bin_refresh_steps — steps that reuse pay
    only a ~1 MB dynamic-slice instead of the full sort/segment pass.
    (A vmapped all-view variant was measured SLOWER on-chip: binning is
    throughput-bound at bench populations, so batching V views costs ~V x
    one view and amortizes nothing — DESIGN.md §5e.)
    """
    import math as _math

    from fusionsense_tpu.core.transforms import apply_se3_delta as _se3
    from fusionsense_tpu.render.binning import (
        FlatBins, auto_expand_budget as _auto_eb, flat_bin_gaussians)
    from fusionsense_tpu.render.composite import TileGrid
    from fusionsense_tpu.render.project import project_gaussians

    rc = cfg.model.rasterize
    grid = TileGrid(width=camera.width, height=camera.height,
                    tile_size=rc.tile_size)
    B = rc.pallas_chunk
    PB = -(-rc.tile_capacity * grid.num_tiles // B) * B
    win = max(1, int(_math.isqrt(rc.max_tiles_per_gaussian)))
    C = win * win
    N = render_n if render_n is not None else cfg.model.capacity
    nb = PB // B

    want_landing = rc.flat_grad_transpose != "scatter"

    def empty_bins() -> FlatBins:
        i32 = jnp.int32
        return FlatBins(
            gauss_ids=jnp.zeros((nv, PB), i32),
            valid=jnp.zeros((nv, PB), bool),
            blk_tile=jnp.zeros((nv, nb), i32),
            blk_first=jnp.zeros((nv, nb), i32),
            blk_count=jnp.zeros((nv, nb), i32),
            landing=jnp.full((nv, N, C), -1, i32) if want_landing else None,
            overflow=jnp.zeros((nv,), i32),
            truncated=jnp.zeros((nv,), i32),
            trunc_by_win=jnp.zeros((nv, 5), i32),
            used=jnp.zeros((nv,), i32),
        )

    def bin_one(gaussians: GaussianState, cam_deltas, v) -> FlatBins:
        means, quats, scales, op, _ = activated(gaussians)
        if render_n is not None and render_n < gaussians.capacity:
            means, quats, scales, op = (means[:render_n], quats[:render_n],
                                        scales[:render_n], op[:render_n])
        cam_v = camera.index(v)
        if use_cam_opt:
            cam_v = cam_v.replace(
                viewmat=_se3(cam_v.viewmat, cam_deltas[v]))
        proj = project_gaussians(
            means, quats, scales, op, cam_v,
            near=rc.near, far=rc.far, eps2d=rc.eps2d,
            antialiased=rc.antialiased, radius_clip=rc.radius_clip)
        return flat_bin_gaussians(
            jax.lax.stop_gradient(proj.mean2d),
            jax.lax.stop_gradient(proj.radius),
            jax.lax.stop_gradient(proj.depth),
            width=camera.width, height=camera.height,
            tile_size=rc.tile_size, pair_budget=PB,
            max_tiles_per_gaussian=rc.max_tiles_per_gaussian, block=B,
            compute_landing=want_landing,
            expand_budget=_auto_eb(PB, N, rc.max_tiles_per_gaussian, B))

    return empty_bins, bin_one


def _make_step_body(cfg: ExperimentConfig, camera: Camera, data: TrainData,
                    adam_groups=None, render_n: Optional[int] = None):
    """The single-train-step scan body shared by make_train_chunk and
    make_fused_intervals. `cfg` must already carry the adaptive overrides
    (_patched_cfg).

    Returns (body, extra_init): the scan carry is
    (gaussians, opt, cam_state, stats, step) + extra_init(), where the
    extra elements hold the all-view bin cache + its age when
    cfg.train.bin_refresh_steps > 0 (flat backend). The cache is CARRY-
    local: each chunk/interval starts stale, so host-side refines,
    compactions, and resizes between dispatches can never corrupt it.
    """
    adam_groups = adam_groups or DEFAULT_GROUPS
    use_cam_opt = cfg.train.camera_opt
    refresh = cfg.train.bin_refresh_steps
    use_bin_cache = refresh > 0 and cfg.model.rasterize.backend == "flat"
    if use_bin_cache:
        empty_bins, bin_one = _bin_cache_fns(
            cfg, camera, data.images.shape[0], render_n, use_cam_opt)

    cam_group = {"cam_delta": GroupSpec(cfg.train.camera_opt_lr,
                                        every_k=cfg.train.camera_opt_every_k,
                                        eps=1e-8)}

    def body(carry, cam_idx):
        gaussians, opt, cam_state, stats, step = carry[:5]
        cam_deltas, cam_opt = cam_state

        if cfg.model.binary_opacities:
            # reference dn_model.py:492-503: logit-space param surgery at
            # the top of each step (persists through this step's update)
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

        fb = None
        if use_bin_cache:
            bins, age = carry[5], carry[6]          # age: (V,) steps-old
            need = age[cam_idx] >= refresh
            fb = jax.lax.cond(
                need, lambda _: bin_one(gaussians, cam_deltas, cam_idx),
                lambda _: jax.tree.map(lambda x: x[cam_idx], bins), None)
            bins = jax.tree.map(
                lambda full, new: jax.lax.dynamic_update_index_in_dim(
                    full, new.astype(full.dtype), cam_idx, 0), bins, fb)
            age = (age + 1).at[cam_idx].set(
                jnp.where(need, jnp.int32(1), age[cam_idx] + 1))

        # both Pallas backends surface gsplat-style absgrad through the
        # table transpose (dense: pallas_composite2 cols 6-7; flat:
        # pallas_flat cols 6-7) — the "jax" backend has no tap and falls
        # back to the signed summed gradient
        use_absgrad = cfg.model.rasterize.backend in ("pallas", "flat")

        def loss_fn(params, tap, deltas, abs_tap):
            g = gaussians.replace(**params)
            delta = deltas[cam_idx] if use_cam_opt else None
            return compute_losses(g, camera, data, cam_idx, step, cfg, tap,
                                  cam_delta=delta, absgrad_tap=abs_tap,
                                  render_n=render_n, bins=fb)

        tap0 = jnp.zeros((gaussians.capacity, 2))
        (loss, (parts, aux)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(gaussians.params(), tap0, cam_deltas, tap0)
        param_grads, tap_grad, delta_grads, abs_grad = grads
        if use_absgrad:
            # gsplat-style absgrad drives densification (sum over tiles of
            # |per-tile position gradient|, via the pallas backward)
            tap_grad = abs_grad

        # non-finite step guard (beyond-reference failure handling —
        # SURVEY.md §5 records the reference has none): a single NaN/inf
        # loss or gradient would poison the Adam moments and every later
        # step inside this fused scan. Skip the whole update instead and
        # surface a counter. Cost: one extra pass over the grads (small
        # next to the backward that produced them) + selects.
        ok = jnp.asarray(jnp.isfinite(loss))
        for leaf in jax.tree_util.tree_leaves((param_grads, delta_grads)):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        tap_grad = jnp.where(ok, tap_grad, 0.0)

        def _keep_if_ok(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)

        params, opt2 = adam_step(gaussians.params(), param_grads, opt, step,
                                 gaussians.alive, groups=adam_groups)
        params = _keep_if_ok(params, gaussians.params())
        opt2 = _keep_if_ok(opt2, opt)
        gaussians2 = gaussians.replace(**params)

        if use_cam_opt:
            # accumulated Adam (bias-corrected, via the shared optimizer
            # path) on the (V, 6) SO3xR3 pose deltas — reference semantics:
            # nerfstudio camera_opt group, grad accumulation 100
            # (dn_config.py:29)
            cam_p, cam_opt2 = adam_step(
                {"cam_delta": cam_deltas}, {"cam_delta": delta_grads},
                cam_opt, step, jnp.ones(cam_deltas.shape[0], bool),
                groups=cam_group)
            cam_deltas = jnp.where(ok, cam_p["cam_delta"], cam_deltas)
            cam_opt = _keep_if_ok(cam_opt2, cam_opt)

        radius = aux["radius"]
        if radius.shape[0] < gaussians.capacity:   # rendered prefix -> pad
            radius = jnp.concatenate(
                [radius, jnp.zeros(gaussians.capacity - radius.shape[0],
                                   radius.dtype)])
        stats2 = accumulate_stats(stats, tap_grad, radius,
                                  camera.width, camera.height)
        # skipped steps must not dilute the densification average either:
        # count/max_radius growing against a zeroed tap halves the
        # effective grad2d mean under a persistently poisoned view
        stats2 = _keep_if_ok(stats2, stats)
        metrics = {"loss": loss, "psnr": aux["psnr"],
                   "overflow": aux["overflow"],
                   "trunc_by_win": aux["trunc_by_win"],
                   "pairs_used": aux["pairs_used"],
                   "nonfinite": (~ok).astype(jnp.int32)}
        out_carry = (gaussians2, opt2, (cam_deltas, cam_opt),
                     stats2, step + 1)
        if use_bin_cache:
            out_carry = out_carry + (bins, age)
        return out_carry, metrics

    def extra_init():
        if use_bin_cache:
            # ages start AT the refresh threshold: every view rebins on
            # its first visit of the chunk/interval, from current params
            return (empty_bins(),
                    jnp.full((data.images.shape[0],), refresh, jnp.int32))
        return ()

    return body, extra_init


def make_fused_intervals(cfg: ExperimentConfig, camera: Camera,
                         data: TrainData, adam_groups=None,
                         render_n: Optional[int] = None,
                         tile_capacity: Optional[int] = None,
                         cover_tiles: Optional[int] = None,
                         interval: Optional[int] = None,
                         n_intervals: int = 5,
                         scene_scale: float = 1.0):
    """Build a ONE-dispatch program running `n_intervals` refine intervals.

    Each interval = `interval` fused train steps (lax.scan of the shared
    step body) + the ADC refine pass + an on-device alive-first compaction
    (resize.compact_train_state), all inside a single jitted outer scan —
    zero host round trips between the dispatch and the final block.

    This is the tunnel-proof training segment: on a networked TPU every
    host sync costs an RTT that can reach seconds (docs/DESIGN.md §3), and
    the normal Trainer.run pays one blocking num_alive fetch per refine
    boundary. Here the refine fires on-device, gated by the same
    warmup/stop_split range the trainer uses (lax.cond), with the SAME
    per-step seed derivation, so the trajectory matches Trainer.run up to
    host-policy resizes (capacity bucket / pair budget / cover window),
    which the caller must have let settle first.

    Returns f(gaussians, opt, cam_state, stats, step0) ->
    (gaussians, opt, cam_state, stats, metrics) where metrics holds one
    row per interval (last-step loss/psnr/telemetry + summed nonfinite).
    """
    cfg = _patched_cfg(cfg, tile_capacity, cover_tiles)
    body, extra_init = _make_step_body(cfg, camera, data, adam_groups,
                                       render_n)
    adc = cfg.train.adc
    steps = interval if interval is not None else adc.refine_every
    nv = data.images.shape[0]
    seed_base = (cfg.train.seed * 1_000_003) % (1 << 32)

    @jax.jit
    def fused(gaussians, opt, cam_state, stats, step0):
        def one_interval(carry, i):
            g, o, cs, st = carry
            s0 = step0 + i * steps
            cam_idx = (s0 + jnp.arange(steps, dtype=jnp.int32)) % nv
            # bin cache (when enabled) starts stale each interval, so the
            # refine/compaction below can never feed it permuted slots
            init = (g, o, cs, st, s0) + extra_init()
            out_carry, m = jax.lax.scan(body, init, cam_idx)
            g, o, cs, st = out_carry[:4]
            s_end = s0 + steps

            def do_refine(args):
                g, o, st = args
                # same seed derivation as Trainer.run (uint32 wraparound)
                seed = jnp.uint32(seed_base) + s_end.astype(jnp.uint32)
                g, o, st, _info = refine(g, o, st, jax.random.PRNGKey(seed),
                                         adc, s_end, scene_scale=scene_scale)
                return compact_train_state(g, o, st)

            fire = ((s_end >= adc.warmup) & (s_end < adc.stop_split_at)
                    & ((s_end - adc.warmup) % adc.refine_every == 0))
            g, o, st = jax.lax.cond(fire, do_refine, lambda a: a, (g, o, st))
            summary = {k: m[k][-1] for k in ("loss", "psnr", "overflow",
                                             "trunc_by_win", "pairs_used")}
            summary["nonfinite"] = jnp.sum(m["nonfinite"])
            return (g, o, cs, st), summary

        (g, o, cs, st), ms = jax.lax.scan(
            one_interval, (gaussians, opt, cam_state, stats),
            jnp.arange(n_intervals, dtype=jnp.int32))
        return g, o, cs, st, ms

    return fused


class Trainer:
    """Orchestrates chunks + refinement + (later) touch-add/hull-prune."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        camera: Camera,          # batched over views
        data: TrainData,
        gaussians: GaussianState,
        scene_scale: float = 1.0,
        extra_callbacks: Optional[list] = None,
        adam_groups: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.camera = camera
        self.data = data
        self.gaussians = gaussians
        self.opt = init_adam(gaussians.params())
        self.stats = init_stats(gaussians.capacity)
        self.scene_scale = scene_scale
        self.num_views = data.images.shape[0]
        self.step = 0
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.extra_callbacks = extra_callbacks or []
        self.checkpoint_dir = None   # set to a path to enable periodic saves
        self.image_log_dir = None    # set to a path to dump GT/pred grids
        self._debug_render = None
        self.max_capacity = gaussians.capacity
        self.auto_capacity = cfg.train.auto_capacity
        nv = data.images.shape[0]
        z6 = jnp.zeros((nv, 6))
        self.cam_state = (z6, init_adam({"cam_delta": z6}))
        self._adam_groups = adam_groups
        self._chunk_cache: dict = {}
        self.render_n: Optional[int] = None
        self.tile_capacity = cfg.model.rasterize.tile_capacity
        cap_tiles = cfg.model.rasterize.max_tiles_per_gaussian
        self.cover_tiles = (min(4, cap_tiles)
                            if cfg.train.auto_cover_window else cap_tiles)
        self._grid_tiles = (-(-camera.width // cfg.model.rasterize.tile_size)
                            * -(-camera.height // cfg.model.rasterize.tile_size))
        # seed folded inside jit: jax.random.PRNGKey on the host is an
        # eager device op (a full round trip on a networked TPU)
        self._refine = jax.jit(
            lambda g, o, st, seed, step: refine(
                g, o, st, jax.random.PRNGKey(seed), cfg.train.adc, step,
                scene_scale=scene_scale))
        if self.auto_capacity:
            # start in the right bucket for the seed population
            n0 = int(self.gaussians.num_alive)
            cap0 = pick_capacity(n0, self.gaussians.capacity,
                                 self.max_capacity,
                                 minimum=min(1024, self.max_capacity))
            if cap0 != self.gaussians.capacity:
                self.gaussians, self.opt, self.stats = resize_train_state(
                    self.gaussians, self.opt, self.stats, new_capacity=cap0)
        if cfg.train.render_prefix:
            self._recompact(int(self.gaussians.num_alive))
        self.history: list[dict] = []

    def _recompact(self, n_alive: int):
        """Re-establish the alive-first prefix and pick the render bucket.

        Hysteresis: growing re-buckets immediately (correctness — alive
        slots must fit the prefix), but shrinking waits until the
        population is >= 2 ladder steps below the current bucket. Every
        distinct (capacity, render_n) pair compiles its own train chunk
        (~tens of seconds on a tunneled TPU), so bucket thrash is the
        dominant cost of a wrong policy here.
        """
        self.gaussians, self.opt, self.stats = compact_train_state(
            self.gaussians, self.opt, self.stats)
        want = render_bucket(n_alive, self.gaussians.capacity)
        if (self.render_n is None or want > self.render_n
                or want * 1.5 <= self.render_n
                or want == self.gaussians.capacity):
            self.render_n = want
        else:
            self.render_n = min(self.render_n, self.gaussians.capacity)

    @property
    def _train_chunk(self):
        key = (self.gaussians.capacity, self.render_n, self.tile_capacity,
               self.cover_tiles)
        fn = self._chunk_cache.get(key)
        if fn is None:
            fn = make_train_chunk(self.cfg, self.camera, self.data,
                                  self._adam_groups, render_n=self.render_n,
                                  tile_capacity=self.tile_capacity,
                                  cover_tiles=self.cover_tiles)
            self._chunk_cache[key] = fn
        return fn

    def _maybe_bump_tile_capacity(self, overflow: int):
        """Grow K when dropped (tile, splat) pairs signal pixel starvation.

        Keep-nearest-K overflow silently stops rasterizing whole tile
        sub-regions once a tile overcommits (drop-farthest keeps only the
        near-depth cluster); measured on the blob fixture this cost 30+ dB
        of reconstruction before the capacity was raised. Policy: bump K by
        1.5x (rounded to the pallas chunk multiple) whenever dropped pairs
        exceed tile_overflow_frac of the T*K budget.
        """
        tc = self.cfg.train
        # flat backend: _maybe_resize_pair_budget sizes the budget directly
        # from pairs_used; letting the 1.5x ladder ALSO fire can overshoot
        # past the direct target and then stick (shrink needs 2x hysteresis)
        if not tc.auto_tile_capacity or self._is_flat:
            return
        budget = self._grid_tiles * self.tile_capacity
        if overflow <= tc.tile_overflow_frac * budget:
            return
        if self.tile_capacity >= tc.max_tile_capacity:
            return
        want = int(self.tile_capacity * 1.5)
        want = -(-want // 128) * 128
        self.tile_capacity = min(want, tc.max_tile_capacity)

    @property
    def _is_flat(self) -> bool:
        return self.cfg.model.rasterize.backend == "flat"

    def _maybe_resize_pair_budget(self, used: int):
        """Flat backend: size the pair budget DIRECTLY from telemetry.

        `used` is the block-aligned live pair total (FlatBins.used),
        reported even when it exceeds the current budget — so one resize
        jumps straight to the right size instead of walking the x1.5
        overflow ladder (each step is a chunk recompile). Oversizing costs
        linearly (the gather/kernel/dtab all scale with the budget:
        13.3 -> 19.8 ms when 2x oversized at bench scale), so the budget
        also SHRINKS, with hysteresis.
        """
        tc = self.cfg.train
        if (self.cfg.model.rasterize.backend != "flat"
                or not tc.auto_tile_capacity or used <= 0):
            return
        T = self._grid_tiles
        # 1.25x headroom, 64-pairs/tile granularity to bound recompiles
        target = -(-used * 5 // (4 * T) // 64) * 64
        target = max(64, min(target, tc.max_tile_capacity))
        if target > self.tile_capacity:
            self.tile_capacity = target
        elif target * 2 <= self.tile_capacity:
            self.tile_capacity = target

    def _maybe_adjust_cover_window(self, trunc_by_win):
        """Pick the smallest cover window whose truncation is negligible.

        trunc_by_win[w-1] = pairs a w x w window would drop. Each dropped
        pair is a splat absent from an entire tile, so the tolerance is
        tight (cover_trunc_frac of the render population). Growing is
        immediate (quality); shrinking requires half the threshold
        (hysteresis — every change recompiles the train chunk).
        """
        tc = self.cfg.train
        if not tc.auto_cover_window:
            return
        cap_tiles = self.cfg.model.rasterize.max_tiles_per_gaussian
        pop = self.render_n or self.gaussians.capacity
        tol = tc.cover_trunc_frac * pop
        cur_w = max(1, int(math.isqrt(self.cover_tiles)))
        w_max = min(5, max(1, int(math.isqrt(cap_tiles))))
        want_w = w_max  # best effort if nothing meets tolerance
        for w in range(1, w_max + 1):
            if trunc_by_win[w - 1] <= (tol if w >= cur_w else 0.5 * tol):
                want_w = w
                break
        if want_w != cur_w:
            self.cover_tiles = want_w * want_w

    def run_fused(self, n_intervals: int, interval: Optional[int] = None,
                  block: bool = False):
        """Advance n_intervals refine intervals in ONE device dispatch.

        Zero host syncs inside: the ADC refine and the alive-first
        compaction run on device (make_fused_intervals). Preconditions the
        caller owns: the adaptive policies (capacity bucket, render_n,
        pair budget, cover window) have settled, and self.step sits on a
        refine-interval boundary so the on-device refine gate matches what
        Trainer.run would have fired. Host policy state is NOT updated —
        call sync_policies() afterwards to re-establish it.

        Returns the per-interval metrics pytree (device arrays; call
        jax.block_until_ready / device_get yourself — or pass block=True).
        """
        adc = self.cfg.train.adc
        interval = interval or adc.refine_every
        if (self.step - adc.warmup) % adc.refine_every:
            raise ValueError(
                f"run_fused at step {self.step}: not on a refine boundary")
        key = ("fused", self.gaussians.capacity, self.render_n,
               self.tile_capacity, self.cover_tiles, interval, n_intervals)
        fn = self._chunk_cache.get(key)
        if fn is None:
            fn = make_fused_intervals(
                self.cfg, self.camera, self.data, self._adam_groups,
                render_n=self.render_n, tile_capacity=self.tile_capacity,
                cover_tiles=self.cover_tiles, interval=interval,
                n_intervals=n_intervals, scene_scale=self.scene_scale)
            self._chunk_cache[key] = fn
        import numpy as _np

        g, o, cs, st, ms = fn(self.gaussians, self.opt, self.cam_state,
                              self.stats, _np.int32(self.step))
        self.gaussians, self.opt, self.cam_state, self.stats = g, o, cs, st
        self.step += n_intervals * interval
        if block:
            jax.block_until_ready(ms)
        return ms

    def sync_policies(self, metrics=None):
        """One host sync re-establishing the adaptive policy state after
        fused segments: fetch telemetry, re-bucket capacity, re-pick the
        render prefix, and tick the pair-budget / cover-window policies.
        `metrics` is the last run_fused return (uses its final interval row
        for pairs/window telemetry when given). Appends a history record."""
        cfg = self.cfg
        fetch = [self.gaussians.num_alive]
        if metrics is not None:
            fetch += [metrics["pairs_used"][-1], metrics["trunc_by_win"][-1],
                      metrics["overflow"][-1], metrics["loss"][-1],
                      metrics["psnr"][-1], jnp.sum(metrics["nonfinite"])]
        vals = jax.device_get(fetch)
        n_alive = int(vals[0])
        if self.auto_capacity:
            cap = pick_capacity(n_alive, self.gaussians.capacity,
                                self.max_capacity,
                                minimum=min(1024, self.max_capacity))
            if cap != self.gaussians.capacity:
                self.gaussians, self.opt, self.stats = resize_train_state(
                    self.gaussians, self.opt, self.stats, new_capacity=cap)
        if cfg.train.render_prefix:
            self._recompact(n_alive)
        if metrics is not None:
            pu, tbw, ovf, loss_h, psnr_h, nf = vals[1:]
            self._maybe_bump_tile_capacity(int(ovf))
            self._maybe_resize_pair_budget(int(pu))
            self._maybe_adjust_cover_window(tbw)
            self.history.append({
                "step": self.step, "loss": float(loss_h),
                "psnr": float(psnr_h), "num_gaussians": n_alive,
                "tile_overflow": int(ovf), "nonfinite_steps": int(nf),
                "capacity": self.gaussians.capacity,
            })
        return n_alive

    def _cam_indices(self, n: int):
        # sequential camera order, like the reference datamanager
        # (dn_datamanager.py:99-102). Host numpy: on a networked TPU every
        # eager device op is a round trip, so the loop must dispatch exactly
        # one jitted call per chunk.
        import numpy as _np

        return _np.arange(self.step, self.step + n, dtype=_np.int32) % self.num_views

    def save(self, path):
        """Full-fidelity checkpoint: model/opt/stats/step + camera-optimizer
        state + the host-side adaptive policy state (tile capacity / cover
        window) so a resumed run continues the SAME trajectory instead of
        re-walking the warmup policies (reference resumes via nerfstudio
        eval_setup with its camera optimizer inside the pipeline state)."""
        from fusionsense_tpu.train.checkpoint import save_trainer_state

        save_trainer_state(self, path)

    def restore(self, path):
        """Resume mid-training from a Trainer.save checkpoint."""
        from fusionsense_tpu.train.checkpoint import restore_trainer_state

        restore_trainer_state(self, path)
        if self.cfg.train.render_prefix:
            self._recompact(int(self.gaussians.num_alive))
        return self

    def run(self, iterations: Optional[int] = None, log=print):
        cfg = self.cfg
        total = iterations if iterations is not None else cfg.train.iterations
        adc = cfg.train.adc
        t0 = time.time()
        while self.step < total:
            n = min(cfg.train.scan_chunk, total - self.step)
            # align chunk boundaries with refinement steps
            next_refine = (
                (self.step - adc.warmup) // adc.refine_every + 1
            ) * adc.refine_every + adc.warmup
            if self.step < adc.warmup:
                next_refine = adc.warmup
            n = max(1, min(n, next_refine - self.step))

            import numpy as _np

            g, o, cs, s, metrics = self._train_chunk(
                self.gaussians, self.opt, self.cam_state, self.stats,
                _np.int32(self.step), self._cam_indices(n),
            )
            self.gaussians, self.opt, self.cam_state, self.stats = g, o, cs, s
            self.step += n
            # cumulative counter across chunks (a log boundary only sees
            # the LAST chunk's metrics): one async device add per chunk
            nf_c = jnp.sum(metrics["nonfinite"])
            self._nf_acc = (nf_c if getattr(self, "_nf_acc", None) is None
                            else self._nf_acc + nf_c)

            alive_changed = False
            if (self.step >= adc.warmup and self.step < adc.stop_split_at
                    and (self.step - adc.warmup) % adc.refine_every == 0):
                seed = _np.uint32(cfg.train.seed * 1_000_003 + self.step)
                self.gaussians, self.opt, self.stats, info = self._refine(
                    self.gaussians, self.opt, self.stats, seed,
                    _np.int32(self.step),
                )
                alive_changed = True
            for cb in self.extra_callbacks:
                # a callback reports mutation by returning truthy; a bare
                # observer (viewer, logging) returning None costs nothing
                alive_changed |= bool(cb(self))
            if alive_changed and cfg.train.render_prefix:
                # the prefix MUST track the population every time it can
                # change, not just at log boundaries: alive slots past
                # render_n silently never rasterize. Costs one scalar
                # device fetch per refine boundary.
                self._recompact(int(jax.device_get(self.gaussians.num_alive)))

            if (self.image_log_dir is not None
                    and self.step % cfg.train.log_every == 0):
                self._dump_debug_grid()

            if (self.checkpoint_dir is not None
                    and self.step % cfg.train.steps_per_save == 0):
                self.save(f"{self.checkpoint_dir}/ckpt_{self.step}")

            if self.step % cfg.train.log_every == 0 or self.step >= total:
                # ONE device->host transfer for all logged scalars
                (loss_h, psnr_h, ovf_h, tbw_h, pu_h, nf_h,
                 n_alive) = jax.device_get(
                    (metrics["loss"][-1], metrics["psnr"][-1],
                     metrics["overflow"][-1], metrics["trunc_by_win"][-1],
                     metrics["pairs_used"][-1], self._nf_acc,
                     self.gaussians.num_alive))
                self._nf_acc = None
                if int(nf_h) and log:
                    log(f"WARNING: skipped {int(nf_h)} non-finite step(s) "
                        f"since the last log (now at step {self.step})")
                rec = {
                    "step": self.step,
                    "loss": float(loss_h),
                    "psnr": float(psnr_h),
                    "num_gaussians": int(n_alive),
                    "tile_overflow": int(ovf_h),
                    "nonfinite_steps": int(nf_h),
                    "capacity": self.gaussians.capacity,
                    "elapsed_s": time.time() - t0,
                }
                # capacity bucketing piggybacks on this host sync
                if self.auto_capacity:
                    cap = pick_capacity(int(n_alive), self.gaussians.capacity,
                                        self.max_capacity,
                                        minimum=min(1024, self.max_capacity))
                    if cap != self.gaussians.capacity:
                        self.gaussians, self.opt, self.stats = (
                            resize_train_state(self.gaussians, self.opt,
                                               self.stats, new_capacity=cap))
                # render-prefix upkeep piggybacks on the same host sync
                if cfg.train.render_prefix:
                    self._recompact(int(n_alive))
                self._maybe_bump_tile_capacity(int(ovf_h))
                self._maybe_resize_pair_budget(int(pu_h))
                self._maybe_adjust_cover_window(tbw_h)
                self.history.append(rec)
                if log:
                    log(f"step {rec['step']:6d}  loss {rec['loss']:.4f}  "
                        f"psnr {rec['psnr']:.2f}  n {rec['num_gaussians']}")
        return self.history

    def _dump_debug_grid(self):
        """GT | rgb | depth | normal strip for the current camera — the
        analog of the reference's log_images dumps (dn_model.py:908-923)."""
        import numpy as np
        from pathlib import Path
        from PIL import Image

        if self._debug_render is None:
            from fusionsense_tpu.eval.evaluator import make_render_fn

            self._debug_render = make_render_fn(
                self.cfg.model.rasterize, self.camera)
        i = self.step % self.num_views
        out = self._debug_render(self.gaussians, np.int32(i))
        gt = np.asarray(self.data.images[i])
        rgb = np.clip(np.asarray(out.rgb), 0, 1)
        d = np.asarray(out.depth)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        depth = np.stack([d] * 3, -1)
        normal = np.asarray(out.normal) * 0.5 + 0.5
        grid = np.concatenate([gt, rgb, depth, np.clip(normal, 0, 1)], axis=1)
        path = Path(self.image_log_dir)
        path.mkdir(parents=True, exist_ok=True)
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            path / f"step_{self.step:06d}.png")
