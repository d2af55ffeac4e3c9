"""Bench-config per-stage step breakdown (the probes behind
docs/DESIGN.md §5b/5c). Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py \
        [--backend flat|pallas] [--tile-capacity N]

flat (default) probes the production segmented-pair layout; --backend
pallas reproduces the round-2 dense (T, K) numbers.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.config import (
    ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
)
from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.gaussians.adc import ADCConfig
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.store import activated
from fusionsense_tpu.render.binning import bin_gaussians, flat_bin_gaussians
from fusionsense_tpu.render.project import project_gaussians
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
from fusionsense_tpu.train.trainer import TrainData, Trainer

_ap = argparse.ArgumentParser()
_ap.add_argument("--backend", choices=["flat", "pallas"], default="flat")
_ap.add_argument("--tile-capacity", type=int, default=None,
                 help="per-tile K (pallas) / mean pair budget (flat); "
                      "default 512 flat, 1024 pallas")
_ap.add_argument("--blend-bf16", action="store_true",
                 help="bf16 blend matmuls in the pallas/flat kernels "
                      "(alpha math stays f32)")
_ap.add_argument("--grad-transpose", choices=["scatter", "landing"],
                 default="landing",
                 help="flat backend gradient transpose (landing = the "
                      "production default; scatter = segment-sum over "
                      "gauss_ids, no landing map — measured slower r5)")
_ap.add_argument("--seed-n", type=int, default=30_000,
                 help="seed population (bench flagship ~30k; the scale "
                      "row seeds 150k — pass 150000 with --capacity "
                      "262144 to probe the 100k+-alive regime)")
_ap.add_argument("--capacity", type=int, default=1 << 16,
                 help="padded Gaussian capacity (power-of-two bucket)")
_ap.add_argument("--cover", type=int, default=None,
                 help="force the tile-cover window (pairs per gaussian; "
                      "the trainer policy needs a settled run to pick "
                      "this — pass the bench's settled value, e.g. 9)")
_args = _ap.parse_args()

WIDTH, HEIGHT = 640, 480
CAP = _args.capacity
REPS = 20

_cap0 = _args.tile_capacity or (512 if _args.backend == "flat" else 1024)
rcfg = RasterizeConfig(tile_size=32, tile_capacity=_cap0,
                       max_tiles_per_gaussian=9, tile_chunk=100,
                       sh_degree=3, backend=_args.backend,
                       blend_bf16=_args.blend_bf16,
                       flat_grad_transpose=_args.grad_transpose)
cams = ring_cameras(n_views=9, width=WIDTH, height_px=HEIGHT, focal=550.0)
pts, rgb, normals = sphere_points(n=_args.seed_n, radius=0.5)
g = init_from_points(pts, rgb, capacity=CAP, sh_degree=3,
                     seed_normals=normals, init_opacity=0.95)
cam0 = cams.index(0)
img = jax.jit(lambda: rasterize(*activated(g), cam0, rcfg).rgb)()
d, n, _ = jax.jit(lambda: sphere_depth_normals(cam0))()
data = TrainData(images=jnp.stack([img] * 9),
                 sensor_depths=jnp.stack([d] * 9),
                 normals=jnp.stack([n] * 9))
cfg = ExperimentConfig(
    model=ModelConfig(sh_degree=3, rasterize=rcfg, capacity=CAP,
                      binary_opacities=False),
    train=TrainConfig(iterations=15000, scan_chunk=REPS, adc=ADCConfig()),
    loss=LossConfig())
tr = Trainer(cfg, cams, data, g)
if _args.cover is not None:
    tr.cover_tiles = _args.cover

f = tr._train_chunk
args = (tr.gaussians, tr.opt, tr.cam_state, tr.stats, jnp.int32(600),
        jnp.arange(REPS, dtype=jnp.int32) % 9)
out = f(*args)
jax.block_until_ready(out[0].means)
t0 = time.perf_counter()
out = f(*args)
jax.block_until_ready(out[0].means)
dt = (time.perf_counter() - t0) / REPS * 1e3
print(f"{'full train step (chunk)':42s} {dt:8.3f} ms")

m, q, s, o, c = activated(tr.gaussians)
N = tr.render_n or CAP
m, q, s, o, c = m[:N], q[:N], s[:N], o[:N], c[:N]
print(f"render_n={N} tile_capacity={tr.tile_capacity} "
      f"cover_tiles={tr.cover_tiles}")


def scan_reps(body, *args):
    def fn(*a):
        def step(carry, _):
            r = body(*a, carry * 1e-30)
            return r * 1e-30, r
        _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return outs
    fj = jax.jit(fn)
    jax.block_until_ready(fj(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fj(*args))
    return (time.perf_counter() - t0) / REPS * 1e3


def proj_fwd(m, carry):
    p = project_gaussians(m + carry, q, s, o, cam0, near=rcfg.near,
                          far=rcfg.far, eps2d=rcfg.eps2d)
    return p.mean2d.sum() + p.depth.sum() + p.conic.sum()


print(f"{'projection fwd':42s} {scan_reps(proj_fwd, m):8.3f} ms")

proj = jax.jit(lambda: project_gaussians(
    m, q, s, o, cam0, near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d))()


_T = (-(-WIDTH // rcfg.tile_size)) * (-(-HEIGHT // rcfg.tile_size))


def binning_only(mean2d, radius, depth, carry):
    if rcfg.backend == "flat":
        from fusionsense_tpu.render.binning import auto_expand_budget
        pb = -(-tr.tile_capacity * _T // 128) * 128   # mirror rasterize.py
        want_landing = rcfg.flat_grad_transpose != "scatter"
        b = flat_bin_gaussians(
            mean2d + carry, radius, depth, width=WIDTH, height=HEIGHT,
            tile_size=rcfg.tile_size, pair_budget=pb,
            max_tiles_per_gaussian=tr.cover_tiles,
            compute_landing=want_landing,
            expand_budget=auto_expand_budget(pb, N, tr.cover_tiles))
        acc = b.gauss_ids.sum() + (b.landing.sum() if want_landing else 0)
        return acc.astype(jnp.float32)
    b = bin_gaussians(mean2d + carry, radius, depth, width=WIDTH,
                      height=HEIGHT, tile_size=rcfg.tile_size,
                      tile_capacity=tr.tile_capacity,
                      max_tiles_per_gaussian=tr.cover_tiles)
    return (b.indices.sum() + b.landing.sum()).astype(jnp.float32)


print(f"{'binning (expand+sort+segments+landing)':42s} "
      f"{scan_reps(binning_only, proj.mean2d, proj.radius, proj.depth):8.3f} ms")


import dataclasses as _dc
rcfg_run = _dc.replace(rcfg, tile_capacity=tr.tile_capacity,
                       max_tiles_per_gaussian=tr.cover_tiles)


def raster_fwd(m, carry):
    out = rasterize(m + carry, q, s, o, c, cam0, rcfg_run)
    return out.rgb.sum() + out.depth.sum()


print(f"{'rasterize fwd':42s} {scan_reps(raster_fwd, m):8.3f} ms")


def raster_fb(m, carry):
    def loss(mm):
        out = rasterize(mm, q, s, o, c, cam0, rcfg_run)
        return (out.rgb.sum() + out.depth.sum() + out.normal.sum()
                + out.alpha.sum())
    return jax.grad(loss)(m + carry).sum()


print(f"{'rasterize f+b':42s} {scan_reps(raster_fb, m):8.3f} ms")


# ---- image-space loss stack alone (SSIM + depth + TV + normal), f+b ------
from fusionsense_tpu.train.trainer import compute_losses, loss_terms  # noqa: E402

out0 = jax.jit(lambda: rasterize(m, q, s, o, c, cam0, rcfg_run))()
normals_g0 = jax.jit(
    lambda: jnp.zeros_like(m).at[:, 2].set(1.0))()


def losses_fixed_render(rgb, depth, normal, carry):
    def lf(r, d, n):
        out = out0._replace(rgb=r, depth=d, normal=n)
        total, _ = loss_terms(out, normals_g0, tr.gaussians, cam0, data,
                              jnp.int32(0), jnp.int32(600), cfg,
                              tr.gaussians.alive[:N], render_n=N)
        return total
    gr, gd, gn = jax.grad(lf, argnums=(0, 1, 2))(
        rgb + carry, depth, normal)
    return gr.sum() + gd.sum() + gn.sum()


print(f"{'loss stack on fixed render f+b':42s} "
      f"{scan_reps(losses_fixed_render, out0.rgb, out0.depth, out0.normal):8.3f} ms")


# ---- full compute_losses f+b wrt all params ------------------------------
def full_losses_fb(params, carry):
    def lf(p):
        p = dict(p)
        p["means"] = p["means"] + carry
        g2 = tr.gaussians.replace_params(p)
        total, _ = compute_losses(g2, cams, data, jnp.int32(0),
                                  jnp.int32(600), cfg,
                                  jnp.zeros((N, 2)), render_n=N)
        return total
    grads = jax.grad(lf)(params)
    return sum(v.sum() for v in grads.values())


params0 = tr.gaussians.params()
print(f"{'compute_losses f+b (all params)':42s} "
      f"{scan_reps(full_losses_fb, params0):8.3f} ms")


# ---- optimizer + ADC stats ----------------------------------------------
from fusionsense_tpu.gaussians.adc import accumulate_stats  # noqa: E402
from fusionsense_tpu.train.optim import DEFAULT_GROUPS, adam_step  # noqa: E402


def opt_stats(params, carry):
    grads = {k: v * (1e-30 * (1 + carry)) for k, v in params.items()}
    p2, opt2 = adam_step(params, grads, tr.opt, jnp.int32(600),
                         tr.gaussians.alive, groups=DEFAULT_GROUPS)
    st2 = accumulate_stats(tr.stats, jnp.zeros((CAP, 2)),
                           jnp.zeros((CAP,)), WIDTH, HEIGHT)
    return (sum(v.sum() for v in p2.values()) + st2.grad2d_acc.sum())


print(f"{'adam + stats':42s} {scan_reps(opt_stats, params0):8.3f} ms")


# ---- ADC refine + alive-first compaction (fires every refine_every) ------
from fusionsense_tpu.gaussians.adc import refine  # noqa: E402
from fusionsense_tpu.gaussians.resize import compact_train_state  # noqa: E402


def refine_compact(params, carry):
    g2 = tr.gaussians.replace_params(
        {k: (v + carry if k == "means" else v) for k, v in params.items()})
    g2, o2, st2, _ = refine(g2, tr.opt, tr.stats,
                            jax.random.PRNGKey(0), cfg.train.adc,
                            jnp.int32(600), scene_scale=tr.scene_scale)
    g2, o2, st2 = compact_train_state(g2, o2, st2)
    return g2.means.sum() + o2.m["means"].sum()


_rc_ms = scan_reps(refine_compact, params0)
print(f"{'refine + compact (per firing)':42s} {_rc_ms:8.3f} ms"
      f"   (amortized {_rc_ms / cfg.train.adc.refine_every:6.3f} ms/step)")
