"""Benchmark: DN-Splatter training throughput on a 9-view object scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iters/sec", "vs_baseline": N}

Workload mirrors the reference's canonical run (9-view object scene,
full DN loss stack: RGB DSSIM+L1 + edge-aware depth + normal + smoothness +
flatness, densification stats accumulation) at 640x480 with ~100k padded
Gaussian capacity.

Primary comparators (extra.*): `roofline_frac` — the measured step time
against this chip's OWN compositing light-speed (docs/DESIGN.md §5b model:
the flat kernel evaluates pairs_used x tile_size^2 alphas fwd+bwd at ~45
f32 VPU op-equivalents each against the v5e VPU's ~4 T-op/s) — and
`mpix_per_sec_rasterized`. `vs_baseline` stays as a labeled SECONDARY:
10 it/s is a PIPELINE-CLASS anchor — the reference trains 15k iters on
scenes of this class in tens of minutes on one CUDA GPU through
nerfstudio's full loop (two gsplat rasterizer calls + DN losses +
datamanager/callback overhead). A kernel-only H100 gsplat number would be
far higher but compares a bare CUDA kernel on a ~10x-throughput part
against a full training step on one v5e chip (DESIGN.md §5b "anchor
honesty").

Everything is pre-built on host (numpy) and runs as jitted scans — no eager
dispatch in the measured region.

Resilience: run without --once and the wrapper probes the TPU tunnel and
retries with a fresh process on transient backend-init failures (the
round-3 outage turned the round's bench into rc=1; a bounded retry
degrades that to a late number instead).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 10.0
VPU_OPS_PER_ALPHA = 45.0        # transcendentals + conic quadratic + blend
V5E_VPU_OPS_PER_SEC = 4e12      # per-chip f32 op-equivalents

WIDTH, HEIGHT = 640, 480
N_VIEWS = 9
N_SEED = 60_000
CAPACITY = 1 << 17          # 131072 padded slots
CHUNK = 50                  # steps per fused dispatch
MEASURE_CHUNKS = 4


def main():
    import jax

    # persistent compilation cache: on a tunneled TPU a cold chunk compile
    # is 1-5 min; repeat bench runs at the same shapes hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusionsense_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    import jax.numpy as jnp

    from fusionsense_tpu.config import (
        ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from fusionsense_tpu.data.synthetic import (
        ring_cameras, sphere_depth_normals, sphere_points,
    )
    from fusionsense_tpu.gaussians.adc import ADCConfig
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.gaussians.store import activated
    from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
    from fusionsense_tpu.train.trainer import TrainData, Trainer

    # tile 32x32: P=1024 fills the 8x128 VPU tile exactly. Flat segmented
    # backend: tile_capacity is the MEAN pair budget per tile; the trainer
    # resizes it directly from pairs_used telemetry (no per-tile capacity
    # cliff — measured 23.7 -> 13.3 ms/step vs dense K=1536 at bench scale)
    rcfg = RasterizeConfig(tile_size=32, tile_capacity=512,
                           max_tiles_per_gaussian=9, tile_chunk=100,
                           sh_degree=3, backend="flat")
    cams = ring_cameras(n_views=N_VIEWS, width=WIDTH, height_px=HEIGHT,
                        focal=550.0)

    # synthetic 9-view capture of the textured sphere (GT render + analytic
    # depth/normals), built once via jitted calls
    pts, rgb, normals = sphere_points(n=N_SEED, radius=0.5)
    gt = init_from_points(pts, rgb, capacity=CAPACITY, sh_degree=3,
                          seed_normals=normals, init_opacity=0.95)
    m, q, s, o, c = activated(gt)

    # GT renders get their OWN generous pair budget (grown on overflow
    # below): the 60k-point GT model produces ~266k pairs
    import dataclasses

    def gt_render_fn(budget):
        gt_rcfg = dataclasses.replace(rcfg, tile_capacity=budget)
        return jax.jit(
            lambda vm, fx, fy, cx, cy: (lambda out: (out.rgb, out.overflow))(
                rasterize(m, q, s, o, c, cams.index(0).replace(
                    viewmat=vm, fx=fx, fy=fy, cx=cx, cy=cy), gt_rcfg)))

    imgs, deps, nms = [], [], []
    from fusionsense_tpu.data.synthetic import sphere_depth_normals as sdn
    sdn_j = jax.jit(lambda vm, fx, fy, cx, cy: sdn(
        cams.index(0).replace(viewmat=vm, fx=fx, fy=fy, cx=cx, cy=cy)))
    gt_budget, render = 2048, gt_render_fn(2048)
    for i in range(N_VIEWS):
        ci = cams.index(i)
        img, ovf = render(ci.viewmat, ci.fx, ci.fy, ci.cx, ci.cy)
        while int(ovf) > 0 and gt_budget < 16384:
            # flat-budget overflow drops whole trailing tiles — a corrupted
            # GT silently costs ~9 dB on the quality horizon. Grow and
            # retry rather than abort the bench.
            gt_budget *= 2
            render = gt_render_fn(gt_budget)
            img, ovf = render(ci.viewmat, ci.fx, ci.fy, ci.cx, ci.cy)
        if int(ovf) > 0:
            print(f"WARNING: GT view {i} still dropped {int(ovf)} pairs "
                  f"at budget {gt_budget}")
        imgs.append(img)
        d, n, _ = sdn_j(ci.viewmat, ci.fx, ci.fy, ci.cx, ci.cy)
        deps.append(d)
        nms.append(n)
    data = TrainData(images=jnp.stack(imgs), sensor_depths=jnp.stack(deps),
                     normals=jnp.stack(nms))

    # training model: perturbed sparse init
    pts2, rgb2, n2 = sphere_points(n=N_SEED // 2, radius=0.5, seed=1)
    rng = np.random.RandomState(0)
    pts2 = jnp.asarray(np.asarray(pts2) + 0.02 * rng.randn(*pts2.shape).astype(np.float32))
    init = init_from_points(pts2, jnp.full_like(rgb2, 0.5), capacity=CAPACITY,
                            sh_degree=3, seed_normals=n2)

    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=3, rasterize=rcfg, capacity=CAPACITY,
                          binary_opacities=False),
        train=TrainConfig(iterations=15_000, scan_chunk=CHUNK,
                          adc=ADCConfig()),
        loss=LossConfig(),
    )
    tr = Trainer(cfg, cams, data, init)

    # warmup until the compile-relevant trainer state (capacity bucket,
    # render prefix, adaptive tile capacity) stops changing AND the first
    # ADC refine has compiled — a recompile inside the measured window
    # would swamp the step time (a refine compile alone is ~30 s on the
    # tunneled chip)
    adc_cfg = cfg.train.adc
    min_warm = adc_cfg.warmup + 2 * adc_cfg.refine_every
    prev = None
    for _ in range(16):
        tr.run(iterations=tr.step + 2 * CHUNK, log=None)
        state = (tr.gaussians.capacity, tr.render_n, tr.tile_capacity,
                 tr.cover_tiles)
        if state == prev and tr.step >= min_warm:
            break
        prev = state
    jax.block_until_ready(tr.gaussians.means)

    t0 = time.time()
    tr.run(iterations=tr.step + MEASURE_CHUNKS * CHUNK, log=None)
    jax.block_until_ready(tr.gaussians.means)
    dt = time.time() - t0

    steps = MEASURE_CHUNKS * CHUNK
    iters_per_sec = steps / dt
    mpix_per_sec = iters_per_sec * WIDTH * HEIGHT / 1e6

    # chip-own roofline (DESIGN.md §5b): light-speed step = compositing
    # fwd+bwd alpha evaluations only — pairs x P pixels x ~45 ops x 2
    # sweeps at the VPU's ~4 T-op/s. Everything else (binning sort,
    # gathers, losses, Adam) is overhead the design tries to hide.
    pairs = float(tr.tile_capacity) * tr._grid_tiles
    P = rcfg.tile_size ** 2
    light_ms = pairs * P * VPU_OPS_PER_ALPHA * 2 / V5E_VPU_OPS_PER_SEC * 1e3
    step_ms = dt / steps * 1e3
    roofline_frac = light_ms / step_ms

    # quality at a FIXED horizon (3000 steps), so throughput and quality
    # come from the same run/configuration (VERDICT r2: no split-brained
    # bench) — the auto-K/window policies have settled by the measured
    # window, and the same trainer keeps going to the ledger horizon
    tr.run(iterations=3000, log=None)
    psnr_3000 = tr.history[-1]["psnr"] if tr.step >= 3000 else None

    print(json.dumps({
        "metric": "train_iters_per_sec_9view_640x480_dn_splatter",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
        "extra": {
            # primary comparators (vs_baseline is a labeled secondary:
            # pipeline-class 10 it/s anchor, see module docstring)
            "roofline_frac": round(roofline_frac, 3),
            "kernel_light_speed_ms": round(light_ms, 2),
            "step_ms": round(step_ms, 2),
            "vs_baseline_kind": "pipeline-class 10 it/s anchor (secondary)",
            "mpix_per_sec_rasterized": round(mpix_per_sec, 2),
            "num_gaussians": int(tr.gaussians.num_alive),
            "capacity": tr.gaussians.capacity,
            "render_n": tr.render_n,
            "tile_capacity": tr.tile_capacity,
            "cover_tiles": tr.cover_tiles,
            "measured_steps": steps,
            "psnr_3000": psnr_3000,
            "psnr_last": tr.history[-1]["psnr"] if tr.history else None,
            "tile_overflow_last": (tr.history[-1].get("tile_overflow")
                                   if tr.history else None),
        },
    }))


def _probe_tunnel(timeout_s: int = 120) -> bool:
    """Can a fresh process see a jax backend? (A wedged axon tunnel hangs
    at first device query, so the probe needs a hard timeout.)"""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main_with_retry(budget_s: float = 2400.0, bench_timeout_s: int = 3000):
    """Bounded retry-with-reinit: a transient tunnel outage degrades to a
    late number instead of an empty round. Each attempt is a FRESH process
    (a failed backend init poisons the in-process jax client), gated by a
    cheap device probe."""
    import subprocess
    import sys

    t0 = time.time()
    last_err = "no attempt ran"
    attempt = 0
    while True:
        attempt += 1
        if _probe_tunnel():
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--once"],
                    timeout=bench_timeout_s, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                last_err = f"attempt {attempt}: bench timed out"
            else:
                if r.returncode == 0:
                    sys.stdout.write(r.stdout)
                    return 0
                last_err = (f"attempt {attempt}: rc={r.returncode}: "
                            + r.stderr.strip().splitlines()[-1][:300]
                            if r.stderr.strip() else
                            f"attempt {attempt}: rc={r.returncode}")
        else:
            last_err = f"attempt {attempt}: device probe failed (tunnel down)"
        if time.time() - t0 > budget_s:
            print(f"bench failed after {attempt} attempt(s): {last_err}",
                  file=sys.stderr)
            return 1
        print(f"{last_err}; retrying in 240s", file=sys.stderr)
        time.sleep(240)


if __name__ == "__main__":
    import sys

    if "--once" in sys.argv:
        main()
    else:
        sys.exit(main_with_retry())
