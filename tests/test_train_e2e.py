"""End-to-end mini training: fit the synthetic sphere from ring views.

The CPU analog of the reference's pixi smoke chain (SURVEY.md §4): a small
scene must train to improving PSNR with densification active.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.config import (
    ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
)
from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.gaussians.adc import ADCConfig
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
from fusionsense_tpu.train.trainer import TrainData, Trainer
from fusionsense_tpu.gaussians.store import activated


@pytest.fixture(scope="module")
def fixture_scene():
    """GT gaussians on a sphere; images rendered by the rasterizer itself."""
    cams = ring_cameras(n_views=4, width=64, height_px=48, focal=60.0)
    pts, rgb, normals = sphere_points(n=400, radius=0.5)
    gt = init_from_points(pts, rgb, capacity=512, sh_degree=1,
                          seed_normals=normals, init_opacity=0.95)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=8, tile_chunk=12, sh_degree=1)
    means, quats, scales, op, colors = activated(gt)
    images, depths, normal_maps, masks = [], [], [], []
    for i in range(4):
        out = rasterize(means, quats, scales, op, colors, cams.index(i), rcfg)
        images.append(out.rgb)
        d, n, m = sphere_depth_normals(cams.index(i))
        depths.append(d)
        normal_maps.append(n)
        masks.append(m)
    data = TrainData(
        images=jnp.stack(images),
        sensor_depths=jnp.stack(depths),
        normals=jnp.stack(normal_maps),
        masks=None,
    )
    return cams, data, rcfg


def test_training_improves_psnr(fixture_scene):
    cams, data, rcfg = fixture_scene
    # init from noisy sparse points
    key = jax.random.PRNGKey(0)
    pts, rgb, normals = sphere_points(n=150, radius=0.5)
    pts = pts + 0.05 * jax.random.normal(key, pts.shape)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=1024,
                            sh_degree=1)

    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=1024,
                          binary_opacities=False, sh_degree_interval=50),
        train=TrainConfig(
            iterations=200, scan_chunk=50,
            adc=ADCConfig(warmup=50, refine_every=50, stop_split_at=280,
                          reset_alpha_every=1000),
        ),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                        smooth_lambda=0.01, flatness_lambda=0.01),
    )
    # PSNR of the raw initialization on view 0 (before any training)
    m, q, s, o, c = activated(init)
    rgb0 = rasterize(m, q, s, o, c, cams.index(0), rcfg).rgb
    psnr_init = float(-10 * jnp.log10(jnp.mean((rgb0 - data.images[0]) ** 2) + 1e-10))

    # short-schedule test: disable the 10-step color grad accumulation and
    # speed up color learning (defaults are tuned for 15k-step runs)
    import dataclasses as dc
    from fusionsense_tpu.train.optim import DEFAULT_GROUPS, GroupSpec

    groups = dict(DEFAULT_GROUPS)
    groups["features_dc"] = GroupSpec(2.5e-2)
    groups["features_rest"] = GroupSpec(2.5e-3)
    tr = Trainer(cfg, cams, data, init, adam_groups=groups)
    hist = tr.run(log=None)
    psnr1 = hist[-1]["psnr"]
    assert psnr1 > psnr_init + 2.0, f"PSNR did not improve: {psnr_init} -> {psnr1}"
    assert np.isfinite(hist[-1]["loss"])


def test_trainer_refine_changes_population(fixture_scene):
    cams, data, rcfg = fixture_scene
    pts, rgb, normals = sphere_points(n=100, radius=0.5)
    init = init_from_points(pts, rgb, capacity=512, sh_degree=1)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=512,
                          binary_opacities=False),
        train=TrainConfig(iterations=60, scan_chunk=20,
                          adc=ADCConfig(warmup=20, refine_every=20,
                                        stop_split_at=60,
                                        densify_grad_thresh=1e-6,
                                        cull_alpha_thresh=0.01)),
        loss=LossConfig(normal_lambda=0.0, sensor_depth_lambda=0.0,
                        smooth_lambda=0.0, flatness_lambda=0.0),
    )
    tr = Trainer(cfg, cams, data, init)
    tr.run(log=None)
    # with a tiny grad threshold, densification must have added Gaussians
    assert int(tr.gaussians.num_alive) > 100


def test_camera_opt_recovers_pose_noise(fixture_scene):
    """With camera optimization on, training with slightly wrong poses must
    move the deltas away from zero and still reduce loss."""
    import dataclasses as dc

    import jax

    cams, data, rcfg = fixture_scene
    # perturb camera poses
    from fusionsense_tpu.core.transforms import apply_se3_delta

    key = jax.random.PRNGKey(5)
    noise = 0.01 * jax.random.normal(key, (cams.viewmat.shape[0], 6))
    bad_cams = cams.replace(viewmat=apply_se3_delta(cams.viewmat, noise))

    pts, rgb, _ = sphere_points(n=200, radius=0.5)
    init = init_from_points(pts, rgb, capacity=512, sh_degree=1)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=512,
                          binary_opacities=False),
        train=TrainConfig(iterations=60, scan_chunk=20, camera_opt=True,
                          camera_opt_every_k=4, camera_opt_lr=1e-3,
                          adc=ADCConfig(warmup=1000)),
        loss=LossConfig(normal_lambda=0.0, sensor_depth_lambda=0.0,
                        smooth_lambda=0.0, flatness_lambda=0.0),
    )
    tr = Trainer(cfg, bad_cams, data, init)
    hist = tr.run(log=None)
    deltas = np.asarray(tr.cam_state[0])
    assert np.abs(deltas).max() > 1e-5, "camera deltas never moved"
    assert np.isfinite(hist[-1]["loss"])
    # the learned deltas must actually improve camera alignment: the
    # corrected viewmats should be closer to the true ones than the
    # perturbed viewmats were
    corrected = apply_se3_delta(bad_cams.viewmat, jnp.asarray(deltas))
    err_before = float(jnp.linalg.norm(bad_cams.viewmat - cams.viewmat))
    err_after = float(jnp.linalg.norm(corrected - cams.viewmat))
    assert err_after < err_before, (
        f"pose error grew: {err_before:.5f} -> {err_after:.5f}")


def test_nonfinite_step_guard():
    """A NaN-poisoned training view must not poison the parameters: the
    chunk skips the whole update for non-finite steps (params, Adam
    moments, camera deltas, densify taps) and reports a counter.
    Beyond-reference failure handling — SURVEY.md §5 records the
    reference has none (a NaN loss poisons its run permanently)."""
    import jax
    import jax.numpy as jnp

    from fusionsense_tpu.config import (
        ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from fusionsense_tpu.data.synthetic import (
        ring_cameras, sphere_depth_normals, sphere_points,
    )
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.render.rasterize import RasterizeConfig
    from fusionsense_tpu.train.trainer import TrainData, Trainer

    cams = ring_cameras(n_views=2, width=64, height_px=48, focal=60.0)
    pts, rgb, normals = sphere_points(n=100, radius=0.5)
    g = init_from_points(pts, rgb, capacity=128, sh_degree=1,
                         seed_normals=normals)
    deps, nms = [], []
    for i in range(2):
        d, n, _ = sphere_depth_normals(cams.index(i))
        deps.append(d)
        nms.append(n)
    imgs = jnp.zeros((2, 48, 64, 3)) + 0.4
    imgs = imgs.at[1].set(jnp.nan)          # view 1 GT is poisoned
    data = TrainData(images=imgs, sensor_depths=jnp.stack(deps),
                     normals=jnp.stack(nms))
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=4, tile_chunk=10,
                           sh_degree=1, backend="flat")
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=128),
        train=TrainConfig(iterations=10, scan_chunk=10, log_every=10,
                          camera_opt=True),
        loss=LossConfig())
    tr = Trainer(cfg, cams, data, g)
    ls0 = np.asarray(tr.gaussians.log_scales).copy()
    tr.run(log=None)

    rec = tr.history[-1]
    assert rec["nonfinite_steps"] == 5, rec      # every other step poisoned
    for k, v in tr.gaussians.params().items():
        assert np.all(np.isfinite(np.asarray(v))), f"NaN leaked into {k}"
    # log_scales is the only every_k=1 group that moves in 10 steps here;
    # the 5 clean steps must still have applied their updates
    ls1 = np.asarray(tr.gaussians.log_scales)
    assert np.abs(ls1 - ls0).max() > 1e-4, "clean steps should still update"
    # skipped steps must not dilute the densification average: visibility
    # counts only accumulate on the 5 clean steps
    assert int(np.asarray(tr.stats.count).max()) == 5, (
        int(np.asarray(tr.stats.count).max()))
    for v in tr.opt.m.values():
        assert np.all(np.isfinite(np.asarray(v))), "NaN in Adam moments"
    assert np.all(np.isfinite(np.asarray(tr.cam_state[0])))


def test_flat_backend_with_adc_and_auto_budget(fixture_scene):
    """The production flat compositor through the full trainer machinery:
    ADC refinement changes the population, render-prefix recompaction
    changes the binning population, and the pair budget resizes from
    telemetry — together, on one run."""
    import dataclasses

    from fusionsense_tpu.gaussians.adc import ADCConfig

    cams, data, rcfg = fixture_scene
    rcfg = dataclasses.replace(rcfg, backend="flat", tile_capacity=64)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=1024,
                          binary_opacities=False),
        train=TrainConfig(iterations=120, scan_chunk=30, log_every=30,
                          adc=ADCConfig(warmup=30, refine_every=30,
                                        stop_split_at=100,
                                        densify_grad_thresh=0.0005,
                                        reset_alpha_every=10_000)),
        loss=LossConfig(normal_lambda=0.05, sensor_depth_lambda=0.1),
    )
    pts, rgb, _ = sphere_points(n=150, radius=0.5)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(np.asarray(pts)
                      + 0.03 * rng.randn(*pts.shape).astype(np.float32))
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=1024,
                            sh_degree=1)
    tr = Trainer(cfg, cams, data, init)
    hist = tr.run(log=None)
    assert hist[-1]["psnr"] > hist[0]["psnr"], (hist[0], hist[-1])
    assert int(tr.gaussians.num_alive) != 150, "ADC never changed population"
    assert hist[-1]["tile_overflow"] == 0
    assert tr.tile_capacity != 64, "budget never resized from telemetry"
    assert hist[-1]["nonfinite_steps"] == 0


def test_flat_pallas_absgrad_stats_parity(fixture_scene):
    """flat- and pallas-backend densification stats agree: both feed
    gsplat-style absgrad (per-tile |d mean2d| summed over tiles) into
    RefineStats.grad2d_acc, matching the reference's absgrad=True
    consumption (dn_splatter/dn_model.py:570-591). Guards against the
    round-3 regression where the flat backend silently fell back to the
    signed summed gradient (VERDICT r3 weak #1)."""
    import dataclasses as dc

    cams, data, rcfg = fixture_scene
    pts, rgb, _ = sphere_points(n=150, radius=0.5)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=256,
                            sh_degree=1)

    def stats_for(backend, tile_capacity):
        r = dc.replace(rcfg, backend=backend, pallas_chunk=64,
                       tile_capacity=tile_capacity)
        cfg = ExperimentConfig(
            model=ModelConfig(sh_degree=1, rasterize=r, capacity=256,
                              binary_opacities=False),
            train=TrainConfig(iterations=1, scan_chunk=1,
                              auto_capacity=False, render_prefix=False),
            loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2),
        )
        tr = Trainer(cfg, cams, data, init)
        tr.run(log=None)
        return tr.stats

    s_flat = stats_for("flat", 128)
    s_pal = stats_for("pallas", 256)
    s_jax = stats_for("jax", 256)
    assert float(jnp.sum(s_flat.grad2d_acc)) > 0
    np.testing.assert_allclose(np.asarray(s_flat.grad2d_acc),
                               np.asarray(s_pal.grad2d_acc),
                               atol=1e-5, rtol=2e-2)
    # abs accumulation dominates the signed-tap ("jax" backend) statistic
    assert bool(jnp.all(s_flat.grad2d_acc >= s_jax.grad2d_acc - 1e-5))


def test_run_fused_matches_run(fixture_scene):
    """The one-dispatch fused-intervals path (bench's tunnel-proof measured
    window) must produce the same trajectory as Trainer.run when the
    adaptive policies are static: same steps, same refine firings, same
    seeds, same on-device compaction."""
    cams, data, rcfg = fixture_scene
    pts, rgb, normals = sphere_points(n=150, radius=0.5)
    init = init_from_points(pts, rgb, capacity=1024, sh_degree=1)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=1024,
                          binary_opacities=False),
        train=TrainConfig(iterations=150, scan_chunk=50, log_every=50,
                          auto_capacity=False, auto_tile_capacity=False,
                          auto_cover_window=False,
                          adc=ADCConfig(warmup=50, refine_every=50,
                                        stop_split_at=150,
                                        densify_grad_thresh=1e-5,
                                        cull_alpha_thresh=0.05)),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                        smooth_lambda=0.0, flatness_lambda=0.01),
    )
    tr_a = Trainer(cfg, cams, data, init)
    tr_a.run(iterations=150, log=None)

    tr_b = Trainer(cfg, cams, data, init)
    ms = tr_b.run_fused(3, interval=50)
    n_alive_b = tr_b.sync_policies(ms)

    assert tr_b.step == tr_a.step == 150
    assert n_alive_b == int(tr_a.gaussians.num_alive)
    # identical trajectories up to float reassociation across programs
    np.testing.assert_allclose(np.asarray(tr_a.gaussians.means),
                               np.asarray(tr_b.gaussians.means),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tr_a.gaussians.alive),
                                  np.asarray(tr_b.gaussians.alive))
    assert abs(tr_a.history[-1]["psnr"] - tr_b.history[-1]["psnr"]) < 0.05


def test_bin_cache_refresh1_matches_per_step_binning(fixture_scene):
    """bin_refresh_steps=1 rebins all views every step from the same
    stop-gradient projection the per-step path uses — trajectories must
    match to float tolerance."""
    import dataclasses as dc

    cams, data, rcfg = fixture_scene
    rcfg_f = dc.replace(rcfg, backend="flat", tile_capacity=64,
                        pallas_chunk=64)
    pts, rgb, normals = sphere_points(n=150, radius=0.5)
    init = init_from_points(pts, rgb, capacity=1024, sh_degree=1)

    def cfg_with(refresh):
        return ExperimentConfig(
            model=ModelConfig(sh_degree=1, rasterize=rcfg_f, capacity=1024,
                              binary_opacities=False),
            train=TrainConfig(iterations=100, scan_chunk=50, log_every=50,
                              auto_capacity=False, auto_tile_capacity=False,
                              auto_cover_window=False,
                              bin_refresh_steps=refresh,
                              adc=ADCConfig(warmup=50, refine_every=50,
                                            stop_split_at=100)),
            loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                            smooth_lambda=0.0, flatness_lambda=0.01),
        )

    tr0 = Trainer(cfg_with(0), cams, data, init)
    tr0.run(iterations=100, log=None)
    tr1 = Trainer(cfg_with(1), cams, data, init)
    tr1.run(iterations=100, log=None)
    np.testing.assert_allclose(np.asarray(tr0.gaussians.means),
                               np.asarray(tr1.gaussians.means),
                               rtol=1e-4, atol=1e-5)
    assert abs(tr0.history[-1]["psnr"] - tr1.history[-1]["psnr"]) < 0.05

    # stale cache (rebin every 9 steps): selection staleness must not
    # break training — PSNR within a small band of the exact path, and
    # the fused-interval program must accept the cached-bins carry too
    tr9 = Trainer(cfg_with(9), cams, data, init)
    ms = tr9.run_fused(2, interval=50)
    tr9.sync_policies(ms)
    assert tr9.step == 100
    assert abs(tr9.history[-1]["psnr"] - tr0.history[-1]["psnr"]) < 1.0
