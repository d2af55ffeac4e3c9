"""Multi-device tests on the virtual 8-device CPU mesh."""
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
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.store import activated
from fusionsense_tpu.parallel.mesh import make_mesh
from fusionsense_tpu.parallel.sharded import make_sharded_train_step
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
from fusionsense_tpu.train.optim import init_adam
from fusionsense_tpu.gaussians.adc import init_stats
from fusionsense_tpu.train.trainer import TrainData

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cam_state(n_views):
    return (jnp.zeros((n_views, 6)),
            init_adam({"cam_delta": jnp.zeros((n_views, 6))}))



@pytest.fixture(scope="module")
def scene():
    cams = ring_cameras(n_views=4, width=64, height_px=48, focal=60.0)
    pts, rgb, normals = sphere_points(n=200, radius=0.5)
    gt = init_from_points(pts, rgb, capacity=256, sh_degree=1,
                          seed_normals=normals, init_opacity=0.9)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=64,
                           max_tiles_per_gaussian=8, tile_chunk=4, sh_degree=1)
    m, q, s, o, c = activated(gt)
    imgs, deps, nms = [], [], []
    for i in range(4):
        out = rasterize(m, q, s, o, c, cams.index(i), rcfg)
        imgs.append(out.rgb)
        d, n, _ = sphere_depth_normals(cams.index(i))
        deps.append(d)
        nms.append(n)
    data = TrainData(images=jnp.stack(imgs), sensor_depths=jnp.stack(deps),
                     normals=jnp.stack(nms))
    return cams, data, rcfg


def make_cfg(rcfg):
    return ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=256,
                          binary_opacities=False),
        train=TrainConfig(iterations=10, scan_chunk=5),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                        smooth_lambda=0.01, flatness_lambda=0.01),
    )


def test_sharded_step_runs_and_reduces(scene):
    cams, data, rcfg = scene
    cfg = make_cfg(rcfg)
    mesh = make_mesh(8, data=4, tile=2)
    pts, rgb, _ = sphere_points(n=100, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    step_fn = make_sharded_train_step(cfg, cams, data, mesh)
    cam_indices = jnp.arange(4, dtype=jnp.int32)
    g2, opt2, _, stats2, metrics = step_fn(
        g, opt, _cam_state(4), stats, jnp.asarray(0), cam_indices)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(g2.means[:100]), np.asarray(g.means[:100]))
    assert float(stats2.count.sum()) > 0


def test_sharded_matches_single_device_grads(scene):
    """DP x tile sharding must produce the same update as a single-device
    batch-mean step (up to float tolerance)."""
    cams, data, rcfg = scene
    cfg = make_cfg(rcfg)
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.arange(4, dtype=jnp.int32)

    mesh = make_mesh(8, data=4, tile=2)
    step_fn = make_sharded_train_step(cfg, cams, data, mesh)
    g_sh, opt_sh, _, _, m_sh = step_fn(g, opt, _cam_state(4), stats,
                                       jnp.asarray(0), cam_indices)

    # single-device reference: mean of per-camera grads
    from fusionsense_tpu.train.trainer import compute_losses
    from fusionsense_tpu.train.optim import adam_step

    def loss_one(params, tap, i):
        gg = g.replace(**params)
        total, _ = compute_losses(gg, cams, data, i, jnp.asarray(0), cfg, tap)
        return total

    tap0 = jnp.zeros((256, 2))
    grads = None
    for i in range(4):
        gi = jax.grad(loss_one)(g.params(), tap0, jnp.asarray(i))
        grads = gi if grads is None else jax.tree.map(jnp.add, grads, gi)
    grads = jax.tree.map(lambda x: x / 4.0, grads)
    params_ref, opt_ref = adam_step(g.params(), grads, opt, jnp.asarray(0),
                                    g.alive)

    np.testing.assert_allclose(np.asarray(g_sh.means), np.asarray(params_ref["means"]),
                               atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_sh.features_dc),
                               np.asarray(params_ref["features_dc"]),
                               atol=2e-5, rtol=1e-3)
    # moments validate the gradient SCALE (the Adam direction at t=1 is
    # scale-invariant, so the param comparison alone would not catch a
    # constant-factor gradient error)
    np.testing.assert_allclose(np.asarray(opt_sh.m["means"]),
                               np.asarray(opt_ref.m["means"]),
                               atol=2e-5, rtol=1e-3)


def test_zero1_sharded_optimizer_matches(scene):
    """ZeRO-1 sharded optimizer state produces the same update as the
    replicated path."""
    cams, data, rcfg = scene
    cfg = make_cfg(rcfg)
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.arange(4, dtype=jnp.int32)
    mesh = make_mesh(8, data=4, tile=2)

    step_rep = make_sharded_train_step(cfg, cams, data, mesh)
    g_rep, opt_rep, _, _, _ = step_rep(g, opt, _cam_state(4), stats,
                                       jnp.asarray(0), cam_indices)

    step_z1 = make_sharded_train_step(cfg, cams, data, mesh,
                                      shard_optimizer=True)
    g_z1, opt_z1, _, _, _ = step_z1(g, opt, _cam_state(4), stats,
                                    jnp.asarray(0), cam_indices)

    np.testing.assert_allclose(np.asarray(g_z1.means), np.asarray(g_rep.means),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_z1.features_dc),
                               np.asarray(g_rep.features_dc),
                               atol=3e-5, rtol=1e-3)
    # moments live sharded but concatenate back to the replicated values
    np.testing.assert_allclose(np.asarray(opt_z1.m["means"]),
                               np.asarray(opt_rep.m["means"]),
                               atol=3e-5, rtol=1e-3)


@pytest.mark.slow   # ~2 min; fast coverage: grads-parity test + driver dryrun_multichip
def test_sharded_trainer_end_to_end_matches_single_device(scene):
    """Full multi-chip training (chunked scan + ADC refine + ZeRO-1 under
    the mesh) reaches single-device PSNR (VERDICT round-1 item 5; reference
    DDP behavior dn_splatter/dn_pipeline.py:161-167)."""
    from fusionsense_tpu.gaussians.adc import ADCConfig
    from fusionsense_tpu.parallel.trainer import ShardedTrainer
    from fusionsense_tpu.train.trainer import Trainer

    cams, data, rcfg = scene
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=512,
                          binary_opacities=False),
        train=TrainConfig(iterations=500, scan_chunk=50, log_every=100,
                          auto_capacity=False,
                          adc=ADCConfig(warmup=100, refine_every=100,
                                        stop_split_at=400,
                                        reset_alpha_every=10_000)),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                        smooth_lambda=0.01, flatness_lambda=0.01),
    )
    key = jax.random.PRNGKey(3)
    pts, rgb, _ = sphere_points(n=150, radius=0.5)
    pts = pts + 0.03 * jax.random.normal(key, pts.shape)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=512,
                            sh_degree=1)

    mesh = make_mesh(8, data=4, tile=2)
    st = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True)
    hist_sh = st.run(log=None)

    tr = Trainer(cfg, cams, data, init)
    hist_1 = tr.run(log=None)

    psnr_sh = hist_sh[-1]["psnr"]
    psnr_1 = hist_1[-1]["psnr"]
    assert np.isfinite(psnr_sh) and np.isfinite(psnr_1)
    assert psnr_sh > psnr_1 - 0.2, (
        f"multi-chip trainer lags single-device: {psnr_sh} vs {psnr_1}")
    # refinement ran under the mesh and changed the population
    assert int(st.gaussians.num_alive) != 150


def test_gauss_depth_sliced_matches_single_device(scene):
    """data x tile x gauss (2x2x2) depth-sliced sharding reproduces the
    single-device update and gradient scale exactly (the compositing
    decomposition across depth slices is an identity, not an approximation)."""
    cams, data, rcfg = scene
    cfg = make_cfg(rcfg)
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.arange(2, dtype=jnp.int32)

    mesh = make_mesh(8, data=2, tile=2, gauss=2)
    step_fn = make_sharded_train_step(cfg, cams, data, mesh)
    g_sh, opt_sh, _, _, m_sh = step_fn(g, opt, _cam_state(4), stats,
                                       jnp.asarray(0), cam_indices)

    from fusionsense_tpu.train.trainer import compute_losses
    from fusionsense_tpu.train.optim import adam_step

    def loss_one(params, tap, i):
        gg = g.replace(**params)
        total, _ = compute_losses(gg, cams, data, i, jnp.asarray(0), cfg, tap)
        return total

    tap0 = jnp.zeros((256, 2))
    grads = None
    for i in range(2):
        gi = jax.grad(loss_one)(g.params(), tap0, jnp.asarray(i))
        grads = gi if grads is None else jax.tree.map(jnp.add, grads, gi)
    grads = jax.tree.map(lambda x: x / 2.0, grads)
    params_ref, opt_ref = adam_step(g.params(), grads, opt, jnp.asarray(0),
                                    g.alive)

    # atol covers fp association-order noise in the merged alpha, which the
    # ED depth normalization (depth/alpha) amplifies at low-alpha pixels;
    # the slice decomposition itself is exact in exact arithmetic
    np.testing.assert_allclose(np.asarray(g_sh.means),
                               np.asarray(params_ref["means"]),
                               atol=4e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(opt_sh.m["means"]),
                               np.asarray(opt_ref.m["means"]),
                               atol=4e-4, rtol=2e-3)


@pytest.mark.slow   # ~3 min; the fast suite covers the pieces separately
def test_sharded_trainer_touch_anchoring_matches_single_device(scene):
    """Module 3 (tactile fusion) runs multi-chip: a touch-add callback under
    the mesh anchors frozen Gaussians mid-training and the run stays within
    0.2 dB of the identical single-device run (VERDICT round-2 directive #2;
    reference behavior dn_splatter/dn_model.py:1156-1247 add_touch_patch)."""
    from fusionsense_tpu.data.tactile import TouchPatch
    from fusionsense_tpu.gaussians.adc import ADCConfig
    from fusionsense_tpu.gaussians.touch import add_touch_patches, touch_prune
    from fusionsense_tpu.parallel.trainer import ShardedTrainer
    from fusionsense_tpu.train.trainer import Trainer

    cams, data, rcfg = scene
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=512,
                          binary_opacities=False),
        train=TrainConfig(iterations=300, scan_chunk=50, log_every=100,
                          auto_capacity=False, add_touch_at=100,
                          adc=ADCConfig(warmup=100, refine_every=100,
                                        stop_split_at=250,
                                        reset_alpha_every=10_000)),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2,
                        smooth_lambda=0.01, touch_normal_lambda=1.0),
    )
    key = jax.random.PRNGKey(3)
    pts, rgb, _ = sphere_points(n=150, radius=0.5)
    pts = pts + 0.03 * jax.random.normal(key, pts.shape)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=512,
                            sh_degree=1)

    # tactile patch on the sphere surface (world units; gel_scale=1)
    rng = np.random.RandomState(1)
    ppts = (rng.rand(40, 3) - 0.5) * [0.04, 0.04, 0.004] + [0.0, 0.0, 0.5]
    patch = TouchPatch(
        points=ppts.astype(np.float32),
        colors=np.full((40, 3), 0.8, np.float32),
        normals=np.tile([0.0, 0.0, 1.0], (40, 1)).astype(np.float32),
        bbox_center=np.array([0.0, 0.0, 0.5], np.float32),
        bbox_rot=np.eye(3, dtype=np.float32),
        bbox_extent=np.array([0.021, 0.021, 0.003], np.float32),
    )

    def make_touch_cb():
        state = {"added": False, "boxes": None}

        def cb(tr):
            if not state["added"] and tr.step >= cfg.train.add_touch_at:
                tr.gaussians, tr.opt, state["boxes"] = add_touch_patches(
                    tr.gaussians, tr.opt, [patch], gel_scale=1.0,
                    scene_scale=1.0)
                state["added"] = True
                return True
            if state["added"]:
                tr.gaussians = touch_prune(tr.gaussians, state["boxes"])
                return True
            return False

        return cb

    mesh = make_mesh(8, data=4, tile=2)
    st = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True,
                        extra_callbacks=[make_touch_cb()])
    hist_sh = st.run(log=None)

    tr = Trainer(cfg, cams, data, init, extra_callbacks=[make_touch_cb()])
    hist_1 = tr.run(log=None)

    # anchored Gaussians present and frozen in the sharded run
    assert int(jnp.sum(st.gaussians.frozen)) == 40
    frozen_ops = jax.nn.sigmoid(
        st.gaussians.logit_opacities[st.gaussians.frozen])
    assert float(frozen_ops.min()) > 0.99

    psnr_sh = hist_sh[-1]["psnr"]
    psnr_1 = hist_1[-1]["psnr"]
    assert np.isfinite(psnr_sh) and np.isfinite(psnr_1)
    assert psnr_sh > psnr_1 - 0.2, (
        f"multi-chip touch run lags single-device: {psnr_sh} vs {psnr_1}")


def test_sharded_pallas_backend_matches_jax_backend(scene):
    """The multi-chip step with the pallas compositor (local tile block +
    global tile ids, interpret mode on the CPU mesh) reproduces the XLA
    compositor's update (VERDICT round-2 missing item #2)."""
    import dataclasses

    cams, data, rcfg = scene
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.arange(4, dtype=jnp.int32)
    mesh = make_mesh(8, data=4, tile=2)

    cfg_jax = make_cfg(rcfg)
    step_jax = make_sharded_train_step(cfg_jax, cams, data, mesh)
    g_j, opt_j, _, _, m_j = step_jax(g, opt, _cam_state(4), stats,
                                     jnp.asarray(0), cam_indices)

    rp = dataclasses.replace(rcfg, backend="pallas", pallas_chunk=64)
    cfg_pl = make_cfg(rp)
    step_pl = make_sharded_train_step(cfg_pl, cams, data, mesh)
    g_p, opt_p, _, _, m_p = step_pl(g, opt, _cam_state(4), stats,
                                    jnp.asarray(0), cam_indices)

    assert np.isfinite(float(m_p["loss"]))
    np.testing.assert_allclose(float(m_p["loss"]), float(m_j["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p.means), np.asarray(g_j.means),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(opt_p.m["means"]),
                               np.asarray(opt_j.m["means"]),
                               atol=3e-5, rtol=1e-3)
    assert "overflow" in m_p


def test_sharded_flat_backend_matches_jax_backend(scene):
    """The multi-chip step with the FLAT segmented compositor (per-shard
    local tile block, local landing map, global tile ids for pixel coords)
    reproduces the XLA compositor's update."""
    import dataclasses

    cams, data, rcfg = scene
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.arange(4, dtype=jnp.int32)
    mesh = make_mesh(8, data=4, tile=2)

    # jax baseline at K=256 so the per-tile keep-nearest cap never drops —
    # the flat layout has no per-tile cap, so parity needs a drop-free ref
    cfg_jax = make_cfg(dataclasses.replace(rcfg, tile_capacity=256))
    step_jax = make_sharded_train_step(cfg_jax, cams, data, mesh)
    g_j, opt_j, _, _, m_j = step_jax(g, opt, _cam_state(4), stats,
                                     jnp.asarray(0), cam_indices)

    rf = dataclasses.replace(rcfg, backend="flat", pallas_chunk=64,
                             tile_capacity=128)
    cfg_fl = make_cfg(rf)
    step_fl = make_sharded_train_step(cfg_fl, cams, data, mesh)
    g_f, opt_f, _, _, m_f = step_fl(g, opt, _cam_state(4), stats,
                                    jnp.asarray(0), cam_indices)

    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(float(m_f["loss"]), float(m_j["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f.means), np.asarray(g_j.means),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(opt_f.m["means"]),
                               np.asarray(opt_j.m["means"]),
                               atol=3e-5, rtol=1e-3)


def test_sharded_trainer_save_restore_roundtrip(scene, tmp_path):
    """Mid-run multi-chip checkpoint restores (incl. ZeRO-1 re-pinning)
    and training continues; the format is shared with Trainer.save so a
    run can move between single- and multi-chip."""
    from fusionsense_tpu.parallel.trainer import ShardedTrainer

    cams, data, rcfg = scene
    cfg = make_cfg(rcfg)
    pts, rgb, _ = sphere_points(n=100, radius=0.5)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=256,
                            sh_degree=1)
    mesh = make_mesh(8, data=4, tile=2)

    st = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True)
    st.run(iterations=5, log=None)
    st.save(tmp_path / "ckpt_sh")

    st2 = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True)
    st2.restore(tmp_path / "ckpt_sh")
    assert st2.step == 5
    np.testing.assert_allclose(np.asarray(st2.gaussians.means),
                               np.asarray(st.gaussians.means))
    st2.run(iterations=10, log=None)
    assert st2.step == 10
    assert np.isfinite(st2.history[-1]["loss"])

    # cross-path: the single-device Trainer restores the same file
    from fusionsense_tpu.train.trainer import Trainer

    tr = Trainer(cfg, cams, data, init)
    tr.restore(tmp_path / "ckpt_sh")
    assert tr.step == 5
    tr.run(iterations=10, log=None)
    assert np.isfinite(tr.history[-1]["loss"])


def test_sharded_render_prefix_matches_single_device(scene, tmp_path):
    """The multi-chip render-prefix path (alive-first compaction + sliced
    rasterization population under the mesh): a capacity-2048 store with
    ~200 alive must pick a 1024 bucket, actually slice, and track the
    single-device prefix trainer."""
    from fusionsense_tpu.parallel.trainer import ShardedTrainer
    from fusionsense_tpu.train.trainer import Trainer

    cams, data, rcfg = scene
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=2048,
                          binary_opacities=False),
        train=TrainConfig(iterations=40, scan_chunk=20, log_every=20,
                          auto_capacity=False, render_prefix=True),
        loss=LossConfig(normal_lambda=0.1, sensor_depth_lambda=0.2),
    )
    pts, rgb, _ = sphere_points(n=200, radius=0.5)
    init = init_from_points(pts, jnp.full_like(rgb, 0.5), capacity=2048,
                            sh_degree=1)

    mesh = make_mesh(8, data=2, tile=2, gauss=2)
    st = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True)
    assert st.render_n == 1024, st.render_n      # prefix genuinely < capacity
    hist_sh = st.run(log=None)

    tr = Trainer(cfg, cams, data, init)
    assert tr.render_n == 1024
    hist_1 = tr.run(log=None)

    psnr_sh, psnr_1 = hist_sh[-1]["psnr"], hist_1[-1]["psnr"]
    assert np.isfinite(psnr_sh) and np.isfinite(psnr_1)
    assert psnr_sh > psnr_1 - 0.2, (psnr_sh, psnr_1)
    # checkpoint round-trips through the prefix path too
    st.save(tmp_path / "ckpt_rp")
    st2 = ShardedTrainer(cfg, cams, data, init, mesh, shard_optimizer=True)
    st2.restore(tmp_path / "ckpt_rp")
    assert st2.render_n == 1024


def test_sharded_flat_absgrad_stats_match_single_device(scene):
    """Multi-chip densification feeds on absgrad too (VERDICT r3 weak #1:
    the sharded step used to differentiate only (params, tap, deltas), so
    the flat/pallas abs taps never reached RefineStats). A data=1 x tile=4
    x gauss=2 flat-backend sharded step must reproduce the single-device
    flat trainer chunk's grad2d_acc."""
    import dataclasses

    from fusionsense_tpu.train.trainer import make_train_chunk

    cams, data, rcfg = scene
    rf = dataclasses.replace(rcfg, backend="flat", pallas_chunk=64,
                             tile_capacity=128)
    cfg = make_cfg(rf)
    pts, rgb, _ = sphere_points(n=80, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1)
    opt = init_adam(g.params())
    stats = init_stats(256)
    cam_indices = jnp.zeros((1,), jnp.int32)

    mesh = make_mesh(8, data=1, tile=4, gauss=2)
    step_fn = make_sharded_train_step(cfg, cams, data, mesh)
    _, _, _, stats_sh, _ = step_fn(g, opt, _cam_state(4), stats,
                                   jnp.asarray(0), cam_indices)

    chunk = make_train_chunk(cfg, cams, data)
    _, _, _, stats_1, _ = chunk(g, opt, _cam_state(4), stats,
                                jnp.asarray(0), cam_indices)

    assert float(jnp.sum(stats_sh.grad2d_acc)) > 0
    np.testing.assert_allclose(np.asarray(stats_sh.grad2d_acc),
                               np.asarray(stats_1.grad2d_acc),
                               atol=1e-5, rtol=2e-2)
