import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.gaussians.adc import init_stats
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from fusionsense_tpu.train.optim import init_adam


def test_checkpoint_roundtrip(tmp_path):
    import jax

    pts = jax.random.normal(jax.random.PRNGKey(0), (20, 3))
    g = init_from_points(pts, jnp.full((20, 3), 0.5), capacity=32, sh_degree=2)
    g = g.replace(frozen=g.frozen.at[3].set(True))
    opt = init_adam(g.params())
    opt.m["means"] = jnp.ones_like(opt.m["means"])
    stats = init_stats(32)
    stats = stats.replace(count=stats.count.at[1].set(7))

    p = tmp_path / "ckpt_100"
    save_checkpoint(p, g, opt, stats, 100, extra={"experiment": "test"})
    g2, opt2, stats2, step = load_checkpoint(p)

    assert step == 100
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means))
    np.testing.assert_array_equal(np.asarray(g2.alive), np.asarray(g.alive))
    assert bool(np.asarray(g2.frozen)[3])
    np.testing.assert_allclose(np.asarray(opt2.m["means"]), 1.0)
    assert int(np.asarray(stats2.count)[1]) == 7
    assert (tmp_path / "ckpt_100.meta.json").exists()


def test_splat_ply_roundtrip(tmp_path):
    import jax

    from fusionsense_tpu.gaussians.io import export_splat_ply, import_splat_ply

    pts = jax.random.normal(jax.random.PRNGKey(0), (30, 3))
    g = init_from_points(pts, jnp.full((30, 3), 0.6), capacity=64, sh_degree=2)
    n = export_splat_ply(tmp_path / "splat.ply", g)
    assert n == 30
    g2 = import_splat_ply(tmp_path / "splat.ply")
    assert int(g2.num_alive) == 30
    a1, a2 = np.asarray(g.alive), np.asarray(g2.alive)
    np.testing.assert_allclose(np.asarray(g2.means)[a2],
                               np.asarray(g.means)[a1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.features_rest)[a2],
                               np.asarray(g.features_rest)[a1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.log_scales)[a2],
                               np.asarray(g.log_scales)[a1], atol=1e-6)


def _mini_trainer(backend="flat", camera_opt=True):
    import jax
    from fusionsense_tpu.config import (
        ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from fusionsense_tpu.data.synthetic import (
        ring_cameras, sphere_depth_normals, sphere_points,
    )
    from fusionsense_tpu.render.rasterize import RasterizeConfig
    from fusionsense_tpu.train.trainer import TrainData, Trainer

    cams = ring_cameras(n_views=3, width=64, height_px=48, focal=60.0)
    pts, rgb, normals = sphere_points(n=120, radius=0.5)
    g = init_from_points(pts, rgb, capacity=256, sh_degree=1,
                         seed_normals=normals)
    deps, nms = [], []
    for i in range(3):
        d, n, _ = sphere_depth_normals(cams.index(i))
        deps.append(d)
        nms.append(n)
    data = TrainData(images=jnp.zeros((3, 48, 64, 3)) + 0.4,
                     sensor_depths=jnp.stack(deps), normals=jnp.stack(nms))
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=4, tile_chunk=10,
                           sh_degree=1, backend=backend)
    cfg = ExperimentConfig(
        model=ModelConfig(sh_degree=1, rasterize=rcfg, capacity=256),
        train=TrainConfig(iterations=40, scan_chunk=10, log_every=10,
                          camera_opt=camera_opt),
        loss=LossConfig(sensor_depth_lambda=0.1))
    return Trainer(cfg, cams, data, g), cams, data


def test_trainer_resume_roundtrip(tmp_path):
    """Mid-run resume restores step, camera-optimizer state, and the
    adaptive policy state, and training continues (reference resumes via
    nerfstudio load_dir/eval_setup with its camera optimizer inside the
    pipeline state)."""
    tr, cams, data = _mini_trainer()
    tr.run(iterations=20, log=None)
    # make the adaptive + camera state visibly non-default
    tr.tile_capacity = 192
    tr.cover_tiles = 9
    deltas, cam_opt = tr.cam_state
    tr.cam_state = (deltas + 1e-3, cam_opt)
    tr.save(tmp_path / "ckpt_mid")

    tr2, _, _ = _mini_trainer()
    tr2.restore(tmp_path / "ckpt_mid")
    assert tr2.step == tr.step == 20
    assert tr2.tile_capacity == 192
    assert tr2.cover_tiles == 9
    np.testing.assert_allclose(np.asarray(tr2.cam_state[0]),
                               np.asarray(tr.cam_state[0]))
    np.testing.assert_allclose(np.asarray(tr2.gaussians.means),
                               np.asarray(tr.gaussians.means))
    np.testing.assert_allclose(np.asarray(tr2.opt.m["means"]),
                               np.asarray(tr.opt.m["means"]))
    # continue training from the restored state
    tr2.run(iterations=40, log=None)
    assert tr2.step == 40
    assert np.isfinite(tr2.history[-1]["loss"])


def test_trainer_resume_rejects_mismatched_views(tmp_path):
    tr, _, _ = _mini_trainer()
    tr.run(iterations=10, log=None)
    tr.save(tmp_path / "ckpt")

    import dataclasses as _dc

    tr2, cams, data = _mini_trainer()
    tr2.num_views = 5   # simulate a different scene
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        tr2.restore(tmp_path / "ckpt")


def test_load_for_inference_rebinarizes(tmp_path):
    """A binary-opacities checkpoint whose logits were saved un-snapped
    (reset-margin window, or older forward-time-STE code) must come back
    binarized for eval/mesh/render — the reference re-applies its logit
    surgery in get_outputs even at eval (dn_model.py:493-503)."""
    import numpy as np

    from fusionsense_tpu.train.checkpoint import load_for_inference

    tr, _, _ = _mini_trainer()          # default config: binary_opacities on
    assert tr.cfg.model.binary_opacities
    mid = jnp.linspace(-2.0, 2.0, tr.gaussians.capacity)
    tr.gaussians = tr.gaussians.replace(logit_opacities=mid)
    tr.save(tmp_path / "ckpt")

    g, step, _ = load_for_inference(tmp_path / "ckpt")
    logits = np.asarray(g.logit_opacities)
    thr = tr.cfg.model.binary_opacity_threshold
    assert set(np.unique(logits)) <= {0.0, 1.0}
    np.testing.assert_array_equal(logits, (np.asarray(mid) >= thr).astype(np.float32))

    # and a non-binary run round-trips logits untouched
    import dataclasses as dc
    tr2, _, _ = _mini_trainer()
    tr2.cfg = dc.replace(tr2.cfg, model=dc.replace(tr2.cfg.model,
                                                   binary_opacities=False))
    tr2.gaussians = tr2.gaussians.replace(logit_opacities=mid)
    tr2.save(tmp_path / "ckpt2")
    g2, _, _ = load_for_inference(tmp_path / "ckpt2")
    np.testing.assert_allclose(np.asarray(g2.logit_opacities),
                               np.asarray(mid), atol=1e-6)
