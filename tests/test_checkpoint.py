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
