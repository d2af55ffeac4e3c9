import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.priors.depth_align import (
    align_depth_gd, scale_and_shift_lstsq,
)


def test_scale_shift_lstsq_exact():
    rng = np.random.RandomState(0)
    mono = jnp.asarray(rng.rand(24, 32).astype(np.float32) + 0.5)
    metric = 2.5 * mono + 0.3
    mask = jnp.ones((24, 32))
    s, t = scale_and_shift_lstsq(mono, metric, mask)
    assert abs(float(s) - 2.5) < 1e-4
    assert abs(float(t) - 0.3) < 1e-4


def test_align_depth_gd_with_outliers():
    rng = np.random.RandomState(1)
    mono = jnp.asarray(rng.rand(24, 32).astype(np.float32) + 0.5)
    metric = np.asarray(1.7 * mono - 0.2)
    # corrupt 5% with large outliers; robust fit should resist
    bad = rng.rand(24, 32) < 0.05
    metric = np.where(bad, 10.0, metric)
    aligned, (s, t) = align_depth_gd(mono, jnp.asarray(metric),
                                     jnp.ones((24, 32)), iters=300)
    assert abs(float(s) - 1.7) < 0.1
    assert abs(float(t) + 0.2) < 0.1


def test_sdf_loss_runs_and_differentiable():
    from fusionsense_tpu.core.cameras import make_camera
    from fusionsense_tpu.data.synthetic import sphere_points
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.gaussians.store import activated
    from fusionsense_tpu.train.sdf_loss import sdf_loss

    pts, rgb, normals = sphere_points(n=300, radius=0.4)
    g = init_from_points(pts, rgb, capacity=512, sh_degree=1,
                         seed_normals=normals, init_opacity=0.9)
    cam = make_camera(jnp.eye(4).at[2, 3].set(1.5), 60.0, 60.0, 32.0, 24.0,
                      64, 48)
    m, q, s, o, c = activated(g)
    depth = jnp.full((48, 64), 1.5)

    def f(means):
        return sdf_loss(jax.random.PRNGKey(0), means, q, s, o, g.alive,
                        depth, cam, n_samples=256)

    val, grad = jax.value_and_grad(f)(m)
    assert np.isfinite(float(val))
    assert jnp.all(jnp.isfinite(grad))
    assert float(jnp.abs(grad).sum()) > 0
