"""Baseline hash-grid NeRF: trains on the synthetic sphere fixture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.baselines.nerf import (
    NerfConfig, init_params, make_train_step, render_image, render_rays,
)
from fusionsense_tpu.data.synthetic import (
    ring_cameras, sphere_depth_normals, sphere_points,
)
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.store import activated
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize


@pytest.fixture(scope="module")
def nerf_scene():
    cams = ring_cameras(n_views=6, width=48, height_px=36, focal=45.0)
    pts, rgb, normals = sphere_points(n=500, radius=0.4)
    gt = init_from_points(pts, rgb, capacity=1024, sh_degree=1,
                          seed_normals=normals, init_opacity=0.95)
    rcfg = RasterizeConfig(tile_size=16, tile_capacity=128,
                           max_tiles_per_gaussian=8, tile_chunk=8, sh_degree=1)
    m, q, s, o, c = activated(gt)
    imgs, deps = [], []
    for i in range(6):
        imgs.append(rasterize(m, q, s, o, c, cams.index(i), rcfg).rgb)
        d, _, _ = sphere_depth_normals(cams.index(i), radius=0.4)
        # euclidean ray depth targets (z-depth / cos is approximated by
        # z-depth for the narrow FOV here)
        deps.append(d)
    return cams, jnp.stack(imgs), jnp.stack(deps)


@pytest.mark.slow   # multi-hundred-step NeRF fit
def test_nerf_trains(nerf_scene):
    cams, images, depths = nerf_scene
    cfg = NerfConfig(n_levels=8, table_size_log2=14, max_res=128,
                     n_samples=32, near=0.8, far=3.2, rays_per_step=1024,
                     depth_lambda=0.1, lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    import optax

    opt, train_chunk = make_train_step(cfg, cams, images, depths, None)
    opt_state = opt.init(params)
    dummy = jnp.zeros((50,))
    params, opt_state, m0 = train_chunk(params, opt_state,
                                        jax.random.PRNGKey(1), dummy)
    params, opt_state, m1 = train_chunk(params, opt_state,
                                        jax.random.PRNGKey(2), dummy)
    psnr0 = float(m0["psnr"][0])
    psnr1 = float(m1["psnr"][-1])
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 2.0, f"NeRF did not train: {psnr0} -> {psnr1}"

    img = render_image(params, cams.index(0), cfg, chunk=2048)
    assert img["rgb"].shape == (36, 48, 3)
    assert np.isfinite(img["rgb"]).all()


def test_nerf_normals_mode(nerf_scene):
    cams, images, depths = nerf_scene
    cfg = NerfConfig(n_levels=6, table_size_log2=12, max_res=64,
                     n_samples=16, near=0.8, far=3.2, rays_per_step=256,
                     normal_lambda=0.05)
    params = init_params(jax.random.PRNGKey(0), cfg)
    origins = jnp.tile(jnp.array([[0.0, 0, -2.0]]), (8, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (8, 1))
    out = render_rays(params, origins, dirs, jax.random.PRNGKey(0), cfg,
                      with_normals=True)
    assert out["normal"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["normal"])).all()
