import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.core.cameras import make_camera
from fusionsense_tpu.core.sh import rgb_to_sh0
from fusionsense_tpu.render import RasterizeConfig, rasterize
from fusionsense_tpu.render.naive import rasterize_naive

CFG = RasterizeConfig(tile_size=16, tile_capacity=64, max_tiles_per_gaussian=16,
                      tile_chunk=8, sh_degree=0)


def simple_camera(width=64, height=48):
    return make_camera(jnp.eye(4), 80.0, 80.0, width / 2, height / 2, width, height)


def random_scene(key, n=50, depth_range=(1.0, 3.0)):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-0.5, maxval=0.5),
            jax.random.uniform(k2, (n, 1), minval=depth_range[0], maxval=depth_range[1]),
        ],
        -1,
    )
    from fusionsense_tpu.core.transforms import random_quats

    quats = random_quats(k3, n)
    scales = jax.random.uniform(k4, (n, 3), minval=0.01, maxval=0.08)
    opac = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.PRNGKey(99), (n, 3))
    return means, quats, scales, opac, colors


def test_single_gaussian_center_color():
    cam = simple_camera()
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    opac = jnp.array([0.9])
    colors = jnp.array([[1.0, 0.2, 0.1]])
    out = rasterize(means, quats, scales, opac, colors, cam, CFG)
    # center pixel: alpha ~= opacity damped slightly by the eps2d dilation
    # and the half-pixel offset of the pixel center from the projected mean
    cy, cx = cam.height // 2, cam.width // 2
    a = float(out.alpha[cy, cx])
    assert 0.85 < a < 0.91
    np.testing.assert_allclose(out.rgb[cy, cx], a * colors[0], atol=1e-4)
    # ED depth at center = z (alpha-normalized, gsplat "RGB+ED" semantics)
    np.testing.assert_allclose(out.depth[cy, cx], 2.0, atol=1e-3)
    # corner pixel far from gaussian: empty
    assert out.alpha[0, 0] < 1e-3


def test_tiled_matches_naive():
    cam = simple_camera()
    scene = random_scene(jax.random.PRNGKey(0), n=60)
    out_t = rasterize(*scene, cam, CFG)
    out_n = rasterize_naive(*scene, cam, CFG)
    np.testing.assert_allclose(out_t.rgb, out_n["rgb"], atol=2e-4)
    np.testing.assert_allclose(out_t.alpha, out_n["alpha"], atol=2e-4)
    np.testing.assert_allclose(out_t.depth, out_n["depth"], atol=2e-3)
    np.testing.assert_allclose(out_t.normal, out_n["normal"], atol=2e-3)
    assert int(out_t.overflow) == 0


def test_sh_colors_match_rgb_at_degree0():
    cam = simple_camera()
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(1), n=20)
    sh = rgb_to_sh0(colors)[:, None, :]  # (N, 1, 3)
    out_rgb = rasterize(means, quats, scales, opac, colors, cam, CFG)
    out_sh = rasterize(means, quats, scales, opac, sh, cam, CFG)
    np.testing.assert_allclose(out_rgb.rgb, out_sh.rgb, atol=1e-4)


def test_depth_ordering():
    """A nearer opaque Gaussian must occlude a farther one."""
    cam = simple_camera()
    means = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 3.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.2)
    opac = jnp.array([0.95, 0.95])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = rasterize(means, quats, scales, opac, colors, cam, CFG)
    cy, cx = cam.height // 2, cam.width // 2
    assert out.rgb[cy, cx, 0] > 0.9          # red (near) dominates
    assert out.rgb[cy, cx, 1] < 0.1
    # flip order of inputs: result must be identical (sort invariance)
    out2 = rasterize(means[::-1], quats, scales, opac, colors[::-1], cam, CFG)
    np.testing.assert_allclose(out.rgb, out2.rgb, atol=1e-5)


def test_background_blend():
    cam = simple_camera()
    means = jnp.array([[10.0, 10.0, -5.0]])  # behind camera -> culled
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)
    opac = jnp.array([0.9])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    bg = jnp.array([0.1, 0.2, 0.3])
    out = rasterize(means, quats, scales, opac, colors, cam, CFG, background=bg)
    np.testing.assert_allclose(out.rgb, jnp.broadcast_to(bg, out.rgb.shape), atol=1e-5)
    assert float(out.alpha.max()) < 1e-6


def test_gradients_flow_and_match_naive():
    cam = simple_camera(32, 32)
    cfg = RasterizeConfig(tile_size=16, tile_capacity=32, max_tiles_per_gaussian=8,
                          tile_chunk=4, sh_degree=0)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(2), n=12)
    target = jnp.zeros((32, 32, 3))

    def loss_tiled(m, q, s, o, c):
        out = rasterize(m, q, s, o, c, cam, cfg)
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.depth) * 0.01

    def loss_naive(m, q, s, o, c):
        out = rasterize_naive(m, q, s, o, c, cam, cfg)
        return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean(out["depth"]) * 0.01

    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac, colors)
    g_n = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac, colors)
    for a, b in zip(g_t, g_n):
        assert jnp.all(jnp.isfinite(a))
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-2)


def test_mean2d_tap_gradient():
    """Gradient wrt the zero tap equals the screen-space position gradient."""
    cam = simple_camera(32, 32)
    cfg = RasterizeConfig(tile_size=16, tile_capacity=32, max_tiles_per_gaussian=8,
                          tile_chunk=4, sh_degree=0)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(3), n=8)
    target = jnp.full((32, 32, 3), 0.5)

    def loss(tap):
        out = rasterize(means, quats, scales, opac, colors, cam, cfg, mean2d_tap=tap)
        return jnp.mean((out.rgb - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((8, 2)))
    assert g.shape == (8, 2)
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.abs(g).sum()) > 0


def test_finite_difference_means():
    """Rasterizer gradient wrt 3D means matches finite differences."""
    cam = simple_camera(32, 32)
    cfg = RasterizeConfig(tile_size=16, tile_capacity=16, max_tiles_per_gaussian=8,
                          tile_chunk=4, sh_degree=0)
    means = jnp.array([[0.05, -0.03, 2.0]])
    quats = jnp.array([[1.0, 0.2, -0.1, 0.05]])
    scales = jnp.array([[0.15, 0.1, 0.08]])
    opac = jnp.array([0.8])
    colors = jnp.array([[0.9, 0.4, 0.2]])

    def loss(m):
        out = rasterize(m, quats, scales, opac, colors, cam, cfg)
        return jnp.sum(out.rgb ** 2)

    g = jax.grad(loss)(means)
    eps = 1e-3
    for axis in range(3):
        dm = jnp.zeros_like(means).at[0, axis].set(eps)
        fd = (loss(means + dm) - loss(means - dm)) / (2 * eps)
        np.testing.assert_allclose(g[0, axis], fd, rtol=5e-2, atol=1e-3)


def test_big_gaussian_truncation_reported():
    """A huge Gaussian covering more tiles than the cap reports truncation."""
    cam = simple_camera(128, 128)
    cfg = RasterizeConfig(tile_size=16, tile_capacity=16, max_tiles_per_gaussian=4,
                          tile_chunk=8, sh_degree=0)
    means = jnp.array([[0.0, 0.0, 1.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 2.0)
    opac = jnp.array([0.9])
    colors = jnp.array([[1.0, 1.0, 1.0]])
    out = rasterize(means, quats, scales, opac, colors, cam, cfg)
    assert int(out.truncated) > 0


def test_binning_equal_depths_and_empty():
    """Quantized-depth keys: all-equal depths collapse to one bucket
    (span guard) and a no-valid-Gaussian scene bins cleanly."""
    from fusionsense_tpu.render.binning import bin_gaussians

    n = 32
    mean2d = jnp.stack([jnp.linspace(4, 60, n), jnp.full((n,), 24.0)], -1)
    radius = jnp.full((n,), 3.0)
    depth = jnp.full((n,), 2.0)          # identical depths
    bins = bin_gaussians(mean2d, radius, depth, width=64, height=48,
                         tile_size=16, tile_capacity=16,
                         max_tiles_per_gaussian=4)
    assert int(bins.mask.sum()) > 0
    idx = np.asarray(bins.indices)
    assert idx.max() < n
    # every valid slot references a real gaussian exactly once per tile
    for t in range(idx.shape[0]):
        row = idx[t][np.asarray(bins.mask[t])]
        assert len(np.unique(row)) == len(row)

    # all culled: radius 0 everywhere
    bins0 = bin_gaussians(mean2d, jnp.zeros((n,)), depth, width=64,
                          height=48, tile_size=16, tile_capacity=16,
                          max_tiles_per_gaussian=4)
    assert int(bins0.mask.sum()) == 0
    assert int(bins0.overflow) == 0


def test_binning_depth_order_preserved_within_tile():
    """Distinct depths keep exact near-to-far order under quantization."""
    from fusionsense_tpu.render.binning import bin_gaussians

    n = 20
    rng = np.random.RandomState(3)
    depths = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    mean2d = jnp.tile(jnp.asarray([[8.0, 8.0]]), (n, 1))  # all in tile 0
    radius = jnp.full((n,), 2.0)
    bins = bin_gaussians(mean2d, radius, depths, width=64, height=48,
                         tile_size=16, tile_capacity=32,
                         max_tiles_per_gaussian=4)
    row = np.asarray(bins.indices[0])[np.asarray(bins.mask[0])]
    d = np.asarray(depths)[row]
    assert np.all(np.diff(d) >= 0), d
