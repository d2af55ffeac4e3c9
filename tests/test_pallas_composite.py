"""Pallas compositing kernel vs the pure-JAX oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.core.cameras import make_camera
from fusionsense_tpu.render import RasterizeConfig, rasterize
from fusionsense_tpu.render.naive import rasterize_naive

CFG_J = RasterizeConfig(tile_size=16, tile_capacity=256,
                        max_tiles_per_gaussian=16, tile_chunk=8, sh_degree=0,
                        backend="jax")
CFG_P = RasterizeConfig(tile_size=16, tile_capacity=256,
                        max_tiles_per_gaussian=16, tile_chunk=8, sh_degree=0,
                        backend="pallas", pallas_chunk=128)
CFG_F = RasterizeConfig(tile_size=16, tile_capacity=256,
                        max_tiles_per_gaussian=16, tile_chunk=8, sh_degree=0,
                        backend="flat", pallas_chunk=128)


def scene(key, n=40):
    from fusionsense_tpu.core.transforms import random_quats

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.5, maxval=0.5),
         jax.random.uniform(k2, (n, 1), minval=1.0, maxval=3.0)], -1)
    quats = random_quats(k3, n)
    scales = jax.random.uniform(k4, (n, 3), minval=0.02, maxval=0.1)
    opac = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.PRNGKey(7), (n, 3))
    return means, quats, scales, opac, colors


def test_pallas_forward_matches_jax():
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 32.0, 24.0, 64, 48)
    sc = scene(jax.random.PRNGKey(0))
    out_j = rasterize(*sc, cam, CFG_J)
    out_p = rasterize(*sc, cam, CFG_P)
    np.testing.assert_allclose(out_p.rgb, out_j.rgb, atol=3e-4)
    np.testing.assert_allclose(out_p.alpha, out_j.alpha, atol=3e-4)
    np.testing.assert_allclose(out_p.depth, out_j.depth, atol=3e-3)
    np.testing.assert_allclose(out_p.normal, out_j.normal, atol=3e-3)


def test_pallas_backward_matches_jax():
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    sc = scene(jax.random.PRNGKey(1), n=15)
    target = jnp.full((32, 32, 3), 0.4)

    def loss(cfg, m, q, s, o, c):
        out = rasterize(m, q, s, o, c, cam, cfg)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.01 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.alpha))

    g_j = jax.grad(lambda *a: loss(CFG_J, *a), argnums=(0, 1, 2, 3, 4))(*sc)
    g_p = jax.grad(lambda *a: loss(CFG_P, *a), argnums=(0, 1, 2, 3, 4))(*sc)
    for a, b in zip(g_p, g_j):
        assert jnp.all(jnp.isfinite(a))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=2e-2)


@pytest.mark.slow
def test_pallas_saturated_early_exit_correct():
    """Many opaque gaussians stacked: early exit must not change the image.

    slow tier: the flat (production) backend's saturated-early-exit test
    below covers the same property fast; the dense pallas backend keeps
    its fwd/bwd parity coverage in the fast tier."""
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    n = 60
    means = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1)).at[:, 2].set(
        1.0 + 0.01 * jnp.arange(n))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    scales = jnp.full((n, 3), 0.3)
    opac = jnp.full((n,), 0.9)
    colors = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    out_j = rasterize(means, quats, scales, opac, colors, cam, CFG_J)
    out_p = rasterize(means, quats, scales, opac, colors, cam, CFG_P)
    np.testing.assert_allclose(out_p.rgb, out_j.rgb, atol=1e-3)
    np.testing.assert_allclose(out_p.alpha, out_j.alpha, atol=1e-3)


def test_flat_forward_matches_jax():
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 32.0, 24.0, 64, 48)
    sc = scene(jax.random.PRNGKey(0))
    out_j = rasterize(*sc, cam, CFG_J)
    out_f = rasterize(*sc, cam, CFG_F)
    np.testing.assert_allclose(out_f.rgb, out_j.rgb, atol=3e-4)
    np.testing.assert_allclose(out_f.alpha, out_j.alpha, atol=3e-4)
    np.testing.assert_allclose(out_f.depth, out_j.depth, atol=3e-3)
    np.testing.assert_allclose(out_f.normal, out_j.normal, atol=3e-3)
    assert int(out_f.overflow) == 0


def test_flat_backward_matches_jax():
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    sc = scene(jax.random.PRNGKey(1), n=15)
    target = jnp.full((32, 32, 3), 0.4)

    def loss(cfg, m, q, s, o, c):
        out = rasterize(m, q, s, o, c, cam, cfg)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.01 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.alpha))

    g_j = jax.grad(lambda *a: loss(CFG_J, *a), argnums=(0, 1, 2, 3, 4))(*sc)
    g_f = jax.grad(lambda *a: loss(CFG_F, *a), argnums=(0, 1, 2, 3, 4))(*sc)
    for a, b in zip(g_f, g_j):
        assert jnp.all(jnp.isfinite(a))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=2e-2)


def test_flat_saturated_early_exit_correct():
    import dataclasses

    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    n = 300   # > 2 blocks of opaque stacked splats forces block skipping
    # 4 tiles x ceil(300/128)*128 aligned pairs = 1536 needs budget >= 384/tile
    cfg_f = dataclasses.replace(CFG_F, tile_capacity=512)
    means = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1)).at[:, 2].set(
        1.0 + 0.002 * jnp.arange(n))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    scales = jnp.full((n, 3), 0.3)
    opac = jnp.full((n,), 0.9)
    colors = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    out_j = rasterize(means, quats, scales, opac, colors, cam, CFG_J)
    out_f = rasterize(means, quats, scales, opac, colors, cam, cfg_f)
    assert int(out_f.overflow) == 0
    np.testing.assert_allclose(out_f.rgb, out_j.rgb, atol=1e-3)
    np.testing.assert_allclose(out_f.alpha, out_j.alpha, atol=1e-3)


def test_flat_budget_overflow_reported():
    """Pairs past the total budget are dropped and counted, not silently
    wrong (the flat layout has no per-tile capacity cliff)."""
    import dataclasses

    cam = make_camera(jnp.eye(4), 80.0, 80.0, 32.0, 24.0, 64, 48)
    sc = scene(jax.random.PRNGKey(4), n=200)
    tiny = dataclasses.replace(CFG_F, tile_capacity=16)  # PB = 16 * 12 tiles
    out = rasterize(*sc, cam, tiny)
    assert int(out.overflow) > 0
    assert jnp.all(jnp.isfinite(out.rgb))


def test_flat_absgrad_tap():
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    sc = scene(jax.random.PRNGKey(3), n=12)
    target = jnp.full((32, 32, 3), 0.2)
    n = 12

    def loss(tap, abstap):
        out = rasterize(*sc, cam, CFG_F, mean2d_tap=tap, absgrad_tap=abstap)
        return jnp.mean((out.rgb - target) ** 2)

    g_signed, g_abs = jax.grad(loss, argnums=(0, 1))(
        jnp.zeros((n, 2)), jnp.zeros((n, 2)))
    assert jnp.all(jnp.isfinite(g_abs))
    assert float(g_abs.sum()) > 0
    assert jnp.all(g_abs >= jnp.abs(g_signed) - 1e-6)


def test_pallas_absgrad_tap():
    """absgrad >= |signed grad| per gaussian, and strictly positive where
    per-tile contributions cancel in the signed sum."""
    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    sc = scene(jax.random.PRNGKey(3), n=12)
    target = jnp.full((32, 32, 3), 0.2)
    n = 12

    def loss(tap, abstap):
        out = rasterize(*sc, cam, CFG_P, mean2d_tap=tap, absgrad_tap=abstap)
        return jnp.mean((out.rgb - target) ** 2)

    g_signed, g_abs = jax.grad(loss, argnums=(0, 1))(
        jnp.zeros((n, 2)), jnp.zeros((n, 2)))
    assert jnp.all(jnp.isfinite(g_abs))
    assert float(g_abs.sum()) > 0
    # abs accumulation dominates the signed sum elementwise
    assert jnp.all(g_abs >= jnp.abs(g_signed) - 1e-6)


def test_flat_grad_transpose_scatter_matches_landing():
    """The segment-sum gradient transpose (no landing map) must produce the
    same gradients as the round-3 landing-gather path — including the
    mean2d/absgrad taps that ride table columns 0-1/6-7."""
    import dataclasses

    cam = make_camera(jnp.eye(4), 80.0, 80.0, 16.0, 16.0, 32, 32)
    sc = scene(jax.random.PRNGKey(3), n=25)
    target = jnp.full((32, 32, 3), 0.4)
    cfg_s = dataclasses.replace(CFG_F, flat_grad_transpose="scatter")
    cfg_l = dataclasses.replace(CFG_F, flat_grad_transpose="landing")

    def loss(cfg, m, q, s, o, c, tap, abst):
        out = rasterize(m, q, s, o, c, cam, cfg, mean2d_tap=tap,
                        absgrad_tap=abst)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.01 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.alpha))

    tap = jnp.zeros((sc[0].shape[0], 2))
    g_s = jax.grad(lambda *a: loss(cfg_s, *a),
                   argnums=(0, 1, 2, 3, 4, 5, 6))(*sc, tap, tap)
    g_l = jax.grad(lambda *a: loss(cfg_l, *a),
                   argnums=(0, 1, 2, 3, 4, 5, 6))(*sc, tap, tap)
    for a, b in zip(g_s, g_l):
        assert jnp.all(jnp.isfinite(a))
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)
