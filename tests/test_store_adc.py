import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.gaussians.adc import (
    ADCConfig, accumulate_stats, init_stats, refine,
)
from fusionsense_tpu.gaussians.init import init_from_points, knn_mean_dist
from fusionsense_tpu.gaussians.store import activated, new_state
from fusionsense_tpu.train.optim import adam_step, init_adam


def small_state(n=10, capacity=32, key=0):
    k = jax.random.PRNGKey(key)
    pts = jax.random.normal(k, (n, 3))
    rgb = jax.random.uniform(jax.random.PRNGKey(key + 1), (n, 3))
    return init_from_points(pts, rgb, capacity=capacity, sh_degree=1)


def test_knn_mean_dist_analytic():
    # 4 points on a unit segment: neighbors at known distances
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]])
    d = knn_mean_dist(pts, k=2, chunk=4)
    np.testing.assert_allclose(d, [1.5, 1.0, 1.0, 1.5], atol=1e-5)


def test_init_from_points():
    s = small_state(n=10, capacity=32)
    assert int(s.num_alive) == 10
    assert not bool(s.alive[10])
    m, q, sc, op, col = activated(s)
    np.testing.assert_allclose(op[10:], 0.0)  # dead slots contribute nothing
    np.testing.assert_allclose(op[:10], 0.1, atol=1e-5)


def test_init_with_normals_flat_axis():
    pts = jax.random.normal(jax.random.PRNGKey(0), (20, 3))
    rgb = jnp.full((20, 3), 0.5)
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (20, 1))
    s = init_from_points(pts, rgb, capacity=32, seed_normals=normals)
    scales = jnp.exp(s.log_scales[:20])
    # z-axis squashed 1/10
    np.testing.assert_allclose(scales[:, 2] / scales[:, 0], 0.1, atol=1e-4)


def test_adam_step_masked():
    s = small_state(n=5, capacity=8)
    opt = init_adam(s.params())
    grads = jax.tree.map(jnp.ones_like, s.params())
    p2, opt2 = adam_step(s.params(), grads, opt, jnp.asarray(0), s.alive)
    # alive slots moved, dead slots untouched
    assert not np.allclose(p2["means"][:5], s.params()["means"][:5])
    np.testing.assert_allclose(p2["means"][5:], s.params()["means"][5:])
    np.testing.assert_allclose(opt2.m["means"][5:], 0.0)


def test_adam_every_k_accumulates():
    s = small_state(n=4, capacity=8)
    opt = init_adam(s.params())
    g = jax.tree.map(jnp.ones_like, s.params())
    p = s.params()
    # features_dc has every_k=10: no update until step index 9
    for step in range(9):
        p2, opt = adam_step(p, g, opt, jnp.asarray(step), s.alive)
        np.testing.assert_allclose(p2["features_dc"], p["features_dc"])
        assert not np.allclose(p2["means"], p["means"])  # means update each step
        p = p2
    p2, opt = adam_step(p, g, opt, jnp.asarray(9), s.alive)
    assert not np.allclose(p2["features_dc"], p["features_dc"])


def test_refine_cull_low_opacity():
    s = small_state(n=10, capacity=32)
    # slot 0: transparent
    s = s.replace(logit_opacities=s.logit_opacities.at[0].set(-10.0))
    opt = init_adam(s.params())
    stats = init_stats(32)
    cfg = ADCConfig(warmup=0, refine_every=10, stop_split_at=100)
    s2, *_ , info = refine(s, opt, stats, jax.random.PRNGKey(0), cfg,
                           jnp.asarray(10))
    assert not bool(s2.alive[0])
    assert int(info["culled"]) >= 1
    assert int(s2.num_alive) == 9


def test_refine_split_and_dup():
    s = small_state(n=10, capacity=64)
    opt = init_adam(s.params())
    stats = init_stats(64)
    # big grad on slots 0 (large scale -> split) and 1 (small -> dup)
    stats = stats.replace(
        grad2d_acc=stats.grad2d_acc.at[0].set(10.0).at[1].set(10.0),
        count=stats.count.at[0].set(1).at[1].set(1),
    )
    s = s.replace(
        log_scales=s.log_scales.at[0].set(jnp.log(0.5)).at[1].set(jnp.log(1e-4))
    )
    cfg = ADCConfig(warmup=0, refine_every=10, stop_split_at=100,
                    densify_grad_thresh=0.01, densify_size_thresh=0.01,
                    cull_alpha_thresh=0.01)
    n0 = int(s.num_alive)
    s2, opt2, stats2, info = refine(s, opt, stats, jax.random.PRNGKey(0), cfg,
                                    jnp.asarray(10))
    assert int(info["split"]) == 1
    assert int(info["dupped"]) == 1
    # split: +1 net slot; dup: +1 slot
    assert int(s2.num_alive) == n0 + 2
    # split original shrunk in place
    np.testing.assert_allclose(
        jnp.exp(s2.log_scales[0]), 0.5 / 1.6, rtol=1e-5)
    # stats reset
    assert float(stats2.grad2d_acc.sum()) == 0.0


def test_refine_respects_capacity():
    s = small_state(n=10, capacity=11)  # only 1 free slot
    opt = init_adam(s.params())
    stats = init_stats(11)
    stats = stats.replace(grad2d_acc=jnp.full((11,), 10.0),
                          count=jnp.ones((11,), jnp.int32))
    cfg = ADCConfig(warmup=0, refine_every=10, stop_split_at=100,
                    densify_grad_thresh=0.01, cull_alpha_thresh=0.01)
    s2, *_, info = refine(s, opt, stats, jax.random.PRNGKey(0), cfg,
                          jnp.asarray(10))
    assert int(s2.num_alive) <= 11
    assert int(info["alloc_dropped"]) > 0


def test_refine_frozen_untouched():
    s = small_state(n=10, capacity=32)
    s = s.replace(
        frozen=s.frozen.at[3].set(True),
        logit_opacities=s.logit_opacities.at[3].set(-10.0),  # would be culled
    )
    opt = init_adam(s.params())
    stats = init_stats(32)
    cfg = ADCConfig(warmup=0, refine_every=10, stop_split_at=100)
    s2, *_ = refine(s, opt, stats, jax.random.PRNGKey(0), cfg, jnp.asarray(10))
    assert bool(s2.alive[3])  # frozen slot survives despite low opacity


def test_opacity_reset():
    s = small_state(n=10, capacity=32)
    s = s.replace(logit_opacities=jnp.full((32,), 3.0))
    opt = init_adam(s.params())
    opt.m["logit_opacities"] = jnp.ones((32,))
    stats = init_stats(32)
    cfg = ADCConfig(warmup=0, refine_every=10, reset_alpha_every=1,
                    stop_split_at=100, cull_alpha_thresh=0.1)
    # step 10 -> refine_idx=1, 1 % 1 == 0 -> reset fires
    s2, opt2, *_ , info = refine(s, opt, stats, jax.random.PRNGKey(0), cfg,
                                 jnp.asarray(10))
    assert bool(info["opacity_reset"])
    expected = float(jnp.log(0.2 / 0.8))
    alive = np.asarray(s2.alive)
    np.testing.assert_allclose(
        np.asarray(s2.logit_opacities)[alive], expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(opt2.m["logit_opacities"]), 0.0)


def test_resize_roundtrip():
    from fusionsense_tpu.gaussians.resize import (
        next_bucket, pick_capacity, resize_train_state,
    )

    assert next_bucket(30_000) == 32_768
    assert pick_capacity(900, 1024, 1 << 18) == 2048    # >80% -> grow
    assert pick_capacity(200, 4096, 1 << 18) == 1024    # <30% -> shrink
    assert pick_capacity(2000, 4096, 1 << 18) == 4096   # stable

    s = small_state(n=10, capacity=64)
    s = s.replace(frozen=s.frozen.at[2].set(True))
    opt = init_adam(s.params())
    opt.m["means"] = opt.m["means"].at[:10].set(7.0)
    stats = init_stats(64)
    # grow
    g2, o2, st2 = resize_train_state(s, opt, stats, new_capacity=128)
    assert g2.capacity == 128
    assert int(g2.num_alive) == 10
    np.testing.assert_allclose(g2.means[:10], s.means[:10])
    np.testing.assert_allclose(o2.m["means"][:10], 7.0)
    # shrink back down below: alive slots survive the permutation
    g3, o3, st3 = resize_train_state(g2, o2, st2, new_capacity=16)
    assert g3.capacity == 16
    assert int(g3.num_alive) == 10
    assert bool(g3.frozen[np.asarray(g3.alive)].any())
    np.testing.assert_allclose(
        np.sort(np.asarray(g3.means[np.asarray(g3.alive)]), axis=0),
        np.sort(np.asarray(s.means[:10]), axis=0), atol=1e-6)


def test_binary_opacity_surgery_gating():
    """Reference binary opacities (dn_model.py:492-503): LOGIT-space snap
    (>= 0.9 -> 1.0 else 0.0 — opacities collapse to sigmoid 0.5/0.731,
    never invisible), active only after warmup and skipped for `margin`
    steps after each opacity reset (window anchored at our reset phase,
    step == warmup mod skip)."""
    from fusionsense_tpu.gaussians.store import binary_opacity_surgery

    logits = jnp.asarray([-3.0, 0.5, 0.9, 4.0])
    kw = dict(threshold=0.9, warmup=500, skip=3000, margin=200)

    # before/at warmup: untouched (a fresh 0.1-opacity init must train)
    np.testing.assert_allclose(
        binary_opacity_surgery(logits, jnp.int32(400), **kw), logits)
    np.testing.assert_allclose(
        binary_opacity_surgery(logits, jnp.int32(500), **kw), logits)
    # active mid-phase: logit-space snap
    np.testing.assert_allclose(
        binary_opacity_surgery(logits, jnp.int32(800), **kw),
        [0.0, 0.0, 1.0, 1.0])
    # at a reset step (3500 = warmup mod skip) and through the margin:
    # untouched so the reset's clamped opacities can re-learn
    for s in (3500, 3600, 3700):
        np.testing.assert_allclose(
            binary_opacity_surgery(logits, jnp.int32(s), **kw), logits)
    # margin over: snapping resumes
    np.testing.assert_allclose(
        binary_opacity_surgery(logits, jnp.int32(3701), **kw),
        [0.0, 0.0, 1.0, 1.0])
