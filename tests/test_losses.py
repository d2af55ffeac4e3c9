import jax
import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.train import losses as L


def test_ssim_identical_is_one():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert abs(float(L.ssim(img, img)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
    assert float(L.ssim(img, noisy)) < 0.9


def test_rgb_loss_zero_at_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(L.rgb_loss(img, img)) < 1e-6


def test_depth_losses_masked():
    pred = jnp.ones((8, 8))
    gt = jnp.zeros((8, 8)).at[0, 0].set(1.0)
    mask = jnp.zeros((8, 8)).at[0, 0].set(1.0)
    # only the matching pixel is counted -> zero loss
    assert float(L.depth_l1(pred, gt, mask)) < 1e-6
    assert float(L.depth_logl1(pred, gt, mask)) < 1e-6
    # unmasked: error on 63 pixels
    assert float(L.depth_l1(pred, gt, None)) > 0.9


def test_edge_aware_logl1_downweights_edges():
    H = W = 16
    pred = jnp.zeros((H, W))
    gt = jnp.ones((H, W))
    flat_rgb = jnp.full((H, W, 3), 0.5)
    edgy_rgb = jnp.tile((jnp.arange(W) % 2).astype(jnp.float32)[None, :, None], (H, 1, 3))
    l_flat = float(L.depth_edge_aware_logl1(pred, gt, flat_rgb))
    l_edgy = float(L.depth_edge_aware_logl1(pred, gt, edgy_rgb))
    assert l_edgy < l_flat


def test_tv_loss():
    flat = jnp.full((8, 8), 2.0)
    assert float(L.tv_loss(flat)) < 1e-8
    stripes = jnp.tile((jnp.arange(8) % 2).astype(jnp.float32)[None, :], (8, 1))
    assert float(L.tv_loss(stripes)) > 0.5


def test_normal_cosine():
    n = jnp.zeros((4, 4, 3)).at[..., 2].set(1.0)
    assert float(L.normal_cosine(n, n)) < 1e-6
    assert abs(float(L.normal_cosine(n, -n)) - 2.0) < 1e-5


def test_normals_from_depth_plane():
    from fusionsense_tpu.core.cameras import make_camera

    cam = make_camera(jnp.eye(4), 60.0, 60.0, 16.0, 12.0, 32, 24)
    depth = jnp.full((24, 32), 2.0)  # fronto-parallel plane
    n = L.normals_from_depth(depth, cam)
    # normal should point back at the camera (-z in world = camera frame here)
    np.testing.assert_allclose(n[8:16, 8:24, 2], -1.0, atol=1e-4)


def test_flatness_and_entropy():
    log_scales = jnp.log(jnp.full((4, 3), 0.5))
    alive = jnp.array([True, True, False, False])
    assert abs(float(L.flatness_loss(log_scales, alive)) - 0.5) < 1e-6
    # entropy max at logit 0 (p=0.5)
    ent = L.opacity_entropy_loss(jnp.zeros((4,)), alive)
    assert abs(float(ent) - float(jnp.log(2.0))) < 1e-5


def test_touch_normal_loss():
    n = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    target = jnp.zeros((4, 3)).at[:, 0].set(1.0)
    frozen = jnp.array([True, False, False, False])
    # one frozen slot with orthogonal normals: |(0,0,1)-(1,0,0)|^2 = 2
    assert abs(float(L.touch_normal_loss(n, target, frozen)) - 2.0) < 1e-5
