"""DSINE port tests (tiny config, random weights; converter key mapping)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def tiny():
    from fusionsense_tpu.priors.dsine.model import DSINE, tiny_dsine

    cfg = tiny_dsine()
    model = DSINE(cfg)
    img = jnp.zeros((64, 64, 3))
    K = jnp.asarray(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32))
    params = model.init(jax.random.PRNGKey(0), img, K)["params"]
    return cfg, model, params


@pytest.mark.slow   # compile-heavy encoder forward
def test_effnet_stage_shapes():
    from fusionsense_tpu.priors.dsine.efficientnet import (
        EfficientNetEncoder, tiny_effnet,
    )

    enc = EfficientNetEncoder(tiny_effnet())
    x = jnp.zeros((64, 96, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out["s2"].shape[:2] == (32, 48)
    assert out["s4"].shape[:2] == (16, 24)
    assert out["s8"].shape[:2] == (8, 12)
    assert out["s16"].shape[:2] == (4, 6)
    assert out["head"].shape[:2] == (2, 3)


def test_convex_upsample_constant_preserved():
    from fusionsense_tpu.priors.dsine.model import convex_upsample

    out = jnp.full((4, 4, 3), 0.7)
    mask = jnp.zeros((4, 4, 9 * 16))
    up = convex_upsample(out, mask, 4)
    assert up.shape == (16, 16, 3)
    np.testing.assert_allclose(np.asarray(up), 0.7, atol=1e-6)


def test_axis_angle_matches_rodrigues():
    from fusionsense_tpu.priors.dsine.model import axis_angle_to_matrix

    axis = np.array([0.0, 0.0, 1.0], np.float32)
    theta = 0.5
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(axis * theta)))
    want = np.array([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0],
                     [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, want, atol=1e-5)
    # tiny angle: identity
    R0 = np.asarray(axis_angle_to_matrix(jnp.asarray(axis * 1e-8)))
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-5)


def test_ray_relu_clamps_cos_to_eps():
    from fusionsense_tpu.priors.dsine.model import ray_relu

    ray = jnp.asarray([[[0.0, 0.0, 1.0]]])
    # cos = -0.8 < eps: must be lifted so that cos' >= ~eps
    n_bad = jnp.asarray([[[0.0, 0.6, -0.8]]])
    out = ray_relu(n_bad, ray)
    assert float(jnp.sum(out * ray)) >= 1e-2 - 1e-4
    # cos = +0.8 >= eps: unchanged
    n_ok = jnp.asarray([[[0.0, 0.6, 0.8]]])
    np.testing.assert_allclose(np.asarray(ray_relu(n_ok, ray)),
                               np.asarray(n_ok), atol=1e-6)


@pytest.mark.slow   # shares the compile-heavy tiny-DSINE fixture
def test_dsine_forward_unit_normals(tiny):
    cfg, model, params = tiny
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    K = jnp.asarray(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32))
    out = model.apply({"params": params}, img, K)
    assert out.shape == (64, 64, 3)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow   # shares the compile-heavy tiny-DSINE fixture
def test_predictor_pads_and_crops(tiny):
    from fusionsense_tpu.priors.dsine.predictor import DSinePredictor

    cfg, model, params = tiny
    pred = DSinePredictor(params, cfg)
    rgb = (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8)
    out = pred.predict_normals(rgb)
    assert out.shape == (50, 70, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow   # shares the compile-heavy tiny-DSINE fixture
def test_dsine_converter_covers_tree(tiny):
    from fusionsense_tpu.priors.dsine.convert import (
        build_rules, convert_state_dict,
    )

    cfg, model, params = tiny
    rules = build_rules(cfg)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flax_shapes = {"/".join(k.key for k in path): v.shape
                   for path, v in flat}
    missing = [dst for dst, _ in rules.values() if dst not in flax_shapes]
    assert missing == [], f"converter targets absent: {missing}"
    covered = {dst for dst, _ in rules.values()}
    uncovered = [k for k in flax_shapes if k not in covered]
    assert uncovered == [], f"params with no torch source: {uncovered}"

    rng = np.random.RandomState(0)
    state = {}
    for tkey, (dst, tf) in rules.items():
        shape = flax_shapes[dst]
        if tf is None:
            tshape = shape
        elif tf.__name__ == "_conv_w":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        else:                              # _se_w: (out, in, 1, 1)
            tshape = (shape[1], shape[0], 1, 1)
        state[tkey] = rng.randn(*tshape).astype(np.float32)
    converted = convert_state_dict(state, cfg)
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    conv_shapes = {"/".join(k.key for k in path): v.shape
                   for path, v in conv_flat}
    assert conv_shapes == flax_shapes
