"""Depth-Anything-V2 port tests (tiny config, random weights; converter
key/shape mapping against the flax tree)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def tiny():
    from fusionsense_tpu.priors.depth_anything import DepthAnything, tiny_da

    cfg = tiny_da()
    model = DepthAnything(cfg)
    img = jnp.zeros((56, 70, 3))
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    return cfg, model, params


def test_forward_shapes_finite(tiny):
    cfg, model, params = tiny
    img = jnp.asarray(np.random.RandomState(0).rand(56, 70, 3), jnp.float32)
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, img)
    assert out.shape == (56, 70)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()          # relative inverse depth


def test_pos_embed_resample():
    from fusionsense_tpu.priors.depth_anything.vit import resample_pos_embed

    pos = jnp.asarray(np.random.RandomState(1).rand(1 + 16, 8), jnp.float32)
    same = resample_pos_embed(pos, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pos))
    up = resample_pos_embed(pos, 4, 6, 5)
    assert up.shape == (1 + 30, 8)
    np.testing.assert_allclose(np.asarray(up[0]), np.asarray(pos[0]))


def test_input_size_contract():
    from fusionsense_tpu.priors.depth_anything import da_input_size

    h, w = da_input_size(480, 640)
    assert h % 14 == 0 and w % 14 == 0 and min(h, w) >= 518
    assert abs((w / h) - (640 / 480)) < 0.05
    assert da_input_size(518, 518) == (518, 518)


def _fake_state_dict(cfg, params):
    """Invert the converter rules against the real flax tree, so the fake
    torch checkpoint has exactly the published layout and correct shapes."""
    from fusionsense_tpu.priors.depth_anything.convert import (
        _conv_w, _convT_w, _lin_w, rules,
    )

    inv = {id(_conv_w): lambda a: np.transpose(a, (3, 2, 0, 1)),
           id(_convT_w): lambda a: np.transpose(a[::-1, ::-1], (2, 3, 0, 1)),
           id(_lin_w): lambda a: np.transpose(a, (1, 0))}
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_path = {"/".join(str(k)[2:-2] for k in path): np.asarray(v)
               for path, v in flat}
    for tk, (dst, tr) in rules(cfg).items():
        a = by_path[dst]
        if tk == "pretrained.cls_token":
            a = a.reshape(1, 1, -1)
        elif tk == "pretrained.pos_embed":
            a = a.reshape(1, *a.shape)
        elif tr is not None:
            a = inv[id(tr)](a)
        sd[tk] = a
    return sd


def test_converter_round_trip(tiny):
    cfg, model, params = tiny
    from fusionsense_tpu.priors.depth_anything.convert import (
        convert_state_dict,
    )

    sd = _fake_state_dict(cfg, params)
    got, report = convert_state_dict(sd, cfg)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"]

    # converted tree must match the init tree exactly (shapes AND values)
    img = jnp.asarray(np.random.RandomState(2).rand(56, 56, 3), jnp.float32)
    a = model.apply({"params": params}, img)
    b = model.apply({"params": got}, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_predictor_end_to_end(tiny):
    cfg, model, params = tiny
    from fusionsense_tpu.priors.depth_anything import DepthAnythingModel

    pred = DepthAnythingModel(params, cfg, lower=56)
    rgb = (np.random.RandomState(3).rand(40, 50, 3) * 255).astype(np.uint8)
    inv = pred.predict_inverse(rgb)
    assert inv.shape == (40, 50)

    sensor = np.full((40, 50), 2.0, np.float32)
    d = pred.predict_depth(rgb, fx=100.0, sensor_depth=sensor)
    assert d.shape == (40, 50)
    # scale/shift alignment should pull the mean to the sensor scale
    assert abs(float(d.mean()) - 2.0) < 0.2
