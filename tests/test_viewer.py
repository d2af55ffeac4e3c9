"""Live splat-viewer server tests: .splat packing + HTTP contract."""
import json
import urllib.request

import numpy as np
import jax.numpy as jnp


def _serve():
    from fusionsense_tpu.viewer import SplatViewerServer

    return SplatViewerServer(port=0)   # ephemeral port


def test_pack_splats_layout():
    from fusionsense_tpu.viewer import pack_splats

    means = np.array([[1.0, 2.0, 3.0]], np.float32)
    scales = np.array([[0.1, 0.2, 0.3]], np.float32)
    rgb = np.array([[1.0, 0.5, 0.0]], np.float32)
    op = np.array([0.5], np.float32)
    quats = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
    blob = pack_splats(means, scales, rgb, op, quats)
    assert len(blob) == 32
    rec = np.frombuffer(blob, np.uint8)
    np.testing.assert_allclose(rec[0:12].view(np.float32), means[0])
    np.testing.assert_allclose(rec[12:24].view(np.float32), scales[0])
    assert list(rec[24:28]) == [255, 127, 0, 127]
    assert list(rec[28:32]) == [255, 128, 128, 128]   # w=1 -> 255 (clipped)


def test_pack_state_alive_only():
    from fusionsense_tpu.gaussians.init import init_from_points
    from fusionsense_tpu.viewer.server import pack_state

    pts = jnp.asarray(np.random.RandomState(0).rand(10, 3), jnp.float32)
    g = init_from_points(pts, jnp.full((10, 3), 0.5), capacity=32,
                         sh_degree=1)
    blob = pack_state(g)
    assert len(blob) == 10 * 32


def test_http_contract():
    from fusionsense_tpu.viewer import pack_splats

    srv = _serve()
    try:
        blob = pack_splats(
            np.zeros((3, 3), np.float32), np.ones((3, 3), np.float32) * 0.1,
            np.ones((3, 3), np.float32), np.ones(3, np.float32) * 0.9,
            np.tile(np.array([1, 0, 0, 0], np.float32), (3, 1)))
        srv.update(blob, step=42, metrics={"psnr": 21.5})

        html = urllib.request.urlopen(srv.url).read().decode()
        assert "webgl2" in html.lower()

        st = json.loads(urllib.request.urlopen(srv.url + "state").read())
        assert st["step"] == 42 and st["num_splats"] == 3
        assert st["metrics"]["psnr"] == 21.5
        v0 = st["version"]

        got = urllib.request.urlopen(srv.url + "splats.bin").read()
        assert got == blob

        srv.update(blob + blob, step=43)
        st = json.loads(urllib.request.urlopen(srv.url + "state").read())
        assert st["version"] == v0 + 1 and st["num_splats"] == 6
    finally:
        srv.close()


def test_max_splats_keeps_most_opaque():
    from fusionsense_tpu.viewer import pack_splats

    n = 10
    op = np.linspace(0.1, 0.9, n).astype(np.float32)
    blob = pack_splats(np.zeros((n, 3), np.float32),
                       np.ones((n, 3), np.float32),
                       np.ones((n, 3), np.float32), op,
                       np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
                       max_splats=4)
    rec = np.frombuffer(blob, np.uint8).reshape(4, 32)
    alphas = rec[:, 27].astype(np.float32) / 255
    assert (alphas > 0.5).all()
