"""Omnidata provider mechanics: HD patch merge + predictor wiring
(reference normals_from_pretrain.py:238-283, 656-780)."""
import numpy as np
import pytest

from fusionsense_tpu.priors.omnidata.hd_merge import (
    align_normal_x, best_fit_rotation, crop_grid, merge_patches,
)


def _smooth_field(H, W, seed=0):
    """Smooth unit-normal field (3, H, W)."""
    yy, xx = np.mgrid[0:H, 0:W] / max(H, W)
    n = np.stack([np.sin(2 * xx + seed), np.cos(3 * yy),
                  np.ones_like(xx) * 1.5])
    return n / np.linalg.norm(n, axis=0, keepdims=True)


def test_merge_consistent_patches_reproduces_field():
    """Patches cut from one coherent field merge back to it (alignment
    rotations come out ~identity, blending is convex)."""
    H, W = 576, 672
    field = _smooth_field(H, W)
    x, y, crops = crop_grid(H, W)
    assert x == 3 and y == 2
    patches = {k: field[:, py:py + 384, px:px + 384]
               for k, (py, px) in crops.items()}
    merged = merge_patches(patches, H, W)
    assert merged.shape == (3, H, W)
    dot = np.clip(np.sum(merged * field, axis=0), -1, 1)
    assert np.degrees(np.arccos(dot)).max() < 0.5


def test_merge_aligns_rotated_patches():
    """Per-patch global rotations are removed by the SVD alignment: the
    merged map agrees with the centre patch's frame."""
    H, W = 576, 576
    field = _smooth_field(H, W, seed=1)
    x, y, crops = crop_grid(H, W)

    rng = np.random.default_rng(0)

    def small_rot(i):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        ang = 0.05 * (i % 5)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K

    patches = {}
    for idx, (k, (py, px)) in enumerate(sorted(crops.items(), key=str)):
        R = np.eye(3) if k == "mid" else small_rot(idx)
        p = field[:, py:py + 384, px:px + 384]
        patches[k] = (R @ p.reshape(3, -1)).reshape(p.shape)
    merged = merge_patches(patches, H, W)
    dot = np.clip(np.sum(merged * field, axis=0), -1, 1)
    # aligned to the (unrotated) mid patch -> close to the true field
    assert np.degrees(np.arccos(dot)).mean() < 2.0


def test_best_fit_rotation_recovers_rotation():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(500, 3))
    ang = 0.3
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    B = A @ R_true.T
    R = best_fit_rotation(A, B)
    np.testing.assert_allclose(R, R_true, atol=1e-8)


@pytest.mark.slow
def test_predictor_low_res_smoke():
    """slow tier: one real 384x384 tiny-net forward (~50 s single-core CPU).
    The fast tier covers the wrapper logic with a stubbed patch runner
    (test_predictor_wrapper_fast) and the net itself via the omnidata
    parity tests."""
    import jax

    from fusionsense_tpu.priors.omnidata import (
        OmnidataNormals, OmnidataPredictor, tiny_omni,
    )

    cfg = tiny_omni()
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(96, 128, 3)).astype(np.float32)
    params = OmnidataNormals(cfg).init(
        jax.random.PRNGKey(0), np.zeros((384, 384, 3), np.float32))["params"]
    pred = OmnidataPredictor(params=params, cfg=cfg, resolution="low")
    n = pred.predict_normals((img * 255).astype(np.uint8))
    assert n.shape == (96, 128, 3)
    norms = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_predictor_wrapper_fast(monkeypatch):
    """Wrapper contract without a real net forward: uint8 scaling, the
    384x384 canonical resize round-trip, [0,1]->[-1,1] decode, unit-norm
    output — _run_patch is stubbed with a constant field."""
    from fusionsense_tpu.priors.omnidata import (
        OmnidataPredictor, tiny_omni,
    )
    from fusionsense_tpu.priors.omnidata import predictor as pmod

    const = np.array([0.3, -0.4, 0.866], np.float32)

    def fake_run_patch(self, rgb01):
        assert rgb01.shape == (pmod.IMAGE_SIZE, pmod.IMAGE_SIZE, 3)
        assert 0.0 <= rgb01.min() and rgb01.max() <= 1.0 + 1e-6
        out = np.broadcast_to(
            const[:, None, None],
            (3, pmod.IMAGE_SIZE, pmod.IMAGE_SIZE)).copy()
        return out / np.linalg.norm(out, axis=0, keepdims=True)

    monkeypatch.setattr(pmod.OmnidataPredictor, "_run_patch",
                        fake_run_patch)
    pred = OmnidataPredictor(params={}, cfg=tiny_omni(), resolution="low")
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(96, 128, 3)) * 255).astype(np.uint8)
    n = pred.predict_normals(img)
    assert n.shape == (96, 128, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    # a constant field survives the resize round-trip exactly
    np.testing.assert_allclose(
        n, np.broadcast_to(const / np.linalg.norm(const), n.shape),
        atol=1e-4)


def test_model_type_selection(tmp_path, monkeypatch):
    """default_normal_model honours the reference's --model-type switch
    and stays weights-gated."""
    from fusionsense_tpu.priors.mono_priors import default_normal_model

    monkeypatch.delenv("DSINE_CHECKPOINT", raising=False)
    monkeypatch.delenv("OMNIDATA_CHECKPOINT", raising=False)
    assert default_normal_model(model_type="dsine") is None
    assert default_normal_model(model_type="omnidata") is None
