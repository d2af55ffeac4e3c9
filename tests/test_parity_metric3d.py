"""Round-trip parity for the Metric3D-class port (converter layout + flax
semantics vs the torch replica; see the verification-boundary note in
fusionsense_tpu/priors/metric3d/model.py) plus the EXACT wrapper contract
against the on-disk reference code
(utils/metric3dv2_depth_generation.py:121-166)."""
import numpy as np
import pytest
import torch

import jax

from tests.test_parity_glip import enable_x64
from tests.torch_ref.metric3d_torch import Metric3DTorch


def _randomize(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, std, generator=g)
            p.copy_(p.to(torch.float32).to(p.dtype))


def _round_trip(cfg, seed=0):
    from fusionsense_tpu.priors.metric3d.convert import convert_state_dict
    from fusionsense_tpu.priors.metric3d.model import Metric3D

    torch.manual_seed(seed)
    net = Metric3DTorch(
        dim=cfg.dim, depth=cfg.depth, heads=cfg.heads, patch=cfg.patch,
        registers=cfg.registers, native=cfg.native_grid,
        layer_idx=cfg.layer_idx, out_channels=cfg.out_channels,
        features=cfg.features, hidden=cfg.hidden_dim,
        num_iter=cfg.num_iter, ds=cfg.downsample, d_min=cfg.d_min,
        d_max=cfg.d_max)
    net.eval()
    net = net.double()
    _randomize(net, seed)

    params = convert_state_dict(
        {k: v for k, v in net.state_dict().items()}, cfg)
    params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)

    rng = np.random.default_rng(seed)
    H = W = cfg.native_grid * cfg.patch     # native grid, no resample
    img = rng.normal(size=(3, H, W)).astype(np.float32).astype(np.float64)
    with torch.no_grad():
        d_t, n_t, k_t = net(torch.from_numpy(img[None]))
    with enable_x64():
        d_j, n_j, k_j = Metric3D(cfg).apply(
            {"params": params}, np.transpose(img, (1, 2, 0)))

    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy()[0],
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.transpose(np.asarray(n_j), (2, 0, 1)), n_t.numpy()[0],
        rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy()[0],
                               rtol=1e-8, atol=1e-9)


def test_tiny_round_trip():
    from fusionsense_tpu.priors.metric3d.model import tiny_m3d

    _round_trip(tiny_m3d())


@pytest.mark.slow
def test_full_width_round_trip():
    """Published-width Metric3D (vit_small deployment: dim 384, depth 12,
    heads 6, 4 registers, DPT 48/96/192/384, GRU hidden 64, 4 iters,
    convex upsample x7 — the width the reference wrapper loads,
    utils/metric3dv2_depth_generation.py:79-81) with random weights on a
    reduced native grid (8x8 patches keeps f64 CPU time in minutes; the
    grid size only scales token count, every channel width / group count
    / head split is the production one). VERDICT r3 directive #4."""
    import dataclasses

    from fusionsense_tpu.priors.metric3d.model import M3DConfig

    cfg = dataclasses.replace(M3DConfig(), native_grid=8)
    _round_trip(cfg, seed=5)


# the reference wrapper math (metric3dv2_depth_generation.py:121-166)
# re-implemented verbatim with torch — the only parts of Metric3D that
# exist on disk — used as ground truth below
def _reference_prepare(rgb_origin, intrinsic_fx):
    import torch.nn.functional as TF

    input_size = (720, 1280)
    h, w = rgb_origin.shape[:2]
    scale = min(input_size[0] / h, input_size[1] / w)
    nh, nw = int(h * scale), int(w * scale)
    t = torch.from_numpy(rgb_origin.transpose(2, 0, 1))[None].float()
    rgb = TF.interpolate(t, (nh, nw), mode="bilinear",
                         align_corners=False)[0].numpy().transpose(1, 2, 0)
    fx = intrinsic_fx * scale
    padding = np.array([123.675, 116.28, 103.53], np.float32)
    pad_h, pad_w = input_size[0] - nh, input_size[1] - nw
    ph, pw = pad_h // 2, pad_w // 2
    canvas = np.empty((*input_size, 3), np.float32)
    canvas[:] = padding
    canvas[ph:ph + nh, pw:pw + nw] = rgb
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    out = (canvas - mean) / std
    return out, (ph, pad_h - ph, pw, pad_w - pw), fx


def _reference_postprocess(pred_depth, pad_info, fx, out_hw):
    import torch.nn.functional as TF

    d = pred_depth[pad_info[0]:pred_depth.shape[0] - pad_info[1],
                   pad_info[2]:pred_depth.shape[1] - pad_info[3]]
    d = TF.interpolate(torch.from_numpy(d)[None, None].float(), out_hw,
                       mode="bilinear")[0, 0].numpy()
    d = d * (fx / 1000.0)
    return np.clip(d, 0, 300)


def test_wrapper_prepare_and_postprocess():
    from fusionsense_tpu.priors.metric3d.wrapper import (
        postprocess_depth, prepare_input,
    )

    rng = np.random.default_rng(1)
    rgb = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    got_in, got_pad, got_fx = prepare_input(rgb, fx=611.0)
    ref_in, ref_pad, ref_fx = _reference_prepare(
        np.asarray(rgb, np.float32), 611.0)
    assert got_pad == ref_pad
    np.testing.assert_allclose(got_fx, ref_fx, rtol=1e-6)
    # resize kernels agree up to fp (jax vs torch bilinear, both
    # half-pixel); padding and normalization must be exact
    assert np.abs(got_in - ref_in).max() < 2e-2
    np.testing.assert_allclose(got_in[0, 0], ref_in[0, 0], atol=1e-5)

    depth_c = rng.uniform(0.3, 150.0, size=(720, 1280)).astype(np.float32)
    got_d = postprocess_depth(depth_c, got_pad, got_fx, (480, 640))
    ref_d = _reference_postprocess(depth_c, ref_pad, ref_fx, (480, 640))
    assert np.abs(got_d - ref_d).max() < 0.5    # interp kernel fp only
    np.testing.assert_allclose(got_d[100, 100], ref_d[100, 100], rtol=5e-2)


def test_provider_wiring(monkeypatch):
    from fusionsense_tpu.priors.mono_priors import default_depth_model

    monkeypatch.delenv("METRIC3D_CHECKPOINT", raising=False)
    monkeypatch.delenv("DEPTH_ANYTHING_CHECKPOINT", raising=False)
    assert default_depth_model() is None
    assert default_depth_model(model_type="metric3d") is None
