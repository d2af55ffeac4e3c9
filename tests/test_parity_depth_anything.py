"""Round-trip parity: torch Depth-Anything-V2 replica (random weights) ->
converter -> flax DepthAnything (VERDICT round-2 missing item #1).

The reference pulls its mono-depth priors via torch.hub (no source on
disk: dn_splatter/scripts/depth_from_pretrain.py:153,
utils/metric3dv2_depth_generation.py:79), so the torch side here is a
replica of the PUBLISHED DepthAnythingV2 architecture with upstream
state_dict keys (tests/torch_ref/depth_anything_torch.py).  This verifies
the converter layout (qkv/proj transposes, ConvTranspose kernels,
LayerScale) and the flax port's semantics (LN eps, exact-GELU, bicubic
pos-embed resample, align_corners=True DPT resizes).
"""
import numpy as np
import pytest
import torch

from tests.torch_ref.depth_anything_torch import DepthAnythingV2


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.05, generator=g)


def _round_trip(torch_net, cfg, H, W, seed=0):
    from fusionsense_tpu.priors.depth_anything.convert import (
        convert_state_dict,
    )
    from fusionsense_tpu.priors.depth_anything.dpt import DepthAnything

    sd = {k: v for k, v in torch_net.state_dict().items()}
    params, report = convert_state_dict(sd, cfg)
    assert not report["missing"], report["missing"][:8]

    rng = np.random.default_rng(seed)
    img = rng.normal(size=(3, H, W)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(img[None]))[0].numpy()
    got = np.asarray(DepthAnything(cfg).apply(
        {"params": params}, np.transpose(img, (1, 2, 0))))
    return got, ref


def test_tiny_native_grid_parity():
    """Tiny ViT at its native pos-embed grid (no resample): outputs must
    agree to float tolerance."""
    from fusionsense_tpu.priors.depth_anything.dpt import tiny_da

    cfg = tiny_da()
    torch.manual_seed(0)
    net = DepthAnythingV2(
        dim=cfg.vit.dim, depth=cfg.vit.depth, heads=cfg.vit.heads,
        native_grid=cfg.vit.native_grid, features=cfg.features,
        out_channels=cfg.out_channels, layer_idx=cfg.vit.layer_idx).eval()
    _randomize(net)
    got, ref = _round_trip(net, cfg, cfg.vit.native_grid * 14,
                           cfg.vit.native_grid * 14)
    # tight: the converter's ConvTranspose flip bug (round 3) sat
    # exactly at the old rtol=1e-3 — do not loosen this again
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_tiny_resampled_grid_parity():
    """Non-native grid exercises the bicubic pos-embed resample (torch vs
    jax bicubic kernels differ slightly — bounded, not exact)."""
    from fusionsense_tpu.priors.depth_anything.dpt import tiny_da

    cfg = tiny_da()
    torch.manual_seed(1)
    net = DepthAnythingV2(
        dim=cfg.vit.dim, depth=cfg.vit.depth, heads=cfg.vit.heads,
        native_grid=cfg.vit.native_grid, features=cfg.features,
        out_channels=cfg.out_channels, layer_idx=cfg.vit.layer_idx).eval()
    _randomize(net, 1)
    got, ref = _round_trip(net, cfg, 7 * 14, 6 * 14, seed=1)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05, (
        np.abs(got - ref).max(), scale)


@pytest.mark.slow
def test_full_vits_parity():
    """Full-width ViT-S/DPT (the published DA-V2 vits config) at a
    non-native grid."""
    from fusionsense_tpu.priors.depth_anything.dpt import DAConfig

    cfg = DAConfig()
    torch.manual_seed(2)
    net = DepthAnythingV2().eval()
    _randomize(net, 2)
    got, ref = _round_trip(net, cfg, 10 * 14, 13 * 14, seed=2)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.05, (
        np.abs(got - ref).max(), scale)
