"""Round-trip parity: torch DPT-Hybrid replica (random weights) ->
converter -> flax OmnidataNormals (reference alternate normal prior,
dn_splatter/scripts/normals_from_pretrain.py:309-322).

Float64 both sides, f32-representable weights (see test_parity_glip.py).
"""
import numpy as np
import pytest
import torch

import jax

from tests.test_parity_glip import enable_x64
from tests.torch_ref.omnidata_torch import DPTHybridNormals


def _randomize(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, std, generator=g)
            p.copy_(p.to(torch.float32).to(p.dtype))


def _round_trip(cfg, torch_kwargs, H, W, seed=0):
    from fusionsense_tpu.priors.omnidata.convert import convert_state_dict
    from fusionsense_tpu.priors.omnidata.dpt_hybrid import OmnidataNormals

    torch.manual_seed(seed)
    net = DPTHybridNormals(**torch_kwargs)
    net.eval()
    net = net.double()
    _randomize(net, seed)
    params = convert_state_dict(
        {k: v for k, v in net.state_dict().items()}, cfg)
    params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)

    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(3, H, W)).astype(np.float32).astype(np.float64)
    with torch.no_grad():
        ref = net(torch.from_numpy(img[None])).numpy()[0]
    with enable_x64():
        got = OmnidataNormals(cfg).apply(
            {"params": params}, np.transpose(img, (1, 2, 0)))
    got = np.transpose(np.asarray(got), (2, 0, 1))
    return got, ref


def test_tiny_native_parity():
    from fusionsense_tpu.priors.omnidata.dpt_hybrid import tiny_omni

    cfg = tiny_omni()
    kw = dict(stem=cfg.stem_width, layout=cfg.stage_layout,
              width=cfg.stage_width, dim=cfg.vit_dim, depth=cfg.vit_depth,
              heads=cfg.vit_heads, hooks=cfg.hooks, native=cfg.native_grid,
              features=cfg.features, out_channels=cfg.out_channels)
    side = cfg.native_grid * 16           # native pos-embed grid: exact
    got, ref = _round_trip(cfg, kw, side, side)
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_full_width_parity():
    """Full vitb_rn50_384 geometry on a 384x384 frame (the only size the
    reference feeds the model, normals_from_pretrain.py:39)."""
    from fusionsense_tpu.priors.omnidata.dpt_hybrid import OmniConfig

    cfg = OmniConfig()
    kw = dict()
    got, ref = _round_trip(cfg, kw, 384, 384, seed=1)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
