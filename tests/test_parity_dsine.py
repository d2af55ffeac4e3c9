"""Round-trip parity: reference torch DSINE (random weights) -> converter
-> flax DSINE, outputs compared (VERDICT round-2 missing item #1).

Covers: EfficientNet-B5 encoder semantics (tf SAME padding, BN eps, SE),
the GN decoder with weight-standardized convs, prediction heads, ConvGRU,
the NRN rotation refinement, and convex upsampling — i.e. the full DSINE
forward (reference dn_splatter/scripts/dsine/dsine.py:72-300,
submodules.py:19-238).  The reference encoder is geffnet-based (geffnet is
not installed), so the harness supplies a structural torch replica
(tests/torch_ref/geffnet_shim.py) — encoder parity therefore validates the
converter + flax semantics against geffnet's documented structure, while
decoder/refinement parity runs against the reference sources verbatim.
"""
import numpy as np
import pytest
import torch

from tests.torch_ref import geffnet_shim
from tests.torch_ref.dsine_ref import load_dsine_module


def _to_np(t):
    return t.detach().cpu().numpy()


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.1, generator=g)
    geffnet_shim._randomize_bn(module, seed + 1)


def test_encoder_tiny_parity():
    """Tiny-width encoder: torch geffnet-replica vs flax, all stages."""
    from fusionsense_tpu.priors.dsine.convert import convert_state_dict
    from fusionsense_tpu.priors.dsine.efficientnet import (
        EfficientNetEncoder, tiny_effnet,
    )
    from fusionsense_tpu.priors.dsine.model import DSINEConfig

    torch.manual_seed(0)
    enc = geffnet_shim.EfficientNet(stem=8, head=64,
                                    stages=geffnet_shim.TINY_STAGES).eval()
    # reference Encoder removes the classification tail (submodules.py:26-27)
    enc.global_pool = torch.nn.Identity()
    enc.classifier = torch.nn.Identity()
    _randomize(enc)

    state = {f"encoder.original_model.{k}": v.numpy()
             for k, v in enc.state_dict().items()}
    cfg = DSINEConfig(effnet=tiny_effnet())
    params = convert_state_dict(state, cfg)["encoder"]

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 96, 128)).astype(np.float32)

    with torch.no_grad():
        feats = [torch.from_numpy(img[None])]
        for k, v in enc._modules.items():
            if k == "blocks":
                for blk in v:
                    feats.append(blk(feats[-1]))
            else:
                feats.append(v(feats[-1]))
    # reference Encoder.forward indices: 4..10 blocks, 11 conv_head
    ref = {"s2": feats[4], "s4": feats[5], "s8": feats[6],
           "s16": feats[8], "head": feats[11]}

    out = EfficientNetEncoder(tiny_effnet()).apply(
        {"params": params}, np.transpose(img, (1, 2, 0)))
    for k in ref:
        got = np.transpose(np.asarray(out[k]), (2, 0, 1))
        np.testing.assert_allclose(got, _to_np(ref[k])[0], rtol=2e-4,
                                   atol=2e-4, err_msg=k)


@pytest.mark.slow
def test_full_dsine_parity():
    """Full-width B5 DSINE round-trip on a 128x96 frame: reference torch
    forward (decoder/refinement sources verbatim) vs converted flax."""
    from fusionsense_tpu.priors.dsine.convert import convert_state_dict
    from fusionsense_tpu.priors.dsine.model import DSINE, DSINEConfig

    dsine_mod = load_dsine_module()
    torch.manual_seed(0)
    net = dsine_mod.DSINE().eval()
    _randomize(net)

    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_state_dict(state, DSINEConfig())

    rng = np.random.default_rng(1)
    H, W = 96, 128
    img = rng.normal(size=(3, H, W)).astype(np.float32)
    K = np.array([[110.0, 0.0, W / 2 - 0.3], [0.0, 115.0, H / 2 + 0.2],
                  [0.0, 0.0, 1.0]], np.float32)

    with torch.no_grad():
        preds = net(torch.from_numpy(img[None]),
                    torch.from_numpy(K[None].copy()))
    ref = _to_np(preds[-1])[0]                      # (3, H, W)

    got = DSINE().apply({"params": params},
                        np.transpose(img, (1, 2, 0)), K)
    got = np.transpose(np.asarray(got), (2, 0, 1))
    # unit normals: compare by angle, tolerate accumulation over 5
    # refinement iterations + resize differences
    dot = np.clip(np.sum(got * ref, axis=0), -1, 1)
    ang = np.degrees(np.arccos(dot))
    assert np.median(ang) < 0.5, float(np.median(ang))
    assert np.mean(ang) < 2.0, float(np.mean(ang))
