"""Round-trip parity: torch LPIPS-vgg replica (random weights) ->
converter -> JAX lpips_pair (reference metric: dn_splatter/metrics.py:11).
"""
import numpy as np
import torch

from tests.torch_ref.lpips_torch import LPIPSVgg


def test_lpips_round_trip():
    from fusionsense_tpu.eval.lpips_jax import (
        convert_lpips_weights, load_lpips_params, lpips_pair,
        save_lpips_params,
    )

    torch.manual_seed(0)
    net = LPIPSVgg().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0, 0.05, generator=g)
        for i in range(5):
            lin = getattr(net, f"lin{i}").model[1]
            lin.weight.abs_()          # published heads are non-negative

    sd = net.state_dict()
    vgg_state = {k.removeprefix("net."): v for k, v in sd.items()
                 if k.startswith("net.")}
    lin_state = {k: v for k, v in sd.items() if k.startswith("lin")}
    params = convert_lpips_weights(vgg_state, lin_state)

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1) \
        .astype(np.float32)

    def prep(x):
        return torch.from_numpy(x.transpose(2, 0, 1))[None] * 2.0 - 1.0

    with torch.no_grad():
        ref = float(net(prep(a), prep(b))[0])
    got = float(lpips_pair(params, a, b))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)

    # identical images -> 0; save/load round-trips
    assert float(lpips_pair(params, a, a)) < 1e-6
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_lpips_params(f.name, params)
        p2 = load_lpips_params(f.name)
    got2 = float(lpips_pair(p2, a, b))
    np.testing.assert_allclose(got2, got, rtol=1e-6)
