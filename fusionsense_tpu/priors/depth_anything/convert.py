"""Torch Depth-Anything-V2 checkpoint -> flax params (weights-gated).

Maps the published DA-V2 state dict (`pretrained.*` DINOv2 backbone +
`depth_head.*` DPT head) onto this package's flax tree. Conventions follow
the DSINE converter: conv NCHW -> HWIO, ConvTranspose NCHW -> HWOI-rotated,
Linear (out, in) -> (in, out). The mapping is tolerant — unmatched keys on
either side are reported, not fatal — so a checkpoint-layout drift gives a
clear diff instead of a silent misload.
"""
from __future__ import annotations

import numpy as np

from fusionsense_tpu.priors.depth_anything.dpt import DAConfig


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def _convT_w(a):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in,
    # out) with BOTH spatial dims flipped: flax's conv_transpose
    # (transpose_kernel=False) correlates with the kernel as-is, while
    # torch's ConvTranspose2d is the gradient-of-conv (180deg-rotated
    # taps). Caught by the round-trip harness (a tap placed at (0,1)
    # lands at (1,0) without the flip).
    return np.ascontiguousarray(np.transpose(a, (2, 3, 0, 1))[::-1, ::-1])


def _lin_w(a):
    return np.transpose(a, (1, 0))


def rules(cfg: DAConfig) -> dict:
    r = {}

    def lin(src, dst):
        r[f"{src}.weight"] = (f"{dst}/kernel", _lin_w)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    def conv(src, dst, bias=True, tr=_conv_w):
        r[f"{src}.weight"] = (f"{dst}/kernel", tr)
        if bias:
            r[f"{src}.bias"] = (f"{dst}/bias", None)

    def ln(src, dst):
        r[f"{src}.weight"] = (f"{dst}/scale", None)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    # ---- DINOv2 backbone ---------------------------------------------------
    p = "pretrained"
    r[f"{p}.cls_token"] = ("pretrained/cls_token",
                          lambda a: a.reshape(1, -1))
    r[f"{p}.pos_embed"] = ("pretrained/pos_embed",
                          lambda a: a.reshape(a.shape[1], a.shape[2]))
    conv(f"{p}.patch_embed.proj", "pretrained/patch_embed")
    ln(f"{p}.norm", "pretrained/norm")
    for i in range(cfg.vit.depth):
        b, d = f"{p}.blocks.{i}", f"pretrained/block{i}"
        ln(f"{b}.norm1", f"{d}/norm1")
        ln(f"{b}.norm2", f"{d}/norm2")
        lin(f"{b}.attn.qkv", f"{d}/attn/qkv")
        lin(f"{b}.attn.proj", f"{d}/attn/proj")
        lin(f"{b}.mlp.fc1", f"{d}/fc1")
        lin(f"{b}.mlp.fc2", f"{d}/fc2")
        r[f"{b}.ls1.gamma"] = (f"{d}/ls1", None)
        r[f"{b}.ls2.gamma"] = (f"{d}/ls2", None)

    # ---- DPT head ----------------------------------------------------------
    d = "depth_head"
    for i in range(4):
        conv(f"{d}.projects.{i}", f"depth_head/project{i}")
        conv(f"{d}.scratch.layer{i + 1}_rn", f"depth_head/scratch{i}",
             bias=False)
    conv(f"{d}.resize_layers.0", "depth_head/resize0", tr=_convT_w)
    conv(f"{d}.resize_layers.1", "depth_head/resize1", tr=_convT_w)
    conv(f"{d}.resize_layers.3", "depth_head/resize3")
    for i in range(1, 5):
        rb, db = f"{d}.scratch.refinenet{i}", f"depth_head/refine{i}"
        # refinenet4 gets no skip input, so torch's resConfUnit1 there is
        # dead weight — it has no flax counterpart and lands in `unused`
        units = ((2, "rcu2"),) if i == 4 else ((1, "rcu1"), (2, "rcu2"))
        for u, fu in units:
            conv(f"{rb}.resConfUnit{u}.conv1", f"{db}/{fu}/conv1")
            conv(f"{rb}.resConfUnit{u}.conv2", f"{db}/{fu}/conv2")
        conv(f"{rb}.out_conv", f"{db}/out_conv")
    conv(f"{d}.scratch.output_conv1", "depth_head/out_conv1")
    conv(f"{d}.scratch.output_conv2.0", "depth_head/out_conv2a")
    conv(f"{d}.scratch.output_conv2.2", "depth_head/out_conv2b")
    return r


def _insert(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(sd: dict, cfg: DAConfig = DAConfig()):
    """Torch state dict (tensor or ndarray values) -> (flax params, report)."""
    rmap = rules(cfg)
    params: dict = {}
    unused, missing = [], []
    for k, v in sd.items():
        if k not in rmap:
            unused.append(k)
            continue
        dst, tr = rmap[k]
        a = np.asarray(getattr(v, "detach", lambda: v)().numpy()
                       if hasattr(v, "detach") else v, np.float32)
        _insert(params, dst, tr(a) if tr else a)
    for k in rmap:
        if k not in sd:
            missing.append(k)
    return params, {"unused": unused, "missing": missing}


def convert_torch_checkpoint(path: str, cfg: DAConfig = DAConfig()):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params, report = convert_state_dict(sd, cfg)
    if report["missing"]:
        raise ValueError(
            f"checkpoint missing {len(report['missing'])} expected keys, "
            f"e.g. {report['missing'][:5]}")
    return params
