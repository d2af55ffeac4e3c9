"""Metric3D torch checkpoint -> flax params (weights-gated).

The hub repo (yvanyin/metric3d) is unreachable air-gapped and the
reference does not vendor its source, so the pinned layout is the torch
replica's (tests/torch_ref/metric3d_torch.py; round-trip parity in
tests/test_parity_metric3d.py). ``STRIP_PREFIXES`` absorbs the common hub
wrappers (module./model./depth_model.) so a real checkpoint whose inner
names match lands without edits; a first contact with real weights should
extend the rules here (documented verification boundary, see model.py).
"""
from __future__ import annotations

import numpy as np

from fusionsense_tpu.priors.metric3d.model import M3DConfig

STRIP_PREFIXES = ("module.", "model.", "depth_model.")


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def _convT_w(a):
    # flip both spatial dims: flax conv_transpose correlates with the
    # kernel as-is; torch's ConvTranspose2d rotates taps 180deg (see
    # depth_anything/convert.py)
    return np.ascontiguousarray(np.transpose(a, (2, 3, 0, 1))[::-1, ::-1])


def _lin_w(a):
    return np.transpose(a, (1, 0))


def rules(cfg: M3DConfig = M3DConfig()) -> dict:
    r: dict = {}

    def conv(src, dst, bias=True, tr=_conv_w):
        r[f"{src}.weight"] = (f"{dst}/kernel", tr)
        if bias:
            r[f"{src}.bias"] = (f"{dst}/bias", None)

    def lin(src, dst):
        r[f"{src}.weight"] = (f"{dst}/kernel", _lin_w)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    def ln(src, dst):
        r[f"{src}.weight"] = (f"{dst}/scale", None)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    e = "encoder"
    r[f"{e}.cls_token"] = ("encoder/cls_token", lambda a: a.reshape(1, -1))
    r[f"{e}.register_tokens"] = (
        "encoder/register_tokens", lambda a: a.reshape(a.shape[-2], a.shape[-1]))
    r[f"{e}.pos_embed"] = ("encoder/pos_embed",
                           lambda a: a.reshape(a.shape[-2], a.shape[-1]))
    conv(f"{e}.patch_embed.proj", "encoder/patch_embed")
    ln(f"{e}.norm", "encoder/norm")
    for i in range(cfg.depth):
        b, d = f"{e}.blocks.{i}", f"encoder/block{i}"
        ln(f"{b}.norm1", f"{d}/norm1")
        ln(f"{b}.norm2", f"{d}/norm2")
        lin(f"{b}.attn.qkv", f"{d}/attn/qkv")
        lin(f"{b}.attn.proj", f"{d}/attn/proj")
        lin(f"{b}.mlp.fc1", f"{d}/fc1")
        lin(f"{b}.mlp.fc2", f"{d}/fc2")
        r[f"{b}.ls1.gamma"] = (f"{d}/ls1", None)
        r[f"{b}.ls2.gamma"] = (f"{d}/ls2", None)

    de = "decoder"
    for i in range(4):
        conv(f"{de}.projects.{i}", f"decoder/project{i}")
        conv(f"{de}.scratch.{i}", f"decoder/scratch{i}", bias=False)
    conv(f"{de}.resize_layers.0", "decoder/resize0", tr=_convT_w)
    conv(f"{de}.resize_layers.1", "decoder/resize1", tr=_convT_w)
    conv(f"{de}.resize_layers.3", "decoder/resize3")
    for i in range(1, 5):
        rb, db = f"{de}.refinenet{i}", f"decoder/refine{i}"
        units = ((2, "rcu2"),) if i == 4 else ((1, "rcu1"), (2, "rcu2"))
        for u, fu in units:
            conv(f"{rb}.resConfUnit{u}.conv1", f"{db}/{fu}/conv1")
            conv(f"{rb}.resConfUnit{u}.conv2", f"{db}/{fu}/conv2")
        conv(f"{rb}.out_conv", f"{db}/out_conv")
    conv(f"{de}.init_pred", "decoder/init_pred")
    conv(f"{de}.init_hidden", "decoder/init_hidden")
    conv(f"{de}.init_context", "decoder/init_context")
    for g in ("convz", "convr", "convq"):
        conv(f"{de}.gru.{g}", f"decoder/gru/{g}")
    conv(f"{de}.delta_hidden", "decoder/delta_hidden")
    conv(f"{de}.delta_head", "decoder/delta_head")
    conv(f"{de}.up_mask", "decoder/up_mask")
    return r


def convert_state_dict(state: dict, cfg: M3DConfig = M3DConfig()) -> dict:
    rmap = rules(cfg)
    params: dict = {}
    for key, value in state.items():
        for p in STRIP_PREFIXES:
            key = key.removeprefix(p)
        if key not in rmap:
            continue
        dst, tf = rmap[key]
        a = np.asarray(getattr(value, "detach", lambda: value)().numpy()
                       if hasattr(value, "detach") else value, np.float32)
        if tf is not None:
            a = tf(a)
        node = params
        parts = dst.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = a
    return params


def convert_metric3d_checkpoint(path: str,
                                cfg: M3DConfig = M3DConfig()) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
    return convert_state_dict(state, cfg)
