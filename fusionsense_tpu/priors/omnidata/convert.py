"""Omnidata DPT-Hybrid checkpoint -> flax params (weights-gated).

Maps the ``omnidata_dpt_normal_v2.ckpt`` state dict (MiDaS/timm key
layout: ``pretrained.model.*`` hybrid backbone,
``pretrained.act_postprocess{3,4}.*`` readouts, ``scratch.*`` DPT head;
loaded by reference dn_splatter/scripts/normals_from_pretrain.py:309-322
after stripping a "model." prefix) onto this package's flax tree.
"""
from __future__ import annotations

import numpy as np

from fusionsense_tpu.priors.omnidata.dpt_hybrid import OmniConfig


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def _lin_w(a):
    return np.transpose(a, (1, 0))


def rules(cfg: OmniConfig = OmniConfig()) -> dict:
    r: dict = {}

    def conv(src, dst, bias=True):
        r[f"{src}.weight"] = (f"{dst}/kernel", _conv_w)
        if bias:
            r[f"{src}.bias"] = (f"{dst}/bias", None)

    def lin(src, dst):
        r[f"{src}.weight"] = (f"{dst}/kernel", _lin_w)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    def norm(src, dst):
        r[f"{src}.weight"] = (f"{dst}/scale", None)
        r[f"{src}.bias"] = (f"{dst}/bias", None)

    m = "pretrained.model"
    bb = f"{m}.patch_embed.backbone"
    conv(f"{bb}.stem.conv", "backbone/stem_conv", bias=False)
    norm(f"{bb}.stem.norm", "backbone/stem_norm")
    for si, reps in enumerate(cfg.stage_layout):
        for bi in range(reps):
            src = f"{bb}.stages.{si}.blocks.{bi}"
            dst = f"backbone/stage{si}_block{bi}"
            for k in (1, 2, 3):
                norm(f"{src}.norm{k}", f"{dst}/norm{k}")
                conv(f"{src}.conv{k}", f"{dst}/conv{k}", bias=False)
            if bi == 0:
                conv(f"{src}.downsample.conv", f"{dst}/downsample_conv",
                     bias=False)
    # 1x1 patch embed == Dense over the flattened /16 feature
    r[f"{m}.patch_embed.proj.weight"] = (
        "patch_embed/kernel", lambda a: a[:, :, 0, 0].transpose(1, 0))
    r[f"{m}.patch_embed.proj.bias"] = ("patch_embed/bias", None)
    r[f"{m}.cls_token"] = ("cls_token", lambda a: a.reshape(1, -1))
    r[f"{m}.pos_embed"] = ("pos_embed",
                           lambda a: a.reshape(a.shape[1], a.shape[2]))
    for i in range(cfg.vit_depth):
        src, dst = f"{m}.blocks.{i}", f"block{i}"
        norm(f"{src}.norm1", f"{dst}/norm1")
        lin(f"{src}.attn.qkv", f"{dst}/qkv")
        lin(f"{src}.attn.proj", f"{dst}/attn_proj")
        norm(f"{src}.norm2", f"{dst}/norm2")
        lin(f"{src}.mlp.fc1", f"{dst}/fc1")
        lin(f"{src}.mlp.fc2", f"{dst}/fc2")

    lin("pretrained.act_postprocess3.0.project.0", "readout3_proj")
    lin("pretrained.act_postprocess4.0.project.0", "readout4_proj")
    conv("pretrained.act_postprocess3.3", "post3")
    conv("pretrained.act_postprocess4.3", "post4a")
    conv("pretrained.act_postprocess4.4", "post4b")

    for i in range(4):
        conv(f"scratch.layer{i + 1}_rn", f"scratch{i + 1}", bias=False)
    for i in range(1, 5):
        src, dst = f"scratch.refinenet{i}", f"refine{i}"
        for u, fu in ((1, "rcu1"), (2, "rcu2")):
            if i == 4 and u == 1:
                continue      # refinenet4 has no skip; torch unit is dead
            conv(f"{src}.resConfUnit{u}.conv1", f"{dst}/{fu}/conv1")
            conv(f"{src}.resConfUnit{u}.conv2", f"{dst}/{fu}/conv2")
        conv(f"{src}.out_conv", f"{dst}/out_conv")
    conv("scratch.output_conv.0", "head0")
    conv("scratch.output_conv.2", "head2")
    conv("scratch.output_conv.4", "head4")
    return r


def convert_state_dict(state: dict,
                       cfg: OmniConfig = OmniConfig()) -> dict:
    rmap = rules(cfg)
    params: dict = {}
    for key, value in state.items():
        key = key.removeprefix("model.")
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


def convert_omnidata_checkpoint(path: str,
                                cfg: OmniConfig = OmniConfig()) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    state = {k[6:] if k.startswith("model.") else k: v
             for k, v in state.items()}
    return convert_state_dict(state, cfg)
