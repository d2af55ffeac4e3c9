"""Torch DSINE checkpoint -> flax params (weights-gated).

Maps the published DSINE checkpoint (torch.hub `dsine.pt`, loaded by
reference dsine_predictor.py:52-66; module structure per dsine.py +
submodules.py + geffnet tf_efficientnet_b5_ap) onto this package's flax
tree. Conventions: conv NCHW->HWIO (depthwise (C,1,k,k)->(k,k,1,C)),
SE 1x1 convs -> Dense, BN running stats -> {mean, var} parameters.
"""
from __future__ import annotations

import numpy as np

from fusionsense_tpu.priors.dsine.model import DSINEConfig


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def _se_w(a):
    return np.transpose(a[:, :, 0, 0], (1, 0))


def _bn(src: str, dst: str):
    return {f"{src}.weight": (f"{dst}/scale", None),
            f"{src}.bias": (f"{dst}/bias", None),
            f"{src}.running_mean": (f"{dst}/mean", None),
            f"{src}.running_var": (f"{dst}/var", None)}


def _conv(src: str, dst: str, bias=True, key="kernel"):
    rules = {f"{src}.weight": (f"{dst}/{key}", _conv_w)}
    if bias:
        rules[f"{src}.bias"] = (f"{dst}/bias", None)
    return rules


def _head(src: str, dst: str):
    r = {}
    for t_idx, name in ((0, "conv0"), (2, "conv1"), (4, "conv2")):
        r.update(_conv(f"{src}.{t_idx}", f"{dst}/{name}"))
    return r


def build_rules(cfg: DSINEConfig = DSINEConfig()) -> dict:
    r: dict = {}
    enc = "encoder.original_model"
    r.update(_conv(f"{enc}.conv_stem", "encoder/conv_stem", bias=False))
    r.update(_bn(f"{enc}.bn1", "encoder/bn1"))
    for i, (reps, _out, _k, _s, exp) in enumerate(cfg.effnet.stages):
        for j in range(reps):
            src = f"{enc}.blocks.{i}.{j}"
            dst = f"encoder/blocks_{i}_{j}"
            if exp == 1:     # DepthwiseSeparable
                r.update(_conv(f"{src}.conv_dw", f"{dst}/conv_dw",
                               bias=False))
                r.update(_bn(f"{src}.bn1", f"{dst}/bn1"))
                r[f"{src}.se.conv_reduce.weight"] = (
                    f"{dst}/se/conv_reduce/kernel", _se_w)
                r[f"{src}.se.conv_reduce.bias"] = (
                    f"{dst}/se/conv_reduce/bias", None)
                r[f"{src}.se.conv_expand.weight"] = (
                    f"{dst}/se/conv_expand/kernel", _se_w)
                r[f"{src}.se.conv_expand.bias"] = (
                    f"{dst}/se/conv_expand/bias", None)
                r.update(_conv(f"{src}.conv_pw", f"{dst}/conv_pw",
                               bias=False))
                r.update(_bn(f"{src}.bn2", f"{dst}/bn2"))
            else:            # InvertedResidual
                r.update(_conv(f"{src}.conv_pw", f"{dst}/conv_pw",
                               bias=False))
                r.update(_bn(f"{src}.bn1", f"{dst}/bn1"))
                r.update(_conv(f"{src}.conv_dw", f"{dst}/conv_dw",
                               bias=False))
                r.update(_bn(f"{src}.bn2", f"{dst}/bn2"))
                r[f"{src}.se.conv_reduce.weight"] = (
                    f"{dst}/se/conv_reduce/kernel", _se_w)
                r[f"{src}.se.conv_reduce.bias"] = (
                    f"{dst}/se/conv_reduce/bias", None)
                r[f"{src}.se.conv_expand.weight"] = (
                    f"{dst}/se/conv_expand/kernel", _se_w)
                r[f"{src}.se.conv_expand.bias"] = (
                    f"{dst}/se/conv_expand/bias", None)
                r.update(_conv(f"{src}.conv_pwl", f"{dst}/conv_pwl",
                               bias=False))
                r.update(_bn(f"{src}.bn3", f"{dst}/bn3"))
    r.update(_conv(f"{enc}.conv_head", "encoder/conv_head", bias=False))

    # decoder
    r.update(_conv("decoder.conv2", "conv2"))
    for up in ("up1", "up2"):
        for t_idx, (cname, gname) in ((0, ("conv0", "gn0")),
                                      (3, ("conv1", "gn1"))):
            r.update(_conv(f"decoder.{up}._net.{t_idx}", f"{up}/{cname}"))
            r[f"decoder.{up}._net.{t_idx + 1}.weight"] = (
                f"{up}/{gname}/scale", None)
            r[f"decoder.{up}._net.{t_idx + 1}.bias"] = (
                f"{up}/{gname}/bias", None)
    r.update(_head("decoder.normal_head", "normal_head"))
    r.update(_head("decoder.feature_head", "feature_head"))
    r.update(_head("decoder.hidden_head", "hidden_head"))

    # refinement
    for g in ("convz", "convr", "convq"):
        r.update(_conv(f"gru.{g}", f"gru/{g}"))
    r.update(_head("prob_head", "prob_head"))
    r.update(_head("xy_head", "xy_head"))
    r.update(_head("angle_head", "angle_head"))
    r.update(_head("up_prob_head", "up_prob_head"))
    return r


def convert_state_dict(state: dict, cfg: DSINEConfig = DSINEConfig()) -> dict:
    rules = build_rules(cfg)
    params: dict = {}
    for key, value in state.items():
        key = key.removeprefix("module.").removeprefix("model.")
        if key not in rules:
            continue
        path, tf = rules[key]
        arr = np.asarray(value, np.float32)
        if tf is not None:
            arr = tf(arr)
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return params


def convert_dsine_checkpoint(path: str,
                             cfg: DSINEConfig = DSINEConfig()) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    return convert_state_dict(state, cfg)
