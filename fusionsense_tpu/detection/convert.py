"""Torch GLIP checkpoint -> flax params converter (weights-gated).

Maps the published GLIP Swin-L state dict (glip_large_model.pth,
PartSlip/download_ckpts.sh:7; module structure per
maskrcnn_benchmark/modeling/{backbone/swint.py,backbone/fpn.py,
rpn/vldyhead.py,language_backbone/bert_model.py}) onto the flax module
tree in this package. Convention changes: conv kernels NCHW->HWIO, linear
weights transposed, LayerNorm/GroupNorm `weight`->`scale`.

Air-gapped environments have no checkpoint; `expected_torch_keys` lets
tests verify the mapping against a randomly-initialized flax tree.
"""
from __future__ import annotations

import re

import numpy as np


def _conv_w(a):
    return np.transpose(a, (2, 3, 1, 0))


def _lin_w(a):
    return np.transpose(a, (1, 0))


def _bert_layer_rules(dst_prefix: str):
    """HF bert layer key suffix -> (flax path, transform)."""
    return {
        "attention.self.query.weight": (f"{dst_prefix}/attention/query/kernel", _lin_w),
        "attention.self.query.bias": (f"{dst_prefix}/attention/query/bias", None),
        "attention.self.key.weight": (f"{dst_prefix}/attention/key/kernel", _lin_w),
        "attention.self.key.bias": (f"{dst_prefix}/attention/key/bias", None),
        "attention.self.value.weight": (f"{dst_prefix}/attention/value/kernel", _lin_w),
        "attention.self.value.bias": (f"{dst_prefix}/attention/value/bias", None),
        "attention.output.dense.weight": (f"{dst_prefix}/attention/out/kernel", _lin_w),
        "attention.output.dense.bias": (f"{dst_prefix}/attention/out/bias", None),
        "attention.output.LayerNorm.weight": (f"{dst_prefix}/attention_norm/scale", None),
        "attention.output.LayerNorm.bias": (f"{dst_prefix}/attention_norm/bias", None),
        "intermediate.dense.weight": (f"{dst_prefix}/intermediate/kernel", _lin_w),
        "intermediate.dense.bias": (f"{dst_prefix}/intermediate/bias", None),
        "output.dense.weight": (f"{dst_prefix}/output/kernel", _lin_w),
        "output.dense.bias": (f"{dst_prefix}/output/bias", None),
        "output.LayerNorm.weight": (f"{dst_prefix}/output_norm/scale", None),
        "output.LayerNorm.bias": (f"{dst_prefix}/output_norm/bias", None),
    }


def _norm(name_w: str, name_b: str, dst: str):
    return {name_w: (f"{dst}/scale", None), name_b: (f"{dst}/bias", None)}


def _linear(src: str, dst: str):
    return {f"{src}.weight": (f"{dst}/kernel", _lin_w),
            f"{src}.bias": (f"{dst}/bias", None)}


def _conv(src: str, dst: str, bias=True):
    rules = {f"{src}.weight": (f"{dst}/kernel", _conv_w)}
    if bias:
        rules[f"{src}.bias"] = (f"{dst}/bias", None)
    return rules


def build_rules(depths=(2, 2, 18, 2), num_convs: int = 8,
                bert_layers: int = 12) -> dict:
    """torch key -> (flax 'a/b/c' path, transform|None)."""
    r: dict = {}

    # ---- Swin backbone -------------------------------------------------
    bb = "backbone.body"
    r.update(_conv(f"{bb}.patch_embed.proj", "backbone/patch_embed_proj"))
    r.update(_norm(f"{bb}.patch_embed.norm.weight",
                   f"{bb}.patch_embed.norm.bias",
                   "backbone/patch_embed_norm"))
    for i, depth in enumerate(depths):
        for b in range(depth):
            src = f"{bb}.layers.{i}.blocks.{b}"
            dst = f"backbone/layers_{i}_blocks_{b}"
            r.update(_norm(f"{src}.norm1.weight", f"{src}.norm1.bias",
                           f"{dst}/norm1"))
            r[f"{src}.attn.relative_position_bias_table"] = (
                f"{dst}/attn/relative_position_bias_table", None)
            r.update(_linear(f"{src}.attn.qkv", f"{dst}/attn/qkv"))
            r.update(_linear(f"{src}.attn.proj", f"{dst}/attn/proj"))
            r.update(_norm(f"{src}.norm2.weight", f"{src}.norm2.bias",
                           f"{dst}/norm2"))
            r.update(_linear(f"{src}.mlp.fc1", f"{dst}/mlp_fc1"))
            r.update(_linear(f"{src}.mlp.fc2", f"{dst}/mlp_fc2"))
        if i < len(depths) - 1:
            src = f"{bb}.layers.{i}.downsample"
            dst = f"backbone/layers_{i}_downsample"
            r.update(_norm(f"{src}.norm.weight", f"{src}.norm.bias",
                           f"{dst}/norm"))
            r[f"{src}.reduction.weight"] = (f"{dst}/reduction/kernel", _lin_w)
    for i in (1, 2, 3):     # out norms for stages used by the FPN
        r.update(_norm(f"{bb}.norm{i}.weight", f"{bb}.norm{i}.bias",
                       f"backbone/out_norm{i}"))

    # ---- FPN -----------------------------------------------------------
    for i in (1, 2, 3):     # torch names are fpn_inner2..4 (idx from 1, 0 skipped)
        r.update(_conv(f"backbone.fpn.fpn_inner{i + 1}", f"fpn/fpn_inner{i}"))
        r.update(_conv(f"backbone.fpn.fpn_layer{i + 1}", f"fpn/fpn_layer{i}"))
    r.update(_conv("backbone.fpn.top_blocks.p6", "fpn/p6"))
    r.update(_conv("backbone.fpn.top_blocks.p7", "fpn/p7"))

    # ---- BERT language backbone ----------------------------------------
    lb = "language_backbone.body.model"
    r[f"{lb}.embeddings.word_embeddings.weight"] = (
        "language_backbone/word_embeddings", None)
    r[f"{lb}.embeddings.position_embeddings.weight"] = (
        "language_backbone/position_embeddings", None)
    r[f"{lb}.embeddings.token_type_embeddings.weight"] = (
        "language_backbone/token_type_embeddings", None)
    r.update(_norm(f"{lb}.embeddings.LayerNorm.weight",
                   f"{lb}.embeddings.LayerNorm.bias",
                   "language_backbone/embeddings_norm"))
    for i in range(bert_layers):
        for k, v in _bert_layer_rules(f"language_backbone/layer_{i}").items():
            r[f"{lb}.encoder.layer.{i}.{k}"] = v

    # ---- VLDyHead tower --------------------------------------------------
    hd = "rpn.head"
    for i in range(num_convs):
        # VLFuse at tower index 3i
        fz = f"{hd}.dyhead_tower.{3 * i}.b_attn"
        dz = f"head/fuse_{i}/b_attn"
        r[f"{fz}.gamma_v"] = (f"{dz}/gamma_v", None)
        r[f"{fz}.gamma_l"] = (f"{dz}/gamma_l", None)
        r.update(_norm(f"{fz}.layer_norm_v.weight", f"{fz}.layer_norm_v.bias",
                       f"{dz}/layer_norm_v"))
        r.update(_norm(f"{fz}.layer_norm_l.weight", f"{fz}.layer_norm_l.bias",
                       f"{dz}/layer_norm_l"))
        for p in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            r.update(_linear(f"{fz}.attn.{p}", f"{dz}/attn/{p}"))
        # BertEncoderLayer at 3i+1
        for k, v in _bert_layer_rules(f"head/lang_layer_{i}").items():
            r[f"{hd}.dyhead_tower.{3 * i + 1}.{k}"] = v
        # DyConv at 3i+2: torch DyConv.0 -> up branch, .1 -> same, .2 -> down
        dc = f"{hd}.dyhead_tower.{3 * i + 2}"
        dd = f"head/dyconv_{i}"
        for t_idx, branch in ((0, "conv_up"), (1, "conv_mid"),
                              (2, "conv_down")):
            r[f"{dc}.DyConv.{t_idx}.conv.weight"] = (
                f"{dd}/{branch}/weight", _conv_w)
            r[f"{dc}.DyConv.{t_idx}.conv.bias"] = (
                f"{dd}/{branch}/bias", None)
            r.update(_norm(f"{dc}.DyConv.{t_idx}.bn.weight",
                           f"{dc}.DyConv.{t_idx}.bn.bias",
                           f"{dd}/{branch}/gn"))
        r.update(_conv(f"{dc}.AttnConv.1", f"{dd}/attn_conv"))
        r.update(_conv(f"{dc}.offset", f"{dd}/offset"))
        r.update(_linear(f"{dc}.relu.fc.0", f"{dd}/dyrelu/fc1"))
        r.update(_linear(f"{dc}.relu.fc.2", f"{dd}/dyrelu/fc2"))

    # ---- prediction heads ------------------------------------------------
    r.update(_conv(f"{hd}.bbox_pred", "head/bbox_pred"))
    r.update(_conv(f"{hd}.centerness", "head/centerness"))
    for lv in range(5):
        r[f"{hd}.scales.{lv}.scale"] = (f"head/scale_{lv}/scale",
                                        lambda a: np.asarray(a).reshape(()))
    r.update(_linear(f"{hd}.dot_product_projection_text",
                     "head/dot_product_projection_text"))
    r[f"{hd}.log_scale"] = ("head/log_scale", lambda a: a.reshape(1))
    r[f"{hd}.bias_lang"] = ("head/bias_lang", None)
    r[f"{hd}.bias0"] = ("head/bias0", lambda a: a.reshape(1))
    return r


def expected_torch_keys(**kw) -> list[str]:
    return sorted(build_rules(**kw).keys())


def convert_state_dict(state: dict, **kw) -> dict:
    """torch state_dict (tensor/ndarray values) -> nested flax params."""
    rules = build_rules(**kw)
    params: dict = {}
    for key, value in state.items():
        key = key.removeprefix("module.")
        if key not in rules:
            continue        # cls_logits / training-only buffers
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


def convert_glip_checkpoint(path: str, **kw) -> dict:
    """Load a torch .pth and convert (requires torch; weights-gated)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    return convert_state_dict(state, **kw)
