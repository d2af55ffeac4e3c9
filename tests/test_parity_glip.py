"""Round-trip parity: reference GLIP torch modules (random weights) ->
converter -> flax detection stack (VERDICT round-2 missing item #1).

The torch side is the reference source verbatim
(PartSlip/GLIP/maskrcnn_benchmark), loaded through tests/torch_ref/glip_ref
with CPU shims for the CUDA-only deform convs.  Compared piecewise:

- Swin backbone stage outputs  (modeling/backbone/swint.py:431)
- FPN + LastLevelP6P7          (modeling/backbone/fpn.py:6,137)
- BERT language backbone       (modeling/language_backbone/bert_model.py:10
                                wraps HF BertModel — instantiated directly
                                with random weights, no download)
- VLDyHead tower + heads       (modeling/rpn/vldyhead.py:560-859), incl.
                                per-level bbox/centerness/dot-product
                                logits and a measured bound on the
                                documented DyConv top-down offset deviation
                                (fusionsense_tpu/detection/head.py:11-18)

All comparisons run in float64 to separate semantics from fp drift.
"""
import numpy as np
import pytest
import torch

import contextlib

import jax


@contextlib.contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


from tests.torch_ref.glip_ref import load_swint, load_fpn, load_vldyhead


def _randomize(module, seed=0, std=0.05):
    # random weights, rounded to f32 so the converter's float32 output is
    # exact and f64 comparisons isolate semantics
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, std, generator=g)
            p.copy_(p.to(torch.float32).to(p.dtype))


def _f64(params):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), params)


TINY = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
            window=4)
# GLIP Swin-L, the width the reference actually deploys
# (PartSlip/GLIP/.../backbone/swint.py:623 via configs/pretrain/
# glip_Swin_L.yaml: embed 192, depths 2/2/18/2, window 12) — exercises
# the window-12 relative-position bias tables (23x23), the real GN/head
# splits, and the 18-block stage3 that tiny configs cannot.
SWIN_L = dict(embed_dim=192, depths=(2, 2, 18, 2),
              num_heads=(6, 12, 24, 48), window=12)


def _swin_pair(spec, seed=0):
    from fusionsense_tpu.detection.swin import SwinConfig

    swint = load_swint()
    torch.manual_seed(seed)
    net = swint.SwinTransformer(
        pretrain_img_size=224, patch_size=4, in_chans=3,
        embed_dim=spec["embed_dim"], depths=list(spec["depths"]),
        num_heads=list(spec["num_heads"]), window_size=spec["window"],
        ape=False, drop_path_rate=0.0,
        out_features=["stage3", "stage4", "stage5"],
        frozen_stages=-1, use_checkpoint=False)
    net.eval()          # reference train() override returns None
    net = net.double()
    _randomize(net, seed)
    cfg = SwinConfig(embed_dim=spec["embed_dim"], depths=spec["depths"],
                     num_heads=spec["num_heads"], window=spec["window"])
    return net, cfg


def _run_swin_parity(spec, hw, seed=0):
    from fusionsense_tpu.detection.convert import convert_state_dict
    from fusionsense_tpu.detection.swin import SwinTransformer

    net, cfg = _swin_pair(spec, seed)
    state = {f"backbone.body.{k}": v.numpy()
             for k, v in net.state_dict().items()}
    params = _f64(convert_state_dict(state, depths=cfg.depths)["backbone"])

    rng = np.random.default_rng(seed)
    img = rng.normal(size=(3, *hw)).astype(np.float32).astype(np.float64)
    with torch.no_grad():
        ref = net(torch.from_numpy(img[None]))
    with enable_x64():
        got = SwinTransformer(cfg).apply({"params": params},
                                         np.transpose(img, (1, 2, 0)))
    assert len(got) == len(ref) == 3
    for lv, (g, r) in enumerate(zip(got, ref)):
        r = r.numpy()[0]                      # (C, h, w)
        g = np.transpose(np.asarray(g), (2, 0, 1))
        np.testing.assert_allclose(g, r, rtol=1e-8, atol=1e-9,
                                   err_msg=f"stage {lv}")


def test_swin_stage_parity():
    _run_swin_parity(TINY, (64, 96))


@pytest.mark.slow
def test_swin_large_stage_parity():
    """Full-width Swin-L round trip (VERDICT r3 directive #4). 96x144
    input gives a 24x36 stage-1 map: multi-window partitioning AND
    shifted-window attention masks at window 12, plus window padding at
    the deeper stages."""
    _run_swin_parity(SWIN_L, (96, 144), seed=11)


def test_fpn_parity():
    from fusionsense_tpu.detection.convert import convert_state_dict
    from fusionsense_tpu.detection.fpn import FPN

    fpn_mod = load_fpn()
    torch.manual_seed(1)
    chans = [32, 64, 128]
    out_c = 32
    conv_block = lambda i, o, k, s=1: torch.nn.Conv2d(
        i, o, k, stride=s, padding=k // 2)
    top = fpn_mod.LastLevelP6P7(out_c, out_c)
    net = fpn_mod.FPN([0] + chans, out_c, conv_block, top_blocks=top)
    net = net.eval().double()
    _randomize(net, 1)

    state = {f"backbone.fpn.{k}": v.numpy()
             for k, v in net.state_dict().items()}
    params = _f64(convert_state_dict(state)["fpn"])

    rng = np.random.default_rng(1)
    feats_np = [rng.normal(size=(c, 16 // (2 ** i), 24 // (2 ** i)))
                .astype(np.float32).astype(np.float64)
                for i, c in enumerate(chans)]
    with torch.no_grad():
        ref = net([torch.from_numpy(f[None]) for f in feats_np])
    with enable_x64():
        got = FPN(out_c).apply(
            {"params": params},
            [np.transpose(f, (1, 2, 0)) for f in feats_np])
    assert len(got) == len(ref) == 5
    for lv, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (2, 0, 1)), r.numpy()[0],
            rtol=1e-8, atol=1e-9, err_msg=f"P{lv + 3}")


def test_bert_parity():
    """Flax BertEncoder vs HF BertModel (the reference language backbone's
    core, bert_model.py:18-21) — final hidden states."""
    import transformers

    from fusionsense_tpu.detection.bert import BertConfig, BertEncoder
    from fusionsense_tpu.detection.convert import convert_state_dict

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    net = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    net = net.eval().double()
    _randomize(net, 2)

    state = {f"language_backbone.body.model.{k}": v.numpy()
             for k, v in net.state_dict().items()}
    params = _f64(convert_state_dict(state, bert_layers=2)
                  ["language_backbone"])

    cfg = BertConfig(vocab_size=128, hidden=32, layers=2, heads=2,
                     intermediate=64, max_positions=64)
    rng = np.random.default_rng(2)
    T = 16
    ids = rng.integers(0, 128, size=(T,))
    mask = np.ones(T, np.int32)
    mask[12:] = 0
    with torch.no_grad():
        ref = net(input_ids=torch.from_numpy(ids[None]),
                  attention_mask=torch.from_numpy(mask[None]))
    with enable_x64():
        got = BertEncoder(cfg).apply({"params": params}, ids, mask)
    # padded positions attend differently (HF masks them too) — compare
    # the valid prefix
    np.testing.assert_allclose(np.asarray(got)[:12],
                               ref.last_hidden_state.numpy()[0][:12],
                               rtol=1e-8, atol=1e-9)


def _head_cfg(channels, num_convs, lang_dim, max_len):
    """Reference cfg for VLDyHead with the GLIP Swin-L switches
    (configs/pretrain/glip_Swin_L.yaml MODEL.DYHEAD), tiny widths."""
    from maskrcnn_benchmark.config import cfg as base

    c = base.clone()
    m = c.MODEL
    m.LANGUAGE_BACKBONE.MODEL_TYPE = "bert-base-uncased"
    m.LANGUAGE_BACKBONE.MAX_QUERY_LEN = max_len
    m.LANGUAGE_BACKBONE.LANG_DIM = lang_dim
    m.BACKBONE.OUT_CHANNELS = channels
    m.DYHEAD.CHANNELS = channels
    m.DYHEAD.NUM_CONVS = num_convs
    m.DYHEAD.USE_GN = True
    m.DYHEAD.USE_DYRELU = True
    m.DYHEAD.USE_DYFUSE = True
    m.DYHEAD.USE_DFCONV = True
    m.DYHEAD.USE_CHECKPOINT = False
    m.DYHEAD.LOG_SCALE = 0.0
    fc = m.DYHEAD.FUSE_CONFIG
    fc.JOINT_EMB_SIZE = channels      # v_dim of the bi-attention
    fc.EARLY_FUSE_ON = True
    fc.TYPE = "MHA-B"
    fc.USE_DOT_PRODUCT_TOKEN_LOSS = True
    fc.USE_FUSED_FEATURES_DOT_PRODUCT = True
    fc.USE_LAYER_SCALE = True
    fc.CLAMP_MIN_FOR_UNDERFLOW = True
    fc.CLAMP_MAX_FOR_OVERFLOW = True
    fc.CLAMP_BERTATTN_MIN_FOR_UNDERFLOW = True
    fc.CLAMP_BERTATTN_MAX_FOR_OVERFLOW = True
    fc.CLAMP_DOT_PRODUCT = True
    m.RPN.ASPECT_RATIOS = (1.0,)
    m.RPN.SCALES_PER_OCTAVE = 1
    return c


def _run_vldyhead_parity(channels, num_convs, lang_dim, T, base_hw,
                         n_levels, bert_heads, intermediate, seed=3):
    """Full tower round-trip: torch VLDyHead (reference source, CPU deform
    shim) vs flax VLDyHead — per-level bbox/centerness/dot-product logits.
    Includes the exact replication of the reference's offset-buffer
    reinterpretation in DyConv's top-down branch."""
    import types

    import transformers

    from fusionsense_tpu.detection.bert import BertConfig
    from fusionsense_tpu.detection.convert import convert_state_dict
    from fusionsense_tpu.detection.head import VLDyHead

    vld = load_vldyhead()
    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=lang_dim, num_hidden_layers=1,
        num_attention_heads=bert_heads, intermediate_size=intermediate,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    old_bc = vld.BertConfig
    vld.BertConfig = types.SimpleNamespace(
        from_pretrained=lambda name: hf_cfg)
    try:
        cfg = _head_cfg(channels, num_convs, lang_dim, T)
        torch.manual_seed(seed)
        net = vld.VLDyHead(cfg)
    finally:
        vld.BertConfig = old_bc
    net.eval()
    net = net.double()
    _randomize(net, seed)

    state = {f"rpn.head.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = _f64(convert_state_dict(state, num_convs=num_convs,
                                     bert_layers=1)["head"])
    # tower lang layers: converter path head/lang_layer_{i} comes from the
    # same per-layer rules used for the backbone
    rng = np.random.default_rng(seed)
    # ceil-division pyramid (like a real FPN): stride-2 convs between
    # adjacent levels then produce exactly the next level's shape
    sizes, (h, w) = [], base_hw
    for _ in range(n_levels):
        sizes.append((h, w))
        h, w = -(-h // 2), -(-w // 2)
    feats = [rng.normal(size=(channels, hh, ww))
             .astype(np.float32).astype(np.float64) for hh, ww in sizes]
    hidden = rng.normal(size=(T, lang_dim)).astype(np.float32) \
        .astype(np.float64)
    mask = np.ones(T, np.int64)
    mask[T - 4:] = 0
    valid = T - 4

    with torch.no_grad():
        logits, bbox_reg, centerness, *_rest, dot_logits, _mlm, _sh, _fv = \
            net([torch.from_numpy(f[None]) for f in feats],
                language_dict_features={
                    "hidden": torch.from_numpy(hidden[None]),
                    "masks": torch.from_numpy(mask[None])})

    bert_cfg = BertConfig(vocab_size=64, hidden=lang_dim, layers=1,
                          heads=bert_heads, intermediate=intermediate,
                          max_positions=max(64, T))
    model = VLDyHead(bert_cfg, channels, num_convs, fuse_embed=2048)
    with enable_x64():
        got = model.apply({"params": params},
                          [np.transpose(f, (1, 2, 0)) for f in feats],
                          hidden, mask)

    for lv in range(n_levels):
        bbox_t = bbox_reg[lv].numpy()[0]          # (4, h, w)
        ctr_t = centerness[lv].numpy()[0, 0]      # (h, w)
        dot_t = dot_logits[lv].numpy()[0]         # (HW, T)
        bbox_g, ctr_g, dot_g = got[lv]
        h, w = bbox_t.shape[1:]
        np.testing.assert_allclose(
            np.asarray(bbox_g).reshape(h, w, 4).transpose(2, 0, 1), bbox_t,
            rtol=1e-7, atol=1e-8, err_msg=f"bbox level {lv}")
        np.testing.assert_allclose(np.asarray(ctr_g).reshape(h, w), ctr_t,
                                   rtol=1e-7, atol=1e-8,
                                   err_msg=f"ctr level {lv}")
        np.testing.assert_allclose(np.asarray(dot_g)[:, :valid],
                                   dot_t[:, :valid], rtol=1e-7, atol=1e-8,
                                   err_msg=f"dot level {lv}")


def test_vldyhead_parity():
    _run_vldyhead_parity(channels=32, num_convs=2, lang_dim=32, T=16,
                         base_hw=(16, 24), n_levels=5, bert_heads=2,
                         intermediate=64)


@pytest.mark.slow
def test_vldyhead_full_width_parity():
    """Full-width VLDyHead (VERDICT r3 directive #4): the GLIP Swin-L
    deployment's 8-DyConv tower at CHANNELS=256 / LANG_DIM=768 /
    BERT-base head split (vldyhead.py:560 + configs/pretrain/
    glip_Swin_L.yaml MODEL.DYHEAD), on the 5-level pyramid the reference
    VLFuse hard-codes (vldyhead.py:496) — exercises the real GN group
    counts, the 2048-wide fused bi-attention at true v/l dims, and the
    offset-buffer reinterpretation at production widths."""
    _run_vldyhead_parity(channels=256, num_convs=8, lang_dim=768, T=24,
                         base_hw=(12, 18), n_levels=5, bert_heads=12,
                         intermediate=3072, seed=13)


@pytest.mark.slow
def test_bert_base_full_width_parity():
    """BERT-base (12 layers, hidden 768 — the reference language backbone,
    bert_model.py:10) at full width, random weights (VERDICT r3 #4)."""
    import transformers

    from fusionsense_tpu.detection.bert import BertConfig, BertEncoder
    from fusionsense_tpu.detection.convert import convert_state_dict

    hf_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(17)
    net = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    net = net.eval().double()
    _randomize(net, 17)

    state = {f"language_backbone.body.model.{k}": v.numpy()
             for k, v in net.state_dict().items()}
    params = _f64(convert_state_dict(state, bert_layers=12)
                  ["language_backbone"])

    cfg = BertConfig(vocab_size=512, hidden=768, layers=12, heads=12,
                     intermediate=3072, max_positions=128)
    rng = np.random.default_rng(17)
    T = 32
    ids = rng.integers(0, 512, size=(T,))
    mask = np.ones(T, np.int32)
    mask[26:] = 0
    with torch.no_grad():
        ref = net(input_ids=torch.from_numpy(ids[None]),
                  attention_mask=torch.from_numpy(mask[None]))
    with enable_x64():
        got = BertEncoder(cfg).apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(got)[:26],
                               ref.last_hidden_state.numpy()[0][:26],
                               rtol=1e-8, atol=1e-9)
