"""Grounded-detector architecture tests (random weights, tiny config).

Covers: deformable conv correctness, Swin/FPN/BERT shapes, tokenizer +
positive maps, anchor/box-decode identities, the full GLIP forward, the
Detector-protocol predictor, and the checkpoint-converter key mapping.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusionsense_tpu.ops.detection import (
    deform_conv2d, deform_roi_pool, roi_pool,
)


# ------------------------------------------------------ deformable ops ----

def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(9, 11, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    off = jnp.zeros((9, 11, 18))
    got = deform_conv2d(x, off, w, mask=jnp.ones((9, 11, 9)))
    want = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_integer_offset_shifts_sampling():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
    # offset of (0, +1) for every tap == conv over x shifted left by 1
    off = jnp.tile(jnp.asarray([0.0, 1.0]), (8, 8, 9))
    got = deform_conv2d(x, off, w, mask=jnp.ones((8, 8, 9)))
    x_shift = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
    want = jax.lax.conv_general_dilated(
        x_shift[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # interior only: zero-padding vs shifted-pad differ at the borders
    np.testing.assert_allclose(np.asarray(got)[1:-1, 1:-2],
                               np.asarray(want)[1:-1, 1:-2],
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_mask_scales_contribution():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    off = jnp.zeros((6, 6, 18))
    full = deform_conv2d(x, off, w, mask=jnp.ones((6, 6, 9)))
    half = deform_conv2d(x, off, w, mask=0.5 * jnp.ones((6, 6, 9)))
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_deform_conv_stride2_shape():
    x = jnp.zeros((9, 9, 2))
    w = jnp.zeros((3, 3, 2, 4))
    off = jnp.zeros((5, 5, 18))
    out = deform_conv2d(x, off, w, stride=2)
    assert out.shape == (5, 5, 4)


def test_roi_pool_max_of_region():
    f = jnp.arange(25.0).reshape(5, 5, 1)
    boxes = jnp.asarray([[0.0, 0.0, 3.0, 3.0]])
    out = roi_pool(f, boxes, output_size=2)
    # bins of rows/cols {0,1} x {2,3}: maxima 6, 8, 16, 18
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0],
                               [[6.0, 8.0], [16.0, 18.0]])


def test_deform_roi_pool_zero_offset_close_to_roi_align():
    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    boxes = jnp.asarray([[2.0, 3.0, 10.0, 12.0]])
    out = deform_roi_pool(f, boxes, jnp.zeros((1, 4, 4, 2)), output_size=4)
    assert out.shape == (1, 4, 4, 3)
    assert np.isfinite(np.asarray(out)).all()
    # shifting by a big offset moves the sample region
    out2 = deform_roi_pool(f, boxes, jnp.ones((1, 4, 4, 2)), output_size=4)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


# ------------------------------------------------------------ modules ----

@pytest.fixture(scope="module")
def tiny():
    from fusionsense_tpu.detection.model import init_params, tiny_config

    cfg = tiny_config()
    params = init_params(cfg, image_hw=(64, 64))
    return cfg, params


@pytest.mark.slow   # compile-heavy full-model forward; math/converter tests stay fast
def test_swin_output_shapes():
    from fusionsense_tpu.detection.swin import SwinConfig, SwinTransformer

    cfg = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1),
                     window=4)
    model = SwinTransformer(cfg)
    img = jnp.zeros((64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(params, img)
    assert [o.shape for o in outs] == [(8, 8, 16), (4, 4, 32), (2, 2, 64)]


def test_swin_shifted_windows_padding():
    from fusionsense_tpu.detection.swin import SwinConfig, SwinTransformer

    # image size NOT divisible by window*stride: padding paths must work
    cfg = SwinConfig(embed_dim=8, depths=(2, 2, 2, 2), num_heads=(1, 1, 1, 1),
                     window=4)
    model = SwinTransformer(cfg)
    img = jnp.ones((52, 44, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(params, img)
    assert outs[0].shape == (7, 6, 16)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_bert_mask_blocks_padding():
    from fusionsense_tpu.detection.bert import BertConfig, BertEncoder

    cfg = BertConfig(vocab_size=50, hidden=16, layers=2, heads=2,
                     intermediate=32, max_positions=32)
    model = BertEncoder(cfg)
    ids = jnp.asarray([2, 5, 7, 3, 0, 0, 0, 0], jnp.int32)
    mask = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out1 = model.apply(params, ids, mask)
    ids2 = ids.at[5].set(9)     # change a PADDED token
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out1)[:4], np.asarray(out2)[:4],
                               atol=1e-5)


def test_tokenizer_wordpiece_and_offsets():
    from fusionsense_tpu.detection.tokenizer import WordPieceTokenizer

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "handle": 4, "lid": 5, ".": 6, "tea": 7, "##pot": 8}
    tok = WordPieceTokenizer(vocab, max_len=16)
    enc = tok.encode("teapot handle . lid")
    # [CLS] tea ##pot handle . lid [SEP]
    assert enc.ids[:7] == [2, 7, 8, 4, 6, 5, 3]
    assert enc.char_to_token(0) == 1        # 't' of teapot
    assert enc.char_to_token(4) == 2        # 'o' in ##pot
    assert enc.char_to_token(7) == 3        # handle
    assert enc.char_to_token(17) == 5       # lid
    assert sum(enc.mask) == 7


def test_positive_map_spans():
    from fusionsense_tpu.detection.model import (
        build_caption, positive_map_from_spans,
    )
    from fusionsense_tpu.detection.tokenizer import WordPieceTokenizer

    caption, spans = build_caption(["teapot", "handle"])
    assert caption == "teapot . handle . "
    tok = WordPieceTokenizer.toy([caption], max_len=16)
    pm = positive_map_from_spans(tok.encode(caption), spans, 16)
    assert pm.shape == (2, 16)
    np.testing.assert_allclose(pm.sum(-1), [1.0, 1.0], atol=1e-4)
    # the two parts hit disjoint tokens
    assert (pm[0] * pm[1]).sum() == 0


def test_anchors_and_decode_identity():
    from fusionsense_tpu.detection.anchors import level_anchors
    from fusionsense_tpu.detection.postprocess import decode_boxes

    anc = level_anchors(4, 6, stride=8, size=64)
    assert anc.shape == (24, 4)
    # center of anchor (0, 0) is at (stride-1)/2, size is 64
    assert np.isclose(anc[0, 2] - anc[0, 0], 63.0)
    np.testing.assert_allclose((anc[0, :2] + anc[0, 2:]) / 2, [3.5, 3.5])
    # second anchor in the row-major grid shifts by stride in x
    np.testing.assert_allclose(anc[1] - anc[0], [8, 0, 8, 0])
    # zero deltas decode to the anchor itself
    dec = decode_boxes(jnp.zeros((24, 4)), jnp.asarray(anc))
    np.testing.assert_allclose(np.asarray(dec), anc, atol=1e-4)


@pytest.mark.slow   # compile-heavy full-model forward; math/converter tests stay fast
def test_glip_forward_shapes(tiny):
    from fusionsense_tpu.detection.model import GLIPModel

    cfg, params = tiny
    model = GLIPModel(cfg)
    T = cfg.max_query_len
    outs = model.apply({"params": params}, jnp.zeros((64, 64, 3)),
                       jnp.zeros((T,), jnp.int32), jnp.ones((T,), jnp.int32))
    assert len(outs) == 5
    ns = [64 // s * (64 // s) if 64 % s == 0 else None for s in
          (8, 16, 32, 64, 128)]
    ns = [64, 16, 4, 1, 1]
    for (bbox, ctr, dot), n in zip(outs, ns):
        assert bbox.shape == (n, 4)
        assert ctr.shape == (n,)
        assert dot.shape == (n, T)


@pytest.mark.slow   # compile-heavy full-model forward; math/converter tests stay fast
def test_predictor_end_to_end(tiny):
    from fusionsense_tpu.detection.model import GLIPPredictor
    from fusionsense_tpu.detection.tokenizer import WordPieceTokenizer
    from fusionsense_tpu.touch_select.partseg import Detection

    cfg, params = tiny
    tok = WordPieceTokenizer.toy(["handle . lid . spout . "],
                                 max_len=cfg.max_query_len)
    pred = GLIPPredictor(params, tok, cfg, min_size=64,
                         confidence_threshold=0.0)
    rgb = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    det = pred.detect(rgb, ["handle", "lid"])
    assert isinstance(det, Detection)
    assert det.boxes.shape[1] == 4
    assert all(0 <= l < 2 for l in det.labels)
    # boxes are in original image coords
    assert (det.boxes >= -1e-3).all() and (det.boxes <= 64.0).all()


@pytest.mark.slow   # shares the compile-heavy tiny-GLIP fixture
def test_converter_covers_flax_tree(tiny):
    from fusionsense_tpu.detection.convert import (
        build_rules, convert_state_dict,
    )

    cfg, params = tiny
    rules = build_rules(depths=cfg.swin.depths, num_convs=cfg.num_convs,
                        bert_layers=cfg.bert.layers)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flax_shapes = {
        "/".join(k.key for k in path): v.shape for path, v in flat
    }
    # every rule target must exist in the flax tree
    missing = [dst for dst, _ in rules.values() if dst not in flax_shapes]
    assert missing == [], f"converter targets absent from model: {missing}"
    # every flax param must be produced by some rule
    covered = {dst for dst, _ in rules.values()}
    uncovered = [k for k in flax_shapes if k not in covered]
    assert uncovered == [], f"params with no torch source: {uncovered}"

    # synthesize a torch-shaped state dict and convert it
    rng = np.random.RandomState(0)
    state = {}
    for tkey, (dst, tf) in rules.items():
        shape = flax_shapes[dst]
        if tf is None:
            tshape = shape
        elif tf.__name__ == "_conv_w":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif tf.__name__ == "_lin_w":
            tshape = (shape[1], shape[0])
        else:                      # reshape lambdas: torch stores (1,)
            tshape = (1,)
        state["module." + tkey] = rng.randn(*tshape).astype(np.float32)
    converted = convert_state_dict(state, depths=cfg.swin.depths,
                                   num_convs=cfg.num_convs,
                                   bert_layers=cfg.bert.layers)
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    conv_shapes = {
        "/".join(k.key for k in path): v.shape for path, v in conv_flat
    }
    assert conv_shapes == flax_shapes
