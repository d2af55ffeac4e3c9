"""GLIP-class grounded detector: model assembly + host-side predictor.

Behavioral contract:
- GeneralizedVLRCNN (PartSlip/GLIP/.../modeling/detector/
  generalized_vl_rcnn.py:63-300): tokenize caption (pad to max_query_len
  256), BERT language features, Swin+FPN visual features, VLDyHead, ATSS
  decode.
- GLIPDemo (engine/predictor_glip.py:27-240): BGR255 normalization with
  pixel mean/std, shorter-side-800 resize, caption built from part names
  joined by " . ", per-part token spans -> normalized positive map,
  score-threshold postprocess.

The predictor satisfies the `Detector` protocol consumed by the part
segmentation pipeline (fusionsense_tpu/touch_select/partseg.py), closing
the reference call chain PartSlip/src/glip_inference.py:53-77.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from fusionsense_tpu.detection.anchors import pyramid_anchors
from fusionsense_tpu.detection.bert import BertConfig, BertEncoder
from fusionsense_tpu.detection.fpn import FPN
from fusionsense_tpu.detection.head import VLDyHead
from fusionsense_tpu.detection.postprocess import postprocess
from fusionsense_tpu.detection.swin import SwinConfig, SwinTransformer
from fusionsense_tpu.detection.tokenizer import Encoding, WordPieceTokenizer

# BGR255 normalization (glip_Swin_L.yaml INPUT)
PIXEL_MEAN = np.array([103.530, 116.280, 123.675], np.float32)
PIXEL_STD = np.array([57.375, 57.120, 58.395], np.float32)


@dataclasses.dataclass(frozen=True)
class GLIPConfig:
    swin: SwinConfig = SwinConfig()
    bert: BertConfig = BertConfig()
    max_query_len: int = 256
    channels: int = 256          # DYHEAD.CHANNELS == BACKBONE.OUT_CHANNELS
    num_convs: int = 8           # DYHEAD.NUM_CONVS
    fuse_embed: int = 2048


def tiny_config() -> GLIPConfig:
    """A small-width config for tests (same topology, ~1000x fewer flops)."""
    return GLIPConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 2, 2), window=4),
        bert=BertConfig(vocab_size=128, hidden=32, layers=2, heads=2,
                        intermediate=64, max_positions=64),
        max_query_len=32, channels=32, num_convs=2, fuse_embed=64,
    )


class GLIPModel(nn.Module):
    cfg: GLIPConfig = GLIPConfig()

    @nn.compact
    def __call__(self, image, input_ids, attention_mask):
        """image (H, W, 3) normalized BGR; ids/mask (T,).

        Returns list of per-level (bbox (N,4), centerness (N,),
        dot_logits (N, T))."""
        c = self.cfg
        feats = SwinTransformer(c.swin, name="backbone")(image)
        feats = FPN(c.channels, name="fpn")(feats)
        lang = BertEncoder(c.bert, name="language_backbone")(
            input_ids, attention_mask)
        return VLDyHead(c.bert, c.channels, c.num_convs, c.fuse_embed,
                        name="head")(feats, lang, attention_mask)


def build_caption(part_names: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """'a . b . ' caption + char span per part
    (predictor_glip.py:183-199)."""
    caption = ""
    spans = []
    for name in part_names:
        spans.append((len(caption), len(caption) + len(name)))
        caption += name + " . "
    return caption, spans


def positive_map_from_spans(enc: Encoding, spans: list[tuple[int, int]],
                            max_len: int) -> np.ndarray:
    """(C, max_len) row-normalized token-span map
    (predictor_glip.py:412-445)."""
    pm = np.zeros((len(spans), max_len), np.float32)
    for j, (beg, end) in enumerate(spans):
        beg_pos = enc.char_to_token(beg)
        end_pos = enc.char_to_token(end - 1)
        if beg_pos is None:
            beg_pos = enc.char_to_token(beg + 1) or enc.char_to_token(beg + 2)
        if end_pos is None:
            end_pos = enc.char_to_token(end - 2) or enc.char_to_token(end - 3)
        if beg_pos is None or end_pos is None:
            continue
        pm[j, beg_pos:end_pos + 1] = 1.0
    return pm / (pm.sum(-1, keepdims=True) + 1e-6)


def preprocess_image(rgb: np.ndarray, min_size: int = 800,
                     max_size: int = 1333,
                     divisibility: int = 32) -> tuple[np.ndarray, float]:
    """uint8/float RGB (H, W, 3) -> normalized BGR (H', W', 3) padded to
    /32, plus the resize scale (original -> model coords)."""
    h, w = rgb.shape[:2]
    scale = min_size / min(h, w)
    if scale * max(h, w) > max_size:
        scale = max_size / max(h, w)
    nh, nw = round(h * scale), round(w * scale)
    img = np.asarray(rgb, np.float32)
    if img.max() > 2.0:
        img = img / 255.0
    if (nh, nw) != (h, w):
        img = np.asarray(jax.image.resize(jnp.asarray(img), (nh, nw, 3),
                                          method="bilinear"))
    bgr = img[..., ::-1] * 255.0
    bgr = (bgr - PIXEL_MEAN) / PIXEL_STD
    ph = -nh % divisibility
    pw = -nw % divisibility
    if ph or pw:
        bgr = np.pad(bgr, ((0, ph), (0, pw), (0, 0)))
    return bgr.astype(np.float32), scale


class GLIPPredictor:
    """Detector-protocol wrapper: rgb + part names -> scored boxes.

    Jit-compiled per (image shape, n_parts); the positive map is a traced
    argument so changing part names does not recompile.
    """

    def __init__(self, params, tokenizer: WordPieceTokenizer,
                 cfg: GLIPConfig = GLIPConfig(), min_size: int = 800,
                 confidence_threshold: float = 0.5):
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.min_size = min_size
        self.thresh = confidence_threshold
        self.model = GLIPModel(cfg)

    @functools.cached_property
    def _run(self):
        @functools.partial(jax.jit, static_argnames=("hw",))
        def run(params, image, ids, mask, positive_map, hw):
            outs = self.model.apply({"params": params}, image, ids, mask)
            anchors = [jnp.asarray(a) for a in pyramid_anchors(
                _level_shapes(hw))]
            return postprocess(outs, anchors, positive_map, hw)
        return run

    def detect(self, rgb: np.ndarray, part_names: list[str]):
        from fusionsense_tpu.touch_select.partseg import Detection

        image, scale = preprocess_image(rgb, self.min_size)
        caption, spans = build_caption(part_names)
        enc = self.tokenizer.encode(caption)
        pm = positive_map_from_spans(enc, spans, len(enc.ids))
        boxes, scores, labels, valid = self._run(
            self.params, jnp.asarray(image),
            jnp.asarray(enc.ids, jnp.int32), jnp.asarray(enc.mask, jnp.int32),
            jnp.asarray(pm), hw=image.shape[:2])
        boxes, scores, labels, valid = jax.device_get(
            (boxes, scores, labels, valid))
        keep = valid & (scores > self.thresh)
        return Detection(boxes=boxes[keep] / scale,
                         labels=[int(l) - 1 for l in labels[keep]],
                         scores=scores[keep])


def _level_shapes(hw: tuple[int, int]) -> list[tuple[int, int]]:
    H, W = hw
    shapes = []
    for s in (8, 16, 32, 64, 128):
        shapes.append(((H + s - 1) // s, (W + s - 1) // s))
    return shapes


def init_params(cfg: GLIPConfig, image_hw=(224, 224), seed: int = 0):
    """Random-weight init (architecture tests / converter target tree)."""
    model = GLIPModel(cfg)
    T = cfg.max_query_len
    return model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((*image_hw, 3), jnp.float32),
        jnp.zeros((T,), jnp.int32),
        jnp.ones((T,), jnp.int32),
    )["params"]
