"""ATSS-style grounding postprocessor (static shapes, jittable).

Behavioral contract: PartSlip/GLIP/maskrcnn_benchmark/modeling/rpn/
inference.py:592-768 (ATSSPostProcessor with dot-product logits):
per level, sigmoid token logits -> per-phrase scores via the positive map
(MEAN aggregation, :771-789), multiply by sigmoid centerness, threshold
0.05, keep top-1000 candidates, decode boxes against anchors
(vldyhead.py BoxCoder.decode weights (10,10,5,5), :64-94), score =
sqrt(cls*ctr); across levels: concat, class-aware NMS 0.6, keep top-100.

Dynamic torch indexing is replaced by masked top-k over fixed shapes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from fusionsense_tpu.ops.detection import ml_nms

PRE_NMS_THRESH = 0.05
PRE_NMS_TOP_N = 1000
NMS_THRESH = 0.6
MAX_DETECTIONS = 100


def decode_boxes(preds: jax.Array, anchors: jax.Array) -> jax.Array:
    """(N, 4) regression deltas + (N, 4) xyxy anchors -> (N, 4) boxes."""
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    cx = (anchors[:, 2] + anchors[:, 0]) / 2.0
    cy = (anchors[:, 3] + anchors[:, 1]) / 2.0
    dx = preds[:, 0] / 10.0
    dy = preds[:, 1] / 10.0
    dw = jnp.minimum(preds[:, 2] / 5.0, math.log(1000.0 / 16))
    dh = jnp.minimum(preds[:, 3] / 5.0, math.log(1000.0 / 16))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
                      pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1)], axis=1)


def scores_from_token_logits(dot_logits: jax.Array,
                             positive_map: jax.Array) -> jax.Array:
    """(N, T) token logits + (C, T) normalized span map -> (N, C) scores
    (MEAN aggregation = matmul with the row-normalized map)."""
    probs = jax.nn.sigmoid(dot_logits)
    return probs @ positive_map.T


@functools.partial(jax.jit, static_argnames=("top_n",))
def select_level(dot_logits, bbox_reg, centerness, anchors, positive_map,
                 top_n: int = PRE_NMS_TOP_N):
    """One FPN level -> (top_n,) boxes/scores/labels/valid."""
    cls = scores_from_token_logits(dot_logits, positive_map)   # (N, C)
    n, c = cls.shape
    keep = cls > PRE_NMS_THRESH
    cls = cls * jax.nn.sigmoid(centerness)[:, None]
    flat = jnp.where(keep, cls, 0.0).reshape(-1)
    k = min(top_n, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    loc = top_idx // c
    label = top_idx % c + 1                  # 1-based like the reference
    boxes = decode_boxes(bbox_reg[loc], anchors[loc])
    valid = top_scores > 0.0
    return boxes, jnp.sqrt(top_scores), label, valid


def postprocess(level_outputs, anchors, positive_map, image_size,
                max_det: int = MAX_DETECTIONS):
    """level_outputs: list of (bbox (N,4), ctr (N,), dot (N,T)); anchors:
    list of (N, 4). Returns (boxes, scores, labels, valid) with max_det rows,
    boxes clipped to image_size=(H, W)."""
    parts = [select_level(dot, bbox, ctr, anc, positive_map)
             for (bbox, ctr, dot), anc in zip(level_outputs, anchors)]
    boxes = jnp.concatenate([p[0] for p in parts])
    scores = jnp.concatenate([p[1] for p in parts])
    labels = jnp.concatenate([p[2] for p in parts])
    valid = jnp.concatenate([p[3] for p in parts])

    H, W = image_size
    boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, W - 1),
                       jnp.clip(boxes[:, 1], 0, H - 1),
                       jnp.clip(boxes[:, 2], 0, W - 1),
                       jnp.clip(boxes[:, 3], 0, H - 1)], axis=1)
    scores = jnp.where(valid, scores, 0.0)
    keep, keep_valid = ml_nms(boxes, scores, labels, NMS_THRESH,
                              max_out=max_det)
    safe = jnp.maximum(keep, 0)
    return (boxes[safe], scores[safe], labels[safe],
            keep_valid & (scores[safe] > 0))
