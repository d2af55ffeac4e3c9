import jax.numpy as jnp
import numpy as np

from fusionsense_tpu.ops.detection import (
    box_iou, ml_nms, nms, roi_align, sigmoid_focal_loss, soft_nms,
)


def test_box_iou():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5.0, 5, 15, 15], [20.0, 20, 30, 30]])
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11], [20.0, 20, 30, 30]])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, valid = nms(boxes, scores, iou_threshold=0.5, max_out=3)
    kept = [int(k) for k, v in zip(keep, valid) if bool(v)]
    assert kept == [0, 2]


def test_ml_nms_keeps_cross_class():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11]])
    scores = jnp.array([0.9, 0.8])
    labels = jnp.array([0, 1])
    keep, valid = ml_nms(boxes, scores, labels, iou_threshold=0.5, max_out=2)
    assert int(valid.sum()) == 2  # different classes: both survive


def test_soft_nms_decays():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11], [20.0, 20, 30, 30]])
    scores = jnp.array([0.9, 0.8, 0.7])
    out = soft_nms(boxes, scores)
    assert abs(float(out[0]) - 0.9) < 1e-6  # top box unchanged
    assert float(out[1]) < 0.8             # overlapping box decayed
    assert abs(float(out[2]) - 0.7) < 1e-5  # disjoint box kept


def test_roi_align_constant_field():
    feats = jnp.full((16, 16, 3), 2.0)
    boxes = jnp.array([[2.0, 2, 10, 10]])
    out = roi_align(feats, boxes, output_size=4)
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_roi_align_gradient_field():
    # f(x, y) = x -> pooled values increase along x within the box
    xs = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, :, None], (16, 1, 1))
    boxes = jnp.array([[4.0, 4, 12, 12]])
    out = roi_align(xs, boxes, output_size=4)[0, :, :, 0]
    assert np.all(np.diff(np.asarray(out), axis=1) > 0)
    assert abs(float(out.mean()) - 7.5) < 0.6  # pixel centers at i+0.5


def test_focal_loss_extremes():
    logits = jnp.array([10.0, -10.0])
    targets = jnp.array([1.0, 0.0])
    loss = sigmoid_focal_loss(logits, targets)
    assert float(loss.max()) < 1e-4  # confident-correct: tiny loss
    loss_bad = sigmoid_focal_loss(logits, 1.0 - targets)
    assert float(loss_bad.min()) > 1.0
