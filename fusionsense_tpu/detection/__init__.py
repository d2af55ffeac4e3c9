"""Grounded open-vocabulary detection (the reference's GLIP slot).

A TPU-native (flax/JAX) re-implementation of the GLIP Swin-L grounding
detector the reference uses for zero-shot 3D part segmentation
(reference PartSlip/GLIP/, ~31k LoC torch/CUDA; entry point
PartSlip/src/glip_inference.py:15-77). Inference-only: Swin backbone +
RetinaNet FPN + BERT language backbone + VLDyHead cross-modal tower with
deformable convs, plus ATSS anchor decoding and multi-label NMS.

Weights convert from the published torch checkpoint family via
`detection.convert.convert_glip_checkpoint` (weights-gated in air-gapped
environments; every architecture piece is unit-tested with random weights).
"""
from fusionsense_tpu.detection.model import (  # noqa: F401
    GLIPConfig, GLIPModel, GLIPPredictor,
)
