"""Load the reference GLIP torch sources (maskrcnn_benchmark) on CPU.

Pre-registers: file-based shims for timm/yacs/pycocotools (sys.path), an
in-memory ``maskrcnn_benchmark._C`` stub (never actually called — the
modules that use it at runtime are replaced), and the pure-torch
``deform_conv`` implementation (tests/torch_ref/deform_conv_shim.py) in
place of the CUDA-only one.
"""
from __future__ import annotations

import os
import sys

from tests.torch_ref import REFERENCE, register_stub

GLIP_ROOT = f"{REFERENCE}/PartSlip/GLIP"
_SHIMS = os.path.join(os.path.dirname(__file__), "shims")


def _prepare():
    if _SHIMS not in sys.path:
        sys.path.insert(0, _SHIMS)
    if GLIP_ROOT not in sys.path:
        sys.path.insert(0, GLIP_ROOT)

    def _nyi(*a, **k):
        raise NotImplementedError("_C stub: CUDA op called on CPU")

    register_stub("maskrcnn_benchmark._C", **{
        f: _nyi for f in [
            "nms", "ml_nms", "soft_nms", "roi_align_forward",
            "roi_align_backward", "roi_pool_forward", "roi_pool_backward",
            "sigmoid_focalloss_forward", "sigmoid_focalloss_backward",
            "deform_conv_forward", "deform_conv_backward_input",
            "deform_conv_backward_parameters",
            "modulated_deform_conv_forward",
            "modulated_deform_conv_backward",
            "deform_psroi_pooling_forward",
            "deform_psroi_pooling_backward",
        ]})

    from tests.torch_ref import deform_conv_shim
    sys.modules.setdefault(
        "maskrcnn_benchmark.layers.deform_conv", deform_conv_shim)

    # engine.inference drags in the COCO/Flickr/LVIS dataset stack (and a
    # circular import through maskrcnn_benchmark.data); the harness only
    # needs create_positive_map_label_to_token_from_positive_map from it,
    # so stub the dataset modules outright.
    def _nyi2(*a, **k):
        raise NotImplementedError("dataset stub: unavailable in harness")

    for mod in ("maskrcnn_benchmark.data",
                "maskrcnn_benchmark.data.datasets"):
        m = register_stub(mod)
        m.__path__ = []
    register_stub("maskrcnn_benchmark.data.datasets.evaluation",
                  evaluate=_nyi2, im_detect_bbox_aug=_nyi2).__path__ = []
    register_stub(
        "maskrcnn_benchmark.data.datasets.evaluation.flickr").__path__ = []
    register_stub(
        "maskrcnn_benchmark.data.datasets.evaluation.flickr.flickr_eval",
        FlickrEvaluator=type("FlickrEvaluator", (), {}))
    register_stub("maskrcnn_benchmark.data.datasets.tsv",
                  load_from_yaml_file=_nyi2)

    # the reference targets transformers<4.x where apply_chunking_to_forward
    # lived in modeling_utils; re-expose it there for the installed version
    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu
    for fn in ("apply_chunking_to_forward",
               "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(_mu, fn):
            setattr(_mu, fn, getattr(_pu, fn))


def load_swint():
    _prepare()
    import importlib
    return importlib.import_module(
        "maskrcnn_benchmark.modeling.backbone.swint")


def load_vldyhead():
    _prepare()
    import importlib
    return importlib.import_module(
        "maskrcnn_benchmark.modeling.rpn.vldyhead")


def load_fpn():
    _prepare()
    import importlib
    return importlib.import_module(
        "maskrcnn_benchmark.modeling.backbone.fpn")
