"""DSINE surface-normal network (TPU-native port).

The reference vendors DSINE as its default monocular-normal prior
(reference dn_splatter/scripts/dsine/{dsine.py,submodules.py,
dsine_predictor.py}, ~740 LoC torch/geffnet; selected by the orchestrator
at scripts/train.py:101). This package re-implements it in flax:
EfficientNet-B5 encoder (tf SAME padding), GN decoder with weight-
standardized convs, and the rotation-based neighborhood refinement (NRN)
loop, plus a torch-checkpoint converter (weights-gated in air-gapped
environments).
"""
from fusionsense_tpu.priors.dsine.model import DSINE  # noqa: F401
from fusionsense_tpu.priors.dsine.predictor import DSinePredictor  # noqa: F401
