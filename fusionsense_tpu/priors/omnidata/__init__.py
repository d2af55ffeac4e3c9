from fusionsense_tpu.priors.omnidata.dpt_hybrid import (  # noqa: F401
    OmniConfig, OmnidataNormals, tiny_omni,
)
from fusionsense_tpu.priors.omnidata.predictor import (  # noqa: F401
    OmnidataPredictor,
)
