from fusionsense_tpu.core import transforms, sh, cameras  # noqa: F401
from fusionsense_tpu.core.cameras import Camera  # noqa: F401
