from fusionsense_tpu.viewer.server import (   # noqa: F401
    SplatViewerServer, ViewerCallback, pack_splats,
)
