from fusionsense_tpu.render.rasterize import rasterize, RasterizeConfig, RenderOutputs  # noqa: F401
