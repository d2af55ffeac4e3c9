from fusionsense_tpu.gaussians.store import GaussianState, new_state, activated  # noqa: F401
