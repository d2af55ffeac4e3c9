"""Load the reference DSINE torch sources (read-only, no copies) with the
geffnet shim pre-registered."""
from __future__ import annotations

import sys

from tests.torch_ref import REFERENCE, load_module
from tests.torch_ref import geffnet_shim

_BASE = f"{REFERENCE}/dn_splatter/scripts/dsine"


def load_dsine_module():
    sys.modules.setdefault("geffnet", geffnet_shim)
    load_module("dn_splatter.scripts.dsine.rotations", f"{_BASE}/rotations.py")
    load_module("dn_splatter.scripts.dsine.submodules",
                f"{_BASE}/submodules.py")
    return load_module("dn_splatter.scripts.dsine.dsine", f"{_BASE}/dsine.py")
