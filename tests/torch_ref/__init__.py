"""Round-trip parity harness: load the reference torch sources from
/root/reference (read-only), instantiate them with RANDOM weights, run the
repo's checkpoint converters on their ``state_dict()``, and compare torch
vs flax forward outputs.  No downloads — this verifies converter layout
(transposes, eps, padding) and flax-port semantics against the actual
reference code (VERDICT round-2 missing item #1).

Reference packages are not importable as-is (geffnet/timm/yacs/pycocotools
absent; ``maskrcnn_benchmark._C`` is CUDA-only), so `shims/` provides pure
torch/python stand-ins registered in ``sys.modules`` before the reference
modules load.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REFERENCE = "/root/reference"


def load_module(name: str, path: str):
    """Exec a reference source file under a (possibly dotted) module name,
    creating empty parent packages as needed so its absolute imports of
    siblings resolve."""
    parts = name.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []          # mark as package
            sys.modules[pkg] = m
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def register_stub(name: str, **attrs):
    """Register an in-memory module (with a real spec so
    importlib.util.find_spec doesn't choke on it)."""
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m
