"""Minimal torchvision stand-in for the parity harness (only the ops the
reference import chains touch)."""
from . import ops  # noqa: F401
__version__ = "0.0-shim"
