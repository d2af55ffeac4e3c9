"""Minimal timm stand-in for the parity harness (timm is not installed;
the reference GLIP code only uses DropPath / to_2tuple / trunc_normal_,
all inference-inert)."""
