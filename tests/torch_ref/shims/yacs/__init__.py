"""Minimal yacs stand-in (config plumbing only; the harness builds GLIP
configs programmatically)."""
