"""Lightweight tracing/profiling: per-phase wall timers + JAX traces.

The reference's observability is nerfstudio's profiler.time_function on the
big eval plus ad-hoc wall-clock logs (SURVEY.md §5 tracing). Here:
- `timer(name)` context / `@timed` decorator feeding a global registry
  (block_until_ready-aware so device work is actually measured),
- `trace(dir)` wraps jax.profiler for kernel-level TPU traces,
- `report()` returns/prints the accumulated table.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict

import jax

_REGISTRY: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def timer(name: str, sync: bool = False, arg=None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync and arg is not None:
            jax.block_until_ready(arg)
        _REGISTRY[name].append(time.perf_counter() - t0)


def timed(name: str | None = None, sync_result: bool = True):
    """Decorator: time the call; optionally block on the returned pytree."""

    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            if sync_result:
                jax.block_until_ready(out)
            _REGISTRY[label].append(time.perf_counter() - t0)
            return out

        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TPU profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report(reset: bool = False) -> dict:
    out = {}
    for name, samples in _REGISTRY.items():
        out[name] = {
            "calls": len(samples),
            "total_s": sum(samples),
            "mean_ms": 1e3 * sum(samples) / max(len(samples), 1),
            "last_ms": 1e3 * samples[-1],
        }
    if reset:
        _REGISTRY.clear()
    return out


def print_report(log=print, reset: bool = False):
    rep = report(reset=reset)
    for name in sorted(rep, key=lambda n: -rep[n]["total_s"]):
        r = rep[name]
        log(f"{name:40s} {r['calls']:6d} calls  "
            f"{r['mean_ms']:9.2f} ms/call  {r['total_s']:8.2f} s total")
    return rep
