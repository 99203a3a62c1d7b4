"""Trace-time backend dispatch for the Pallas fast paths.

Every hot op in this package keeps a pure-XLA composition (the correctness
oracle and CPU path) next to its Pallas TPU kernel and picks one at trace
time via `pallas_available()`. `force_xla()` makes every site take the XLA
composition regardless of platform. It exists because the platform check is
GLOBAL (`jax.devices()[0]`) while lowering can target another backend:
bench.py costs FLOPs by lowering a fully-unrolled twin of the model for the
CPU backend in the same process as the TPU — Pallas custom calls cannot
lower for CPU (``Only interpret mode is supported on CPU backend``) and
would count 0 FLOPs even on TPU, whereas the gather-based XLA composition
counts the op's honest arithmetic.
"""

from __future__ import annotations

import contextlib

import jax

_FORCE_XLA = False


def pallas_available() -> bool:
    """True when trace-time dispatch should pick the Pallas TPU kernels."""
    return (not _FORCE_XLA) and jax.devices()[0].platform == "tpu"


@contextlib.contextmanager
def force_xla():
    """Within this context every dispatch site takes the XLA composition.

    FOOTGUN: the flag is read at TRACE time and is NOT part of any jit cache
    key. A function traced outside this context and re-invoked inside it
    silently reuses its cached Pallas-path executable (and vice versa). Use
    freshly-defined jitted functions inside the context (as bench.py's
    costing twin does), or `jax.clear_caches()` after toggling if you must
    re-trace an existing one."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev
