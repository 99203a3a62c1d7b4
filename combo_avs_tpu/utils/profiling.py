"""Profiling helpers.

The reference has only hand-rolled wall-clock timing with CUDA syncs
(ref: models/evaluation/evaluator.py:149-244; SURVEY §5). Here:

* `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace,
* `device_timer` — honest wall-clock timing on runtimes where
  `block_until_ready` returns early (the axon tunnel): loops the function
  on-device and fetches a scalar,
* the greppable "s / iter per device" log lines live in
  `train/trainer.py:evaluate` to match the reference's format.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn: Callable, *args, iters: int = 8, repeats: int = 3) -> float:
    """Returns best per-iteration seconds for `fn(*args) -> pytree`.

    `fn` is looped `iters` times inside one jit with a scalar data dependency
    chained between iterations, and a scalar is fetched at the end — this
    measures true execution time even where `block_until_ready` lies.

    The carry is injected into every floating leaf so nothing is hoisted out
    of the loop; that re-materializes the input tree each iteration, which
    costs one HBM read+write of it (< 0.5 ms even for the full model) — use
    iters >= 32 for sub-ms ops so both that and the tunnel round-trip
    amortize."""

    @jax.jit
    def looped(*a):
        def body(i, carry):
            # 1e-12 (not 0): a *0 dependency would constant-fold away and let
            # XLA dedupe the iterations
            def dep(x):
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                    return x + carry.astype(x.dtype) * 1e-12
                return x

            out = fn(*jax.tree.map(dep, a))
            # fold EVERY leaf (ints cast to f32) into the carry: skipping the
            # int leaves of a mixed output would let XLA dead-code the
            # int-producing computation (e.g. matcher assignments next to
            # float losses) and undertime it — advisor r4
            leaves = [l.astype(jnp.float32) for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype")]
            return sum(jnp.mean(l) for l in leaves)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    a = jax.device_put(args)
    float(looped(*a))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(*a))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
