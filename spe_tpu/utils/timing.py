"""Benchmark helpers for the axon-tunneled TPU.

Two gotchas this wraps (measured, 2026-08):
  * `block_until_ready` does not actually wait for remote completion
    through the tunnel — a result must be materialized to host to sync;
  * the first measured call in a process pays one-time warmup costs
    unrelated to the function (host sum path compilation etc.), so we
    measure twice and keep the min.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _sync(out) -> float:
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves[:1]:
        acc += float(jnp.sum(jnp.nan_to_num(leaf.astype(jnp.float32))))
    return acc


def bench(fn: Callable, *args, iters: int = 20, repeats: int = 2) -> float:
    """Wall-clock per call in ms: pipeline `iters` calls, sync once at end."""
    def run():
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            _sync(o)

    run()  # warm (compile + host sum path)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        run()
        best = min(best, (time.time() - t0) / iters * 1000)
    return best
