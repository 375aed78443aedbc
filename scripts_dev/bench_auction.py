"""A/B the batched auction: XLA lockstep while_loop vs the Pallas VMEM
fixpoint kernel, on the recipe's real problem shape (96 problems of
120x300, realistic cost magnitudes).

Usage (real TPU): python scripts_dev/bench_auction.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.ops.assignment import (auction_assignment_stats,
                                    auction_assignment_stats_batched)

P, Q, T = 96, 300, 120
K = 8


def digest(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
               for l in jax.tree_util.tree_leaves(tree))


def timeit(fn, repeats=3):
    float(fn())
    best = 1e18
    for _ in range(repeats):
        t0 = time.time()
        float(fn())
        best = min(best, time.time() - t0)
    return best / K * 1e3


def scan_of(body_fn):
    @jax.jit
    def run():
        def body(c, i):
            return c + body_fn(i), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c
    return run


def main():
    rng = np.random.default_rng(0)
    # the recipe's competition pattern: T=120 columns are 24 distinct
    # targets jitter-repeated 5x — near-duplicate columns force long
    # bidding wars (ablate_criterion.py measures ~260 iterations)
    base = rng.normal(size=(P, Q, T // 5)).astype(np.float32) * 3 + 4
    cost = np.repeat(base, 5, axis=2) + rng.normal(
        size=(P, Q, T)).astype(np.float32) * 0.05
    cost = jnp.asarray(cost)
    mask = jnp.asarray(rng.uniform(size=(P, T)) > 0.4)
    mask = mask.at[:, 0].set(True)

    def xla(i):
        c = cost + i.astype(jnp.float32) * 1e-6
        return digest(jax.vmap(auction_assignment_stats)(c, mask))

    def pallas(i):
        c = cost + i.astype(jnp.float32) * 1e-6
        return digest(auction_assignment_stats_batched(c, mask,
                                                       use_pallas=True))

    r0, _, s0 = jax.jit(lambda: jax.vmap(auction_assignment_stats)(
        cost, mask))()
    r1, _, s1 = jax.jit(lambda: auction_assignment_stats_batched(
        cost, mask, use_pallas=True))()
    same = bool(jnp.all(r0 == r1)) and bool(jnp.all(s0["iters"] == s1["iters"]))
    print(f"# parity on-chip: {same}; max iters "
          f"{int(jnp.max(s0['iters']))}/{int(jnp.max(s1['iters']))}",
          flush=True)

    for name, fn in [("xla vmap", xla), ("pallas", pallas)]:
        print(f"{name:10s} {timeit(scan_of(fn)):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
