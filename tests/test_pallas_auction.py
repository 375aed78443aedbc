"""Parity of the Pallas lockstep auction kernel vs the XLA vmapped phase.

The two implementations must be interchangeable: identical assignments,
identical per-problem iteration counts, identical cleanup stats — on easy
problems, masked persons, overfull (T>Q) problems, and empty masks.
(Reference exactness bar: scipy per image, matcher.py:83-86; both paths
share the eps-CS bound of ops/assignment.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.ops.assignment import (auction_assignment_stats,
                                    auction_assignment_stats_batched,
                                    hungarian_host)


def _xla(cost, mask):
    return jax.vmap(auction_assignment_stats)(cost, mask)


def _pallas(cost, mask):
    return auction_assignment_stats_batched(cost, mask, use_pallas=True)


def _assert_same(cost, mask):
    r0, _, s0 = _xla(cost, mask)
    r1, _, s1 = _pallas(cost, mask)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s0["iters"]),
                                  np.asarray(s1["iters"]))
    np.testing.assert_array_equal(np.asarray(s0["cleanup"]),
                                  np.asarray(s1["cleanup"]))
    return r1, s1


def test_random_problems_match_xla(rng):
    P, Q, T = 5, 40, 16
    cost = jnp.asarray(rng.normal(size=(P, Q, T)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(P, T)) > 0.3)
    # every problem keeps at least one valid column
    mask = mask.at[:, 0].set(True)
    rows, stats = _assert_same(cost, mask)
    assert int(jnp.max(stats["cleanup"])) == 0
    # assignments are valid and unique per problem
    r = np.asarray(rows)
    for p in range(P):
        assert (r[p] >= 0).all() and (r[p] < Q).all()
        assert len(set(r[p].tolist())) == T


def test_near_optimal_vs_exact(rng):
    P, Q, T = 4, 30, 12
    cost = jnp.asarray(rng.normal(size=(P, Q, T)) * 3, jnp.float32)
    mask = jnp.ones((P, T), bool)
    rows, _, _ = _pallas(cost, mask)
    c = np.asarray(cost)
    for p in range(P):
        got = c[p][np.asarray(rows[p]), np.arange(T)].sum()
        exact_rows = hungarian_host(c[p])  # (T,) -> query row per column
        exact = c[p][exact_rows, np.arange(T)].sum()
        spread = c[p].max() - c[p].min()
        assert got <= exact + T * 2e-3 * spread + 1e-5


def test_masked_and_empty_problems(rng):
    P, Q, T = 3, 16, 8
    cost = jnp.asarray(rng.normal(size=(P, Q, T)), jnp.float32)
    mask = jnp.zeros((P, T), bool)
    mask = mask.at[0].set(True)         # full
    mask = mask.at[1, :3].set(True)     # partial
    # problem 2: empty — converges instantly
    _, stats = _assert_same(cost, mask)
    assert int(stats["iters"][2]) == 0


def test_overfull_problem_terminates(rng):
    # T > Q (outside the T<=Q contract, reachable from misuse): both paths
    # stop once only the unassignable excess remains
    P, Q, T = 2, 6, 10
    cost = jnp.asarray(rng.normal(size=(P, Q, T)), jnp.float32)
    mask = jnp.ones((P, T), bool)
    rows, stats = _assert_same(cost, mask)
    assert int(jnp.max(stats["iters"])) < 5000
    r = np.asarray(rows)
    assert (r >= 0).all() and (r < Q).all()


def test_duplicate_columns_tie_break(rng):
    # jittered-duplicate targets: identical columns create bid ties; the
    # two paths must still walk the same trajectory (argmax-first parity)
    P, Q, T = 3, 20, 8
    base = rng.normal(size=(P, Q, 4)).astype(np.float32)
    cost = np.repeat(base, 2, axis=2)
    _assert_same(jnp.asarray(cost), jnp.ones((P, T), bool))


def test_batched_default_backend_is_fallback_on_cpu(rng):
    # on the forced-CPU test platform the default path must be the XLA vmap
    P, Q, T = 2, 10, 4
    cost = jnp.asarray(rng.normal(size=(P, Q, T)), jnp.float32)
    mask = jnp.ones((P, T), bool)
    r_def, _, s_def = auction_assignment_stats_batched(cost, mask)
    r_xla, _, s_xla = _xla(cost, mask)
    np.testing.assert_array_equal(np.asarray(r_def), np.asarray(r_xla))
    np.testing.assert_array_equal(np.asarray(s_def["iters"]),
                                  np.asarray(s_xla["iters"]))
