import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from spe_tpu.ops.assignment import auction_assignment, hungarian_host, hungarian_callback

EPS = 2e-3  # default auction slack (units of cost spread)


def _total_cost(cost, row_for_col, col_mask):
    cols = np.where(col_mask)[0]
    rows = row_for_col[cols]
    assert len(set(rows.tolist())) == len(cols), "assignment not unique"
    return cost[rows, cols].sum()


def _scipy_cost(cost, col_mask):
    sub = cost[:, col_mask]
    r, c = linear_sum_assignment(sub)
    return sub[r, c].sum()


def _check(cost, col_mask):
    row_for_col, _ = auction_assignment(jnp.array(cost), jnp.array(col_mask))
    row_for_col = np.asarray(row_for_col)
    # full output must be a valid permutation fragment (padded cols included)
    assert len(set(row_for_col.tolist())) == len(row_for_col)
    assert (row_for_col >= 0).all() and (row_for_col < cost.shape[0]).all()
    got = _total_cost(cost, row_for_col, col_mask)
    want = _scipy_cost(cost, col_mask)
    spread = cost.max() - cost.min()
    tol = col_mask.sum() * EPS * spread + 1e-4
    assert got <= want + tol, (got, want, tol)


@pytest.mark.parametrize("q,t,valid", [(30, 10, 10), (300, 125, 60), (50, 50, 50), (8, 3, 1)])
def test_auction_matches_scipy_cost(rng, q, t, valid):
    cost = rng.normal(size=(q, t)).astype(np.float32) * 5.0
    col_mask = np.zeros(t, bool)
    col_mask[:valid] = True
    _check(cost, col_mask)


def test_auction_detr_like_costs(rng):
    """Cost structure shaped like the matcher's focal+L1+GIoU mix."""
    q, t = 300, 120
    cost = (5.0 * rng.uniform(0, 2, (q, t)) +
            2.0 * rng.uniform(-1, 1, (q, t)) +
            2.0 * rng.uniform(-1, 0.2, (q, t))).astype(np.float32)
    _check(cost, np.ones(t, bool))


def test_auction_duplicate_cols(rng):
    """Identical targets (box-repeat produces near-duplicates) still solve."""
    q, t = 300, 120
    base = rng.normal(size=(q, 24)).astype(np.float32) * 3
    cost = np.repeat(base, 5, axis=1) + rng.normal(size=(q, t)).astype(np.float32) * 0.01
    _check(cost, np.ones(t, bool))


def test_auction_nonfinite_guard(rng):
    cost = rng.normal(size=(20, 6)).astype(np.float32)
    cost[3, 2] = np.nan
    cost[4, 1] = np.inf
    mask = np.ones(6, bool)
    out, _ = auction_assignment(jnp.array(cost), jnp.array(mask))
    out = np.asarray(out)
    assert len(set(out.tolist())) == 6 and (out >= 0).all()


def test_hungarian_host_exact(rng):
    for _ in range(5):
        q, t = 40, 17
        cost = rng.normal(size=(q, t)).astype(np.float64)
        out = hungarian_host(cost)
        got = cost[out, np.arange(t)].sum()
        want = _scipy_cost(cost, np.ones(t, bool))
        np.testing.assert_allclose(got, want, atol=1e-9)
        assert len(set(out.tolist())) == t


def test_hungarian_callback(rng):
    q, t = 20, 8
    cost = rng.normal(size=(q, t)).astype(np.float32)
    mask = np.ones(t, bool)
    mask[6:] = False
    out, _ = hungarian_callback(jnp.array(cost), jnp.array(mask))
    out = np.asarray(out)
    got = cost[out[:6], np.arange(6)].sum()
    want = _scipy_cost(cost, mask)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hungarian_host_oversubscribed(rng):
    """T > Q (jitter-repeat pool larger than num_queries): exactly Q pairs
    assigned, matching scipy's rectangular optimum. Regression: lapjv_rect
    was called with persons=T > objects=Q and returned every column -1."""
    for q, t in [(12, 18), (5, 40), (1, 3)]:
        cost = rng.normal(size=(q, t)).astype(np.float64) * 3.0
        out = hungarian_host(cost)
        assigned = out >= 0
        assert assigned.sum() == q, (q, t, assigned.sum())
        assert len(set(out[assigned].tolist())) == q  # injective
        got = cost[out[assigned], np.where(assigned)[0]].sum()
        r, c = linear_sum_assignment(cost)
        want = cost[r, c].sum()
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_hungarian_callback_oversubscribed(rng):
    """Padded pool T > Q with some columns masked invalid: every VALID
    column is assigned while n_valid <= Q; assignments restricted to valid
    columns match the exact optimum on the valid submatrix."""
    q, t, valid = 12, 18, 9
    cost = rng.normal(size=(q, t)).astype(np.float32)
    mask = np.zeros(t, bool)
    mask[:valid] = True
    out, _ = hungarian_callback(jnp.array(cost), jnp.array(mask))
    out = np.asarray(out)
    assert (out[:valid] >= 0).all()
    got = cost[out[:valid], np.arange(valid)].sum()
    want = _scipy_cost(cost, mask)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_auction_vmappable(rng):
    import jax

    costs = rng.normal(size=(4, 30, 12)).astype(np.float32)
    masks = np.ones((4, 12), bool)
    outs, _ = jax.vmap(lambda c, m: auction_assignment(c, m))(jnp.array(costs), jnp.array(masks))
    outs = np.asarray(outs)
    for b in range(4):
        got = _total_cost(costs[b], outs[b], masks[b])
        want = _scipy_cost(costs[b], masks[b])
        spread = costs[b].max() - costs[b].min()
        assert got <= want + 12 * EPS * spread + 1e-4
