"""On-device linear assignment (auction algorithm) + exact CPU oracle.

The reference solves Hungarian matching by copying the cost matrix to host
and calling scipy per image per decoder layer per refine stage
(models/matcher.py:83-86) — a device->host->device round-trip in the middle
of every training step. Here the assignment runs ON the TPU as a Bertsekas
forward auction, entirely vectorized (dense bid matrices are tiny:
num_targets x num_queries), inside the jitted train step.

Guarantee: the result is within `num_valid * eps * spread` of the optimal
total cost (see auction_assignment docstring for the duality argument);
verified against scipy in tests/test_assignment.py.

An exact Jonker-Volgenant solver is also provided in C++
(spe_tpu/native/lapjv.cc, loaded via ctypes) as a host fallback/oracle, with
scipy as the final fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


def _auction_phase(benefit, person_mask, price, eps, max_iters):
    """One auction phase at fixed eps. Persons = rows, objects = cols.

    Returns (price, owner, assigned, iters_used):
      owner: (Q,) person index owning each object, -1 if none
      assigned: (T,) object index assigned to each person, -1 if none
      iters_used: (scalar int32) while-loop iterations consumed

    Termination: normally when every valid person holds an object. If the
    problem is structurally overfull (more valid persons than objects —
    outside the T<=Q contract but reachable from tests/misuse), the loop
    would otherwise cycle to max_iters (outbid persons re-enter the pool
    forever); stop as soon as only the unassignable excess remains.
    """
    T, Q = benefit.shape
    owner0 = jnp.full((Q,), -1, dtype=jnp.int32)
    assigned0 = jnp.where(person_mask, -1, -2).astype(jnp.int32)  # -2: never bids
    n_over = jnp.maximum(jnp.sum(person_mask.astype(jnp.int32)) - Q, 0)

    def cond(state):
        _, _, assigned, it = state
        return (jnp.sum((assigned == -1).astype(jnp.int32)) > n_over) & (
            it < max_iters)

    def body(state):
        price, owner, assigned, it = state
        unassigned = assigned == -1  # only valid persons can be -1

        values = benefit - price[None, :]  # (T, Q)
        top1_idx = jnp.argmax(values, axis=1)
        # one-hot of the winner doubles as the top-2 mask: a scatter here
        # would run once PER auction iteration (TPU scatters are ~3x a
        # masked where, profiled in the train-step while loop)
        onehot = jax.nn.one_hot(top1_idx, Q, dtype=jnp.bool_)
        top2_val = jnp.max(jnp.where(onehot, _NEG_INF, values), axis=1)
        # total bid for the best object: benefit - second_value + eps
        bid = jnp.max(jnp.where(onehot, benefit, _NEG_INF), axis=1) - top2_val + eps
        bids = jnp.where(unassigned[:, None] & onehot, bid[:, None], _NEG_INF)
        best_bid = jnp.max(bids, axis=0)          # (Q,)
        best_person = jnp.argmax(bids, axis=0).astype(jnp.int32)
        won = best_bid > _NEG_INF / 2

        # previous owners of contested objects lose their assignment
        loser = jnp.where(won & (owner >= 0), owner, T)  # T = drop slot
        assigned = assigned.at[loser].set(-1, mode="drop")
        # winners take the objects
        obj_idx = jnp.arange(Q, dtype=jnp.int32)
        winner = jnp.where(won, best_person, T)
        assigned = assigned.at[winner].set(obj_idx, mode="drop")
        owner = jnp.where(won, best_person, owner)
        price = jnp.where(won, best_bid, price)
        return price, owner, assigned, it + 1

    price, owner, assigned, iters = jax.lax.while_loop(
        cond, body, (price, owner0, assigned0, jnp.int32(0)))
    return price, owner, assigned, iters


def _cleanup_unassigned(assigned: jnp.ndarray, Q: int) -> jnp.ndarray:
    """Deterministically hand leftover objects to still-unassigned persons.

    Only triggers when the phase hits max_iters (pathological inputs); keeps
    the output a valid permutation fragment so downstream gathers stay
    in-range. k-th unassigned person takes the k-th free object.
    """
    T = assigned.shape[0]
    # True-only scatter (unassigned rows write to the dropped slot Q): a
    # clip-to-0 scatter of `assigned >= 0` could overwrite taken[0]=True
    # with False when any person is unassigned, double-assigning object 0
    taken = jnp.zeros((Q,), dtype=jnp.bool_).at[
        jnp.where(assigned >= 0, assigned, Q)].set(True, mode="drop")
    free_rank = jnp.cumsum(~taken) - 1  # rank of each free object
    # object index for each rank
    obj_by_rank = jnp.full((Q,), Q - 1, dtype=jnp.int32).at[
        jnp.where(~taken, free_rank, Q)].set(
        jnp.arange(Q, dtype=jnp.int32), mode="drop")
    needs = assigned < 0
    person_rank = jnp.cumsum(needs) - 1
    fill = obj_by_rank[jnp.clip(person_rank, 0, Q - 1)]
    return jnp.where(needs, fill, assigned).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "max_iters"))
def auction_assignment(
    cost: jnp.ndarray,
    col_mask: jnp.ndarray,
    eps: float = 2e-3,
    max_iters: int = 5000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-cost assignment of columns (targets) to rows (queries).

    Single-phase forward auction from zero prices on the spread-normalized
    benefit matrix. Correctness: at termination every person satisfies
    eps-CS, every unowned object still has its initial price 0, and prices
    are nonnegative — so for any other assignment set S_opt,
    sum_{S_opt} p <= sum_{S_ours} p, and LP duality gives total cost within
    `num_valid * eps * spread` of optimal. (Carrying prices across
    eps-scaling phases BREAKS this bound in the rectangular case: objects
    owned in an earlier phase but unowned later keep stale high prices —
    verified empirically; hence no eps scaling here. With Q >> T contention
    is light and the single phase converges in O(10) iterations on
    DETR-style costs anyway.)

    Args:
      cost: (Q, T) float cost matrix, Q >= number of valid T columns.
      col_mask: (T,) bool, True for real target columns.
      eps: auction slack in units of the cost spread. Per-pair matching
        errors only occur among candidates within eps*spread of each other
        (e.g. jittered duplicate boxes, where any choice is equivalent).
      max_iters: safety bound for the jitted while_loop.

    Returns:
      row_for_col: (T,) int32 — query index assigned to each target column
        (unique across all columns; arbitrary but in-range for padded).
      col_mask: passed through for convenience.
    """
    row_for_col, col_mask, _ = auction_assignment_stats(
        cost, col_mask, eps=eps, max_iters=max_iters)
    return row_for_col, col_mask


@functools.partial(jax.jit, static_argnames=("eps", "max_iters"))
def auction_assignment_stats(
    cost: jnp.ndarray,
    col_mask: jnp.ndarray,
    eps: float = 2e-3,
    max_iters: int = 5000,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """auction_assignment + solver-health stats for train-time observability
    (the reference's scipy solve is exact by construction, matcher.py:83-86;
    the auction's bound holds only while phases converge, so drift on real
    cost surfaces must be visible in the training log):

      stats['iters']   — auction iterations consumed (hitting max_iters
                         means the eps-CS bound claim is void for that solve)
      stats['cleanup'] — valid persons left unassigned when the phase
                         stopped, i.e. _cleanup_unassigned activations on
                         REAL columns (0 in healthy runs)

    When the stats are unused, XLA dead-code-eliminates them — plain
    auction_assignment routes through here at zero extra cost.
    """
    Q, T = cost.shape
    # persons = targets (padded ones neutralized to constant-0 benefit:
    # they soak up leftover objects without escalating prices), objects =
    # queries; maximize benefit = -cost, spread-normalized so eps is
    # scale-free; nan/inf guarded (the auction diverges on non-finite)
    benefit = _normalize_benefit(cost, col_mask)

    price = jnp.zeros((Q,), dtype=jnp.float32)
    # padded persons never bid (they'd only inflate prices of free objects);
    # _cleanup_unassigned hands them leftover objects deterministically.
    price, _, assigned, iters = _auction_phase(benefit, col_mask, price, eps,
                                               max_iters)
    # structural overflow (valid persons beyond Q, outside the T<=Q
    # contract) is not a solver-health failure; count only the excess
    n_over = jnp.maximum(jnp.sum(col_mask.astype(jnp.int32)) - Q, 0)
    cleanup = jnp.maximum(jnp.sum((assigned == -1).astype(jnp.int32)) - n_over, 0)
    stats = {"iters": iters, "cleanup": cleanup}
    return _cleanup_unassigned(assigned, Q), col_mask, stats


def _normalize_benefit(cost: jnp.ndarray, col_mask: jnp.ndarray):
    """cost (Q, T) -> spread-normalized benefit (T, Q); shared by the XLA
    and Pallas phase implementations so their inputs are bit-identical."""
    benefit = -cost.astype(jnp.float32).T
    benefit = jnp.where(col_mask[:, None], benefit, 0.0)
    benefit = jnp.nan_to_num(benefit, nan=0.0, posinf=0.0, neginf=0.0)
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    return benefit / spread


def auction_assignment_stats_batched(
    cost: jnp.ndarray,
    col_mask: jnp.ndarray,
    eps: float = 2e-3,
    max_iters: int = 5000,
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Batched auction_assignment_stats over P problems at once.

    cost: (P, Q, T), col_mask: (P, T). Same returns as vmapping
    auction_assignment_stats, but on TPU the bidding fixpoint runs as ONE
    Pallas kernel with the whole state VMEM-resident instead of a lockstep
    HBM-bound while_loop (~6x on the recipe's 96 problems of 120x300 —
    see ops/pallas_auction.py). The XLA vmap path remains the CPU/test
    fallback; both produce identical assignments and iteration counts."""
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not use_pallas:
        return jax.vmap(
            lambda c, m: auction_assignment_stats(c, m, eps=eps,
                                                  max_iters=max_iters))(
            cost, col_mask)
    from spe_tpu.ops.pallas_auction import auction_phase_pallas

    P, Q, T = cost.shape
    benefit = jax.vmap(_normalize_benefit)(cost, col_mask)
    # off-TPU a forced pallas path runs in interpret mode (tests)
    interpret = jax.default_backend() not in ("tpu", "axon")
    assigned, iters = auction_phase_pallas(benefit, col_mask, eps=eps,
                                           max_iters=max_iters,
                                           interpret=interpret)
    n_over = jnp.maximum(jnp.sum(col_mask.astype(jnp.int32), axis=1) - Q, 0)
    cleanup = jnp.maximum(
        jnp.sum((assigned == -1).astype(jnp.int32), axis=1) - n_over, 0)
    row_for_col = jax.vmap(lambda a: _cleanup_unassigned(a, Q))(assigned)
    return row_for_col, col_mask, {"iters": iters, "cleanup": cleanup}


# ---------------------------------------------------------------------------
# Exact host oracle: C++ LAPJV via ctypes, scipy fallback.
# ---------------------------------------------------------------------------

_lapjv_lib = None


def _load_lapjv():
    global _lapjv_lib
    if _lapjv_lib is not None:
        return _lapjv_lib
    import ctypes
    import pathlib

    so = pathlib.Path(__file__).resolve().parent.parent / "native" / "liblapjv.so"
    if not so.exists():
        try:
            from spe_tpu.native.build import build

            build(verbose=False)
        except Exception:
            pass
    if not so.exists():
        _lapjv_lib = False
        return False
    lib = ctypes.CDLL(str(so))
    lib.lapjv_rect.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.lapjv_rect.restype = ctypes.c_double
    _lapjv_lib = lib
    return lib


def hungarian_host(cost: np.ndarray) -> np.ndarray:
    """Exact rectangular assignment on host.

    Assigns min(Q, T) pairs injectively with minimum total cost (scipy
    linear_sum_assignment semantics — the reference bar, matcher.py:83-86).

    Args:
      cost: (Q, T), any rectangular shape.
    Returns:
      row_for_col: (T,) query index per target column, -1 for columns left
      unassigned (only possible when T > Q: the over-subscribed case, e.g.
      a jitter-repeat candidate pool larger than num_queries).
    """
    import ctypes

    cost = np.ascontiguousarray(cost, dtype=np.float64)
    q, t = cost.shape
    lib = _load_lapjv()
    if lib:
        # lapjv_rect solves rows->cols and requires rows <= cols; pass the
        # smaller side as the persons. (With T > Q it previously got the
        # infeasible T-person problem and returned all -1 — every column
        # unassigned.)
        out = np.full((t,), -1, dtype=np.int32)
        if t <= q:
            # persons = target columns over the transposed (T, Q) matrix
            ct = np.ascontiguousarray(cost.T)
            lib.lapjv_rect(
                t, q,
                ct.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
        else:
            # over-subscribed: persons = queries over (Q, T); invert
            # col_for_row into row_for_col
            out_q = np.full((q,), -1, dtype=np.int32)
            lib.lapjv_rect(
                q, t,
                cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                out_q.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
            valid = out_q >= 0
            out[out_q[valid]] = np.arange(q, dtype=np.int32)[valid]
        return out.astype(np.int32)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.full((t,), -1, dtype=np.int32)
    out[cols] = rows
    return out.astype(np.int32)


def hungarian_callback(cost: jnp.ndarray, col_mask: jnp.ndarray):
    """jax.pure_callback wrapper for the exact host solver (per image).

    Used when config.assignment == 'hungarian_cpu'; pads invalid columns
    with a high constant so the solve stays fixed-shape.
    """
    Q, T = cost.shape

    def host_fn(c, m):
        c = np.asarray(c, dtype=np.float64)
        m = np.asarray(m)
        c = np.where(m[None, :], c, 1e6)
        c = np.nan_to_num(c, nan=1e6, posinf=1e6, neginf=-1e6)
        return hungarian_host(c)

    out = jax.pure_callback(
        host_fn,
        jax.ShapeDtypeStruct((T,), jnp.int32),
        cost, col_mask,
        vmap_method="sequential",
    )
    return out, col_mask
