"""Batched auction assignment as ONE Pallas TPU kernel.

The XLA implementation (ops/assignment._auction_phase, vmapped over the
step's S*L*B assignment problems) runs the bidding fixpoint as a lockstep
batched while_loop: every iteration re-reads and re-writes the full
(P, T, Q) bid state from HBM (~8 passes x ~18 MB at the voc0712 recipe's
96 problems of 120x300) — measured ~0.16 ms/iteration, i.e. the auction is
HBM-bandwidth-bound and dominates the criterion forward (~10-14 ms of the
~18 ms post-model step tail; scripts_dev/ablate_criterion.py).

Here the WHOLE fixpoint runs inside one kernel: each grid program loads a
block of `problem_block` problems into VMEM (~6 MB at 32x120x384) and
iterates the bidding loop locally — zero HBM round trips per iteration.
Problems in a block run in lockstep, but a converged problem's state is
frozen (its `won` mask is forced off), so semantics — including the
per-problem iteration counts — are identical to the vmapped XLA phase
(jax.vmap of while_loop freezes carries of elements whose cond is false).
tests/test_pallas_auction.py asserts exact equality of assignments and
iteration counts against the XLA path.

Scatter-free formulation (TPU scatters are ~3x a masked where): the
original body's two (T,)-vector scatters become dense (T, Q) compare+reduce
updates —
  lost[t]  = any_q( won[q] & owner[q] == t )        (previous owner outbid)
  got[t]   = any_q( won[q] & best_person[q] == t )  (this person's bid won;
  obj[t]   = argmax_q of that mask                   a person bids on at
                                                     most one object)
Tie-breaking matches jnp.argmax (first index), same as the XLA path's
one_hot(argmax) construction.

Reference: scipy.optimize.linear_sum_assignment on host per image per layer
(matcher.py:83-86); the auction + eps-CS bound replaces it on device (see
ops/assignment.py for the duality argument — unchanged here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = np.float32(-1e30)


def _auction_kernel(benefit_ref, mask_ref, assigned_ref, iters_ref, *,
                    eps: float, max_iters: int, q_real: int):
    """One block of problems. benefit (PB, T, Qp) f32 (padded columns at
    -1e30), mask (PB, T) i32 {0,1}. Outputs: assigned (PB, T) i32
    (query index per person; -1 unassigned, -2 padded person),
    iters (PB, 1) i32."""
    benefit = benefit_ref[...]
    mask = mask_ref[...]
    PB, T, Qp = benefit.shape

    n_valid = jnp.sum(mask, axis=1, keepdims=True)           # (PB, 1)
    n_over = jnp.maximum(n_valid - q_real, 0)                 # (PB, 1)

    price0 = jnp.zeros((PB, Qp), jnp.float32)
    owner0 = jnp.full((PB, Qp), -1, jnp.int32)
    assigned0 = jnp.where(mask != 0, -1, -2).astype(jnp.int32)  # (PB, T)
    finished0 = (n_valid <= n_over).astype(jnp.int32)         # (PB, 1)
    iters0 = jnp.zeros((PB, 1), jnp.int32)

    row_t = jax.lax.broadcasted_iota(jnp.int32, (PB, T, Qp), 1)

    def cond(carry):
        _, _, _, finished, _, it = carry
        return (jnp.sum(1 - finished) > 0) & (it < max_iters)

    def body(carry):
        price, owner, assigned, finished, iters, it = carry
        active = (finished == 0)                              # (PB, 1)
        iters = iters + (1 - finished)

        # NOTE Mosaic constraint: adding a minor dim to an i1 vector is not
        # supported — every `[:, None, :]`-style expansion below happens on
        # a 32-bit array BEFORE the comparison that produces a mask.
        values = benefit - price[:, None, :]                  # (PB, T, Qp)
        top1 = jnp.argmax(values, axis=2)                     # (PB, T)
        col = jax.lax.broadcasted_iota(jnp.int32, (PB, T, Qp), 2)
        onehot = col == top1[:, :, None]
        top2v = jnp.max(jnp.where(onehot, _NEG, values), axis=2)   # (PB, T)
        b1 = jnp.max(jnp.where(onehot, benefit, _NEG), axis=2)
        bidval = b1 - top2v + eps
        unassigned3 = assigned[:, :, None] == -1              # (PB, T, 1)
        bids = jnp.where(unassigned3 & onehot,
                         bidval[:, :, None], _NEG)
        best_bid = jnp.max(bids, axis=1)                      # (PB, Qp)
        best_person = jnp.argmax(bids, axis=1).astype(jnp.int32)
        won = (best_bid > _NEG / 2) & active                  # (PB, Qp)

        won3 = (best_bid[:, None, :] > _NEG / 2) & (
            finished[:, :, None] == 0)                        # (PB, 1, Qp)
        lost = jnp.any(won3 & (owner[:, None, :] == row_t),
                       axis=2)                                # (PB, T)
        w = won3 & (best_person[:, None, :] == row_t)
        got = jnp.any(w, axis=2)                              # (PB, T)
        # f32 mask: Mosaic's index-reductions only lower for float32
        obj = jnp.argmax(w.astype(jnp.float32), axis=2).astype(jnp.int32)

        assigned = jnp.where(got, obj, jnp.where(lost, -1, assigned))
        owner = jnp.where(won, best_person, owner)
        price = jnp.where(won, best_bid, price)

        n_un = jnp.sum((assigned == -1).astype(jnp.int32), axis=1,
                       keepdims=True)                         # (PB, 1)
        finished = (n_un <= n_over).astype(jnp.int32)
        return price, owner, assigned, finished, iters, it + 1

    _, _, assigned, _, iters, _ = jax.lax.while_loop(
        cond, body, (price0, owner0, assigned0, finished0, iters0,
                     jnp.int32(0)))
    assigned_ref[...] = assigned
    iters_ref[...] = iters


@functools.partial(jax.jit, static_argnames=("eps", "max_iters",
                                             "problem_block", "interpret"))
def auction_phase_pallas(benefit: jnp.ndarray, person_mask: jnp.ndarray,
                         eps: float = 2e-3, max_iters: int = 5000,
                         problem_block: int = 32,
                         interpret: bool = False):
    """Run the single-eps auction phase for a batch of problems.

    benefit: (P, T, Q) f32, already spread-normalized with padded persons
      neutralized (see assignment.auction_assignment_stats — the same
      pre-processing feeds both paths).
    person_mask: (P, T) bool.

    Returns (assigned (P, T) int32, iters (P,) int32) with the same
    semantics as the XLA `_auction_phase` (-1 unassigned valid person,
    -2 padded person)."""
    P, T, Q = benefit.shape
    # a problem block of 1 hits Mosaic "Not implemented: Lane broadcast"
    # (measured on v5e: P=1 fails, P>=2 compiles) — keep the block dimension
    # at a sublane multiple; padded problems carry mask 0 and finish on
    # iteration 0, so the cost is nil
    PB = min(problem_block, max(-(-P // 8) * 8, 8))
    # pad problems to a PB multiple (mask 0 -> finished immediately),
    # persons to a sublane multiple, objects to a lane multiple at -inf so
    # padded columns never win a bid
    Pp = -(-P // PB) * PB
    Tp = -(-T // 8) * 8
    Qp = -(-Q // 128) * 128
    ben = jnp.full((Pp, Tp, Qp), _NEG, jnp.float32)
    ben = jax.lax.dynamic_update_slice(ben, benefit.astype(jnp.float32),
                                       (0, 0, 0))
    msk = jnp.zeros((Pp, Tp), jnp.int32)
    msk = jax.lax.dynamic_update_slice(msk, person_mask.astype(jnp.int32),
                                       (0, 0))

    assigned, iters = pl.pallas_call(
        functools.partial(_auction_kernel, eps=eps, max_iters=max_iters,
                          q_real=Q),
        grid=(Pp // PB,),
        in_specs=[pl.BlockSpec((PB, Tp, Qp), lambda i: (i, 0, 0)),
                  pl.BlockSpec((PB, Tp), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((PB, Tp), lambda i: (i, 0)),
                   pl.BlockSpec((PB, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((Pp, Tp), jnp.int32),
                   jax.ShapeDtypeStruct((Pp, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(ben, msk)
    return assigned[:P, :T], iters[:P, 0]
