"""Connected-component labeling as ONE Pallas TPU kernel.

The XLA-op implementation (ops/cam_boxes._connected_components) iterates
[8-neighbor min; row run-min; column run-min] sweeps under a batched
while_loop. Each sweep is ~100 small HBM-resident ops over (B*P, S, S)
grids — at the recipe's 64x64 labeling grid the whole fixpoint is
launch-overhead dominated (part of the ~14 ms/step pseudo+criteria tail).

Here the ENTIRE fixpoint runs inside one kernel: each grid program loads one
(S, S) mask into VMEM, iterates sweeps locally (registers/VMEM only, zero
HBM round trips), and writes the final labels once. Convergence is tracked
per image — a converged image's remaining iterations reduce to a scalar
branch check.

Semantics are identical to the XLA path (same sweep, same fixpoint: every
foreground pixel ends with the minimum linear index of its 8-connected
component, background = _BIG); tests/test_cam_boxes.py asserts equality and
the scipy.ndimage.label oracle covers adversarial mazes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(2**30)


def _shifted(a, shift: int, axis: int, before: bool, fill):
    """Static shift along `axis` filling with `fill` (concat of a fill slab
    and a slice — jnp.pad/lax.pad are avoided for Mosaic friendliness)."""
    S0, S1 = a.shape
    if axis == 0:
        blk = jnp.full((shift, S1), fill, a.dtype)
        return (jnp.concatenate([blk, a[: S0 - shift]], 0) if before
                else jnp.concatenate([a[shift:], blk], 0))
    blk = jnp.full((S0, shift), fill, a.dtype)
    return (jnp.concatenate([blk, a[:, : S1 - shift]], 1) if before
            else jnp.concatenate([a[:, shift:], blk], 1))


def _run_min_axis(lab, mask, axis: int):
    """Min within contiguous foreground runs along `axis`, both directions
    (log-shift doubling — mirrors cam_boxes._run_min_axis).

    `mask` is int32 {0,1}: Mosaic cannot move i1 vectors through
    concatenate (Invalid vector register cast), so run-extension flags stay
    integer and AND becomes multiply."""
    S = lab.shape[axis]
    out = lab
    for before in (True, False):
        v = jnp.where(mask != 0, out, _BIG)
        c = mask
        shift = 1
        while shift < S:
            vs = _shifted(v, shift, axis, before, _BIG)
            cs = _shifted(c, shift, axis, before, np.int32(0))
            v = jnp.where(c != 0, jnp.minimum(v, vs), v)
            c = c * cs
            shift *= 2
        out = jnp.minimum(out, jnp.where(mask != 0, v, _BIG))
    return out


def _cc_kernel(mask_ref, out_ref, *, max_iters: int):
    mask = mask_ref[0]  # int32 {0,1}
    S = mask.shape[0]
    idx = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) * S +
           jax.lax.broadcasted_iota(jnp.int32, (S, S), 1))
    labels = jnp.where(mask != 0, idx, _BIG)

    def sweep(lab):
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                s = lab
                if dy:
                    s = _shifted(s, 1, 0, dy > 0, _BIG)
                if dx:
                    s = _shifted(s, 1, 1, dx > 0, _BIG)
                best = jnp.minimum(best, s)
        lab = jnp.where(mask != 0, jnp.minimum(lab, best), _BIG)
        lab = _run_min_axis(lab, mask, 1)
        lab = _run_min_axis(lab, mask, 0)
        return lab

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    def body(carry):
        lab, _, it = carry
        new = sweep(lab)
        return new, jnp.sum(jnp.where(new != lab, 1, 0)) > 0, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    out_ref[0] = labels


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def connected_components_pallas(masks: jnp.ndarray, max_iters: int = 96,
                                interpret: bool = False) -> jnp.ndarray:
    """8-connected component labels for a batch of binary masks.

    masks: (N, S, S) bool -> (N, S, S) int32 labels (min linear index per
    component; background = 2**30). One kernel launch for the whole batch.
    """
    N, S, _ = masks.shape
    return pl.pallas_call(
        functools.partial(_cc_kernel, max_iters=max_iters),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, S, S), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, S, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.int32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(masks.astype(jnp.int32))
