"""Compile-time regression guard (VERDICT r3 Next #2).

Round 3 shipped a train step whose tiny-config compile took 4m10s on CPU
(optim.flat_update built a params-sized lr vector in-trace from ~500
broadcasts + one concatenate; XLA's constant folder ground on it), which
timed out BOTH driver artifacts. 221 green tests didn't catch it because
nothing bounded trace/lower/compile time.

Two guards:
  1. lower+compile of the tiny-config train step stays under a wall budget
     (measured healthy: ~26s cold on the 1-core CI box; budget 120s).
     A persistent-cache hit makes this near-instant, which is fine — any
     CHANGED program is a cache miss and gets timed for real.
  2. the lowered StableHLO carries no literal constant over 1M elements
     (the alternative failure mode: baking a params-sized array into the
     program instead of folding one).
"""

import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step

from test_train_step import tiny_batch, tiny_cfg, tiny_model

COMPILE_BUDGET_S = 120.0
MAX_CONST_ELEMENTS = 1_000_000


def test_train_step_compile_budget(rng):
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = tiny_batch(rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])
    tx = make_optimizer(cfg, steps_per_epoch=10, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=0)
    gates = Gates.for_epoch(cfg, 20)

    t0 = time.time()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1), gates)
    hlo = lowered.as_text()

    # guard 2: no params-sized literal constants in the program
    for m in re.finditer(r"stablehlo\.constant[^\n]*tensor<([0-9x]+)x[a-z]", hlo):
        dims = [int(d) for d in m.group(1).split("x") if d]
        n = int(np.prod(dims)) if dims else 1
        assert n <= MAX_CONST_ELEMENTS, (
            f"literal constant with {n} elements in lowered train step: "
            f"{m.group(0)[:120]}")

    lowered.compile()
    elapsed = time.time() - t0
    # guard 1: would have caught 57eaf68 (4m10s for this same config)
    assert elapsed < COMPILE_BUDGET_S, (
        f"tiny-config train step took {elapsed:.0f}s to lower+compile "
        f"(budget {COMPILE_BUDGET_S:.0f}s) — compile-time regression")
