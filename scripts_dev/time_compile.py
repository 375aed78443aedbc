"""Time trace/lower/compile of the tiny-config train step on CPU.

Usage: JAX_PLATFORMS=cpu python scripts_dev/time_compile.py [--preset]
Isolates where compile time goes after the round-3 regression.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from test_train_step import tiny_cfg, tiny_model, tiny_batch
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step


def main():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), batch["images"])
    print(f"init params: {time.time()-t0:.1f}s", flush=True)

    tx = make_optimizer(cfg, steps_per_epoch=10, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = make_train_step(model, cfg, tx)
    gates = Gates.for_epoch(cfg, 20)

    jstep = jax.jit(step, donate_argnums=0)
    t0 = time.time()
    lowered = jstep.lower(state, batch, jax.random.PRNGKey(1), gates)
    t_lower = time.time() - t0
    print(f"lower: {t_lower:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"compile: {t_compile:.1f}s", flush=True)
    t0 = time.time()
    new_state, metrics = compiled(state, batch, jax.random.PRNGKey(1), gates)
    jax.block_until_ready(metrics["loss"])
    print(f"run: {time.time()-t0:.1f}s loss={float(metrics['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
