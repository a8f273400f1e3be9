# worker spool script: trivial-program floor (claim already paid by the
# worker's init) — the per-dispatch tunnel cost for today's weather.
import time

import jax
import jax.numpy as jnp

for i in range(3):
    t0 = time.time()
    v = jax.device_get(jax.jit(lambda a: (a * 2 + i).sum())(jnp.arange(64.0)))
    print(f"trivial[{i}] {time.time() - t0:.3f}s v={v}", flush=True)
