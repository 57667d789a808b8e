"""Probe: does the JAX persistent compilation cache work through the axon
TPU backend?  Run twice in fresh processes; second run's compile time should
collapse if the cache is honored.  Usage: python scripts/exp_r10_cache.py tag
"""
import logging
import sys
import time

logging.basicConfig(level=logging.DEBUG)
for noisy in ("jax._src.dispatch", "jax._src.interpreters",
              "jax._src.xla_bridge"):
    logging.getLogger(noisy).setLevel(logging.INFO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

tag = sys.argv[1] if len(sys.argv) > 1 else "a"


@jax.jit
def f(x):
    # a nontrivial program so the compile is measurable
    for _ in range(8):
        x = jnp.tanh(x @ x.T + 1.0) @ x
    return x.sum()


x = jnp.asarray(np.random.RandomState(0).rand(512, 512).astype(np.float32))
t0 = time.perf_counter()
out = float(f(x))
t1 = time.perf_counter()
print(f"[{tag}] backend={jax.default_backend()} first-call {t1 - t0:.2f}s "
      f"out={out:.3f}")
import os
if os.path.isdir("/root/repo/.jax_cache"):
    n = sum(len(fs) for _, _, fs in os.walk("/root/repo/.jax_cache"))
    print(f"[{tag}] cache entries: {n}")
