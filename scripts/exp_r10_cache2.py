"""Separate axon first-use costs: device claim vs cached-executable load
vs fresh compile.  Phase A: trivial op (pays the device claim).  Phase B:
the cached program f from exp_r10_cache (persistent-cache hit -> measures
executable LOAD).  Phase C: a novel program g (cache miss -> compile+load).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

t0 = time.perf_counter()
x1 = jnp.ones(())
_ = float(x1 + 1)
t1 = time.perf_counter()
print(f"A claim+trivial: {t1 - t0:.2f}s", flush=True)


@jax.jit
def f(x):
    for _ in range(8):
        x = jnp.tanh(x @ x.T + 1.0) @ x
    return x.sum()


x = jnp.asarray(np.random.RandomState(0).rand(512, 512).astype(np.float32))
t2 = time.perf_counter()
_ = float(f(x))
t3 = time.perf_counter()
print(f"B cached-load+run: {t3 - t2:.2f}s", flush=True)


@jax.jit
def g(x):
    for _ in range(8):
        x = jnp.tanh(x @ x.T + 0.5) @ x  # novel constant -> cache miss
    return x.sum()


t4 = time.perf_counter()
_ = float(g(x))
t5 = time.perf_counter()
print(f"C fresh-compile+run: {t5 - t4:.2f}s", flush=True)

# second call of each: steady-state dispatch
t6 = time.perf_counter()
_ = float(f(x * 1.001))
t7 = time.perf_counter()
print(f"D steady dispatch: {t7 - t6:.2f}s", flush=True)
