"""Time the stage program's FIRST dispatch in a fresh process with a warm
disk cache: trace/load vs execute split (the ~10 s segment-0 cost seen in
exp_r10_benchdp).

python scripts/exp_r10_firstdispatch.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waldboost_tpu  # noqa: F401
from waldboost_tpu.parallel.train_step import make_train_step

N, F = 2048, 576
rng = np.random.RandomState(0)
step = make_train_step(alpha=0.2, max_depth=2, n_bins=256,
                       binning="quantile", mesh=None)
args = (jnp.asarray(rng.randn(N, F).astype("f")),
        jnp.asarray(rng.randn(N).astype("f")),
        jnp.asarray(rng.rand(N) < 0.9),
        jnp.asarray(rng.randn(N, F).astype("f")),
        jnp.asarray(rng.randn(N).astype("f")),
        jnp.asarray(rng.rand(N) < 0.9),
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(-np.inf),
        jnp.asarray(True),
        jnp.ones((2, F), bool))

t0 = time.perf_counter()
_ = float((jnp.ones(()) + 1))  # claim
t1 = time.perf_counter()
print(f"claim: {t1 - t0:.2f}s", flush=True)

t0 = time.perf_counter()
res = step(*args)
t1 = time.perf_counter()
_ = float(res.loss)
t2 = time.perf_counter()
print(f"first dispatch (trace+load): {t1 - t0:.2f}s; "
      f"first result: {t2 - t1:.2f}s", flush=True)

t0 = time.perf_counter()
_ = float(step(*args[:6] + args[6:]).loss)
t1 = time.perf_counter()
print(f"second call: {t1 - t0:.2f}s", flush=True)
