"""Where do train_step's ~90 ms/stage go? (r4 warm profile: train_step
55% of the training loop.)  Times K dispatches of the SAME compiled stage
program with distinct inputs (FIFO drain timing) to separate per-dispatch
device time from the loop's host-side costs.

nohup python scripts/exp_r10_stepcost.py > /tmp/stepcost.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waldboost_tpu  # noqa: F401  (cache config)
from waldboost_tpu.parallel.train_step import make_train_step

N = 2048          # pool capacity per class (bench: 2*max(1000,1000))
F = 12 * 12 * 4
K = 16

rng = np.random.RandomState(0)
step = make_train_step(alpha=0.2, max_depth=2, n_bins=256,
                       binning="quantile", mesh=None)

xs = []
for i in range(K + 2):
    x0 = jnp.asarray(rng.randn(N, F).astype("f"))
    x1 = jnp.asarray((rng.randn(N, F) + 1.0).astype("f"))
    H0 = jnp.asarray(rng.randn(N).astype("f") * 0.1)
    H1 = jnp.asarray(rng.randn(N).astype("f") * 0.1)
    v0 = jnp.asarray(rng.rand(N) < 0.9)
    v1 = jnp.asarray(rng.rand(N) < 0.9)
    xs.append((x0, H0, v0, x1, H1, v1))


def run(args):
    x0, H0, v0, x1, H1, v1 = args
    return step(x0, H0, v0, x1, H1, v1, jnp.float32(1.0), jnp.float32(1.0),
                jnp.float32(-np.inf), jnp.asarray(True))


res = run(xs[0])
_ = float(res.loss)
res = run(xs[1])
_ = float(res.loss)

t0 = time.perf_counter()
last = None
for i in range(K):
    last = run(xs[2 + i])
_ = float(last.loss)
dt = time.perf_counter() - t0
print(f"{K} steps in {dt:.3f}s = {dt / K * 1e3:.1f} ms/step (enqueued)")

# sequential (fetch each result -> includes round trip per step)
t0 = time.perf_counter()
for i in range(K):
    _ = float(run(xs[2 + (i % K)]).loss)
dt2 = time.perf_counter() - t0
print(f"sequential with per-step fetch: {dt2 / K * 1e3:.1f} ms/step")
