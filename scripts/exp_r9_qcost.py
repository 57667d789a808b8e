"""Device cost of quantile vs uniform binning in the stage train step.

Quantile edges need a per-feature device sort of the stacked pools
((~4k, 576) f32, axis 0) every stage; TPU sorts are bitonic and could
price the quality win out of the training loop.  Times the jitted stage
step alone (distinct weights per iteration; FIFO-drain timing).

  nohup python scripts/exp_r9_qcost.py > /tmp/exp_qcost.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("QCOST_ITERS", "12"))


def main():
    import jax.numpy as jnp

    from waldboost_tpu.parallel.train_step import make_train_step

    rng = np.random.RandomState(0)
    N, F = 2048, 576
    x0 = jnp.asarray(rng.randn(N, F).astype(np.float32))
    x1 = jnp.asarray(rng.randn(N, F).astype(np.float32) + 0.3)
    v0 = jnp.asarray(rng.rand(N) < 0.9)
    v1 = jnp.asarray(rng.rand(N) < 0.9)
    fmask = jnp.ones((2, F), bool)

    for binning in ("uniform", "quantile"):
        step = make_train_step(alpha=0.2, max_depth=2, binning=binning)
        Hs = [jnp.asarray(rng.randn(N).astype(np.float32) * 0.1)
              for _ in range(2 * (ITERS + 2))]

        def call(i):
            return step(x0, Hs[2 * i], v0, x1, Hs[2 * i + 1], v1,
                        jnp.float32(0.5), jnp.float32(0.99),
                        jnp.float32(-np.inf), jnp.asarray(True), fmask)

        res = call(0)
        _ = float(res.theta)
        res = call(1)
        _ = float(res.theta)
        t0 = time.perf_counter()
        for i in range(2, 2 + ITERS):
            res = call(i)
        _ = float(res.theta)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"binning": binning, "ms_per_stage":
                          round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
