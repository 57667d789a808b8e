"""Benchmark: full-pyramid WaldBoost detection throughput on one chip.

Measures the BASELINE.json headline config — VGA (640x480) grayscale images,
full channel pyramid (grad_hist, shrink=2, n_per_oct=8, smooth=1), 64-stage
depth-2 soft cascade with SPRT rejection — end to end on device (channels +
packed-canvas cascade), batched.

Every iteration uses a distinct input image: the axon TPU runtime dedupes
identical executions, so same-input loops measure nothing.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver-set north star of 1000 MP/s/chip (BASELINE.json:5;
the CPU reference publishes no numbers, BASELINE.md).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "12"))
    warmup = 2

    model = _flagship_model()
    # trained-detector-like rejection schedule so SPRT early-exit engages
    model.theta = [(-2.0 if t < 2 else -0.5 + 0.02 * t) for t in range(len(model))]
    model._version += 1

    fn, packed = make_batched_detector(model, (h, w))

    rng = np.random.RandomState(0)
    batches = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]

    out = None
    for i in range(warmup):
        out = fn(batches[i])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = [fn(batches[warmup + i]) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    mp = h * w / 1e6 * batch * iters
    mps = mp / dt
    baseline = 1000.0  # MP/s/chip north-star target (BASELINE.json:5)
    print(json.dumps({
        "metric": "full_pyramid_detection_throughput",
        "value": round(mps, 2),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
