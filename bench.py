"""Benchmark: full-pyramid WaldBoost detection throughput on one chip.

Measures the BASELINE.json headline config — VGA (640x480) grayscale images,
full channel pyramid (grad_hist, shrink=2, n_per_oct=8, smooth=1), 64-stage
depth-2 soft cascade with SPRT rejection — end to end on device (channels +
packed-canvas cascade), batched.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver-set north star of 1000 MP/s/chip (BASELINE.json:5;
the CPU reference publishes no numbers, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    warmup = 3

    model = _flagship_model()
    fn, packed = make_batched_detector(model, (h, w))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))

    # compile + warmup
    for _ in range(warmup):
        out = fn(images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(images)
    jax.block_until_ready(out)
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
