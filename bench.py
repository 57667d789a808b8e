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
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import (_channel_canvas_batch, _packed_plan_cached)
    from waldboost_tpu.ops.cascade_static import (cascade_response_grid_static,
                                                  static_cascade_from_model)

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = 2

    # calibrated thetas: eval_cost in the 2-6 range of real trained detectors
    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def detect_batch(images):
        cvs = _channel_canvas_batch(images, shrink, n_per_oct, smooth, cf,
                                    packed)
        hs, alive, nw = cascade_response_grid_static(cvs, sc, valid, (m, n),
                                                     interpret=interpret)
        return nw.sum()

    # distinct images every call: the axon runtime dedupes identical
    # executions; the trailing scalar fetch drains the FIFO (block_until_ready
    # is unreliable through the tunnel)
    rng = np.random.RandomState(0)
    batches = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]

    for i in range(warmup):
        out = detect_batch(batches[i])
    _ = float(out)

    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = detect_batch(batches[warmup + i])
    _ = float(last)
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
