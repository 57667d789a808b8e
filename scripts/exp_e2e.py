"""Quick headline e2e measurement (batch 64, 16 iters, 3 reps min).

nohup python scripts/exp_e2e.py > /tmp/exp_e2e.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    warmup = 2
    model = _flagship_model()
    rng = np.random.RandomState(0)
    sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]
    fn, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                        with_n_weak=False)
    fetch = lambda o: o[2].sum().astype(jnp.float32) + o[1].sum()
    best = None
    for _rep in range(3):
        out = fn(sets[0]); _ = float(fetch(out))
        out = fn(sets[1]); _ = float(fetch(out))
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(sets[warmup + i])
        _ = float(fetch(last))
        dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
        best = dt if best is None else min(best, dt)
    print(json.dumps({"name": "e2e", "ms_per_image": round(best, 4),
                      "mps": round(h * w / 1e6 / best * 1e3, 1)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
