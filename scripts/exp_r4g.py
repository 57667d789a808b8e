"""TPU (round 4g): e2e A/B in one process (drift-canceling).

Variants: banded selector matmuls on/off x block schedule x k.

nohup python scripts/exp_r4g.py > /tmp/exp_r4g.log 2>&1 &
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
    batch = 64
    iters = 16
    warmup = 2
    model = _flagship_model()
    rng = np.random.RandomState(0)
    sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]
    fetch = lambda o: o[2].sum().astype(jnp.float32) + o[1].sum()

    def timeit(name, fn, reps=3):
        best = None
        for _rep in range(reps):
            out = fn(sets[0]); _ = float(fetch(out))
            out = fn(sets[1]); _ = float(fetch(out))
            t0 = time.perf_counter()
            last = None
            for i in range(iters):
                last = fn(sets[warmup + i])
            _ = float(fetch(last))
            dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
            best = dt if best is None else min(best, dt)
        print(json.dumps({"name": name, "ms_per_image": round(best, 4),
                          "mps": round(h * w / 1e6 / best * 1e3, 1)}),
              flush=True)

    cases = [
        ("base_k256", "0", "16", 256),
        ("banded_k256", "1", "16", 256),
        ("banded_blk168_k256", "1", "16,16,8", 256),
        ("banded_blk168_k128", "1", "16,16,8", 128),
    ]
    fns = []
    for name, banded, blk, k in cases:
        os.environ["WB_POLY_BANDED"] = banded
        os.environ["WB_CASCADE_BLOCK"] = blk
        fn, _ = make_batched_detector_boxes(model, (h, w), k=k, nms_iou=0.5,
                                            with_n_weak=False)
        fns.append((name, fn))
    # interleave reps across variants? simpler: run in order, then reverse
    for name, fn in fns:
        timeit(name, fn)
    for name, fn in reversed(fns):
        timeit(name + "_r2", fn)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
