"""TPU (round 4f): bands retry under -inf encoding; extraction k sweep.

nohup python scripts/exp_r4f.py > /tmp/exp_r4f.log 2>&1 &
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
    from waldboost_tpu.ops.cascade_static import (cascade_masked_grid_static,
                                                  static_cascade_from_model)
    from waldboost_tpu.parallel.detect import (make_batched_detector,
                                               make_batched_detector_boxes)

    h, w = 480, 640
    batch = 32
    iters = 8
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape
    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, _, packed, _ = parts
    mats = canvas_b.mats
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w

    rng = np.random.RandomState(0)
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]
    cjit = jax.jit(canvas_b)
    canvases = [cjit(ims, mats) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])

    def timeit(name, fn, inputs, fetch, reps=3, nb=batch):
        best = None
        for _rep in range(reps):
            out = fn(inputs[0]); _ = float(fetch(out))
            out = fn(inputs[1]); _ = float(fetch(out))
            t0 = time.perf_counter()
            last = None
            for i in range(iters):
                last = fn(inputs[warmup + i])
            _ = float(fetch(last))
            dt = (time.perf_counter() - t0) / (iters * nb) * 1e3
            best = dt if best is None else min(best, dt)
        print(json.dumps({"name": name, "ms_per_image": round(best, 4)}),
              flush=True)
        return best

    def casc_fn(bands=1, block=16):
        return jax.jit(lambda cv: cascade_masked_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc), with_n_weak=False,
            preshift=True, preshift_lazy=True, block=block, bands=bands))

    fetch = lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32)
    timeit("bands1", casc_fn(), canvases, fetch)
    timeit("bands2", casc_fn(bands=2), canvases, fetch)
    timeit("bands4", casc_fn(bands=4), canvases, fetch)
    timeit("blk16_16_8", casc_fn(block=(16, 16, 8)), canvases, fetch)
    del canvases

    for k in (64, 128, 256):
        fn, _ = make_batched_detector_boxes(model, (h, w), k=k, nms_iou=0.5,
                                            with_n_weak=False)
        timeit(f"e2e_k{k}", fn, image_sets,
               lambda o: o[2].sum().astype(jnp.float32) + o[1].sum())
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
