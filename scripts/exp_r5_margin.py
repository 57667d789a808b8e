"""TPU experiment: -inf-latch vs margin-min encoding in the masked cascade
kernel (same op count; margin splits the serial add->cmp->select chain into
independent add and min chains).

nohup python scripts/exp_r5_margin.py > /tmp/exp_margin.log 2>&1 &
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
    from waldboost_tpu.parallel.detect import make_batched_detector

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, _, packed, content_hw = parts
    from waldboost_tpu.ops.cascade_static import (cascade_masked_grid_static,
                                                  static_cascade_from_model)
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]
    canvas_jit = jax.jit(canvas_b)
    canvases = [canvas_jit(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])

    # correctness first: bitwise masked map + counts, latch vs margin
    a = cascade_masked_grid_static(canvases[0], sc, valid, (m, n),
                                   content_hw=(Hc, Wc), with_n_weak=False,
                                   preshift=True, block=16)
    b = cascade_masked_grid_static(canvases[0], sc, valid, (m, n),
                                   content_hw=(Hc, Wc), with_n_weak=False,
                                   preshift=True, block=16, margin_enc=True)
    ok_map = bool(jnp.array_equal(a[0], b[0]))
    ok_cnt = bool(jnp.array_equal(a[2], b[2]))
    print(json.dumps({"check": "latch_vs_margin",
                      "map_equal": ok_map, "count_equal": ok_cnt}),
          flush=True)

    def timeit(name, fn, inputs, fetch, reps=3):
        best = None
        for _rep in range(reps):
            out = fn(inputs[0]); _ = float(fetch(out))
            out = fn(inputs[1]); _ = float(fetch(out))
            t0 = time.perf_counter()
            last = None
            for i in range(iters):
                last = fn(inputs[warmup + i])
            _ = float(fetch(last))
            dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
            best = dt if best is None else min(best, dt)
        print(json.dumps({"name": name, "ms_per_image": round(best, 4)}),
              flush=True)

    for me in (False, True):
        for blk in (8, 16):
            fn = jax.jit(lambda cv, me=me, b=blk: cascade_masked_grid_static(
                cv, sc, valid, (m, n), content_hw=(Hc, Wc),
                with_n_weak=False, preshift=True, block=b, margin_enc=me))
            timeit(f"casc_me{int(me)}_blk{blk}", fn, canvases,
                   lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
