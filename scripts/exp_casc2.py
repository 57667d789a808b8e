"""TPU experiment: masked-cascade kernel variants + channel kernel cost.

nohup python scripts/exp_casc2.py > /tmp/exp_c2.log 2>&1 &

FIFO-drain timing (enqueue iters, fetch one scalar from the last result),
two passes per variant (report the min) to damp tunnel drift.
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
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, cascade_masked_b, packed, content_hw = parts
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.ops.cascade_static import (cascade_masked_grid_static,
                                                  static_cascade_from_model)
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
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

    def timeit(name, fn, inputs, fetch, reps=2):
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

    timeit("canvas_program", canvas_jit, image_sets, lambda o: o[0, 0, 0, 0])

    for ps in (False, True):
        for wn in (True, False):
            fn = jax.jit(lambda cv, ps=ps, wn=wn: cascade_masked_grid_static(
                cv, sc, valid, (m, n), content_hw=(Hc, Wc),
                with_n_weak=wn, preshift=ps))
            timeit(f"casc_ps{int(ps)}_nw{int(wn)}", fn, canvases,
                   lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32))

    # block-size sweep on the best variant
    for blk in (8, 16):
        fn = jax.jit(lambda cv, b=blk: cascade_masked_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc),
            with_n_weak=False, preshift=True, block=b))
        timeit(f"casc_ps1_nw0_blk{blk}", fn, canvases,
               lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
