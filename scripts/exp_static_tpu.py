"""TPU experiment: static-specialized cascade kernel throughput.

nohup python scripts/exp_static_tpu.py > /tmp/exp_static.log 2>&1 &
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
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import _channel_canvas_fast, _packed_plan_cached
    from waldboost_tpu.ops.cascade_static import (
        cascade_response_grid_static, static_cascade_from_model)

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2

    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))

    canvas_b = jax.vmap(
        lambda im: _channel_canvas_fast(im, shrink, smooth, cf, packed)
        .astype(jnp.float32))

    rng = np.random.RandomState(0)
    n_batches = iters + warmup

    def timeit(name, fn):
        batches = [
            jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
            for _ in range(n_batches)
        ]
        t_c0 = time.perf_counter()
        out = fn(batches[0])
        _ = float(out)
        compile_s = time.perf_counter() - t_c0
        for i in range(1, warmup):
            out = fn(batches[i])
        _ = float(out)
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(batches[warmup + i])
        _ = float(last)
        dt = time.perf_counter() - t0
        ms_img = dt / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(ms_img, 3),
                          "mps": round(h * w / 1e6 / (ms_img / 1e3), 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms_img

    def detect_static(tile):
        def fn(images):
            cvs = canvas_b(images)
            hs, alive, nw = cascade_response_grid_static(cvs, sc, valid,
                                                         (m, n), tile=tile)
            return nw.sum()
        return jax.jit(fn)

    timeit("canvas+static64_t128x256", detect_static((128, 256)))
    timeit("canvas+static64_t64x256", detect_static((64, 256)))
    timeit("canvas+static64_t256x512", detect_static((256, 512)))
    timeit("canvas+static64_t64x512", detect_static((64, 512)))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
