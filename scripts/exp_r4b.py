"""TPU experiments (round 4b): preshift policy sweep on the masked kernel.

nohup python scripts/exp_r4b.py > /tmp/exp_r4b.log 2>&1 &
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
    from waldboost_tpu.parallel.detect import make_batched_detector

    h, w = 480, 640
    batch = 32
    iters = 8
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, _, packed, _ = parts
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w

    rng = np.random.RandomState(0)
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]
    canvas_jit = jax.jit(canvas_b)
    canvases = [canvas_jit(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])

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
        return best

    def casc_fn(ps=True, mu=2, lazy=False, cap=None):
        return jax.jit(lambda cv: cascade_masked_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc), with_n_weak=False,
            preshift=ps, block=16, n_stages_cap=cap, preshift_min_uses=mu,
            preshift_lazy=lazy))

    fetch = lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32)

    timeit("mu2", casc_fn(), canvases, fetch)
    timeit("ps0", casc_fn(ps=False), canvases, fetch)
    for mu in (3, 4, 6):
        timeit(f"mu{mu}", casc_fn(mu=mu), canvases, fetch)
    for mu in (2, 3, 4):
        timeit(f"lazy_mu{mu}", casc_fn(mu=mu, lazy=True), canvases, fetch)
    # fixed-cost isolation: 1-stage cap with/without the eager copy pass
    timeit("cap1_ps1", casc_fn(cap=1), canvases, fetch)
    timeit("cap1_ps0", casc_fn(ps=False, cap=1), canvases, fetch)
    timeit("cap1_lazy", casc_fn(cap=1, lazy=True), canvases, fetch)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
