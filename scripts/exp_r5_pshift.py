"""TPU experiment: preshift policy under the SERVING config (lazy) +
alignment sensitivities + tile re-sweep.

The round-5 rot experiment (eager preshift) showed cols-aligned saves 49%:
the lane-rotate slab copies are the wall.  This sweep measures the same
sensitivities under the serving config (preshift_lazy=True) and retests
min_uses and tile shapes there.

nohup python scripts/exp_r5_pshift.py > /tmp/exp_pshift.log 2>&1 &
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
    from waldboost_tpu.ops.cascade_static import (StaticCascade,
                                                  cascade_masked_grid_static,
                                                  static_cascade_from_model)
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w

    sc_c0 = StaticCascade(sc.fr, np.zeros_like(sc.fc), sc.fch, sc.thr,
                          sc.left, sc.right, sc.pred, sc.theta)

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
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

    fetch = lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32)

    def run(name, scv=sc, **kw):
        kw.setdefault("with_n_weak", False)
        kw.setdefault("preshift", True)
        kw.setdefault("block", 16)
        fn = jax.jit(lambda cv, scv=scv, kw=kw: cascade_masked_grid_static(
            cv, scv, valid, (m, n), content_hw=(Hc, Wc), **kw))
        timeit(name, fn, canvases, fetch)

    # serving baseline + sensitivities under lazy
    run("lazy_base", preshift_lazy=True)
    run("lazy_cols0", sc_c0, preshift_lazy=True)
    # policy sweep
    for mu in (1, 3, 4):
        run(f"lazy_mu{mu}", preshift_lazy=True, preshift_min_uses=mu)
    run("eager_mu1", preshift_lazy=False, preshift_min_uses=1)
    # tile re-sweep under serving config
    for tile in ((64, 512), (128, 384), (128, 512), (64, 256)):
        run(f"lazy_tile{tile[0]}x{tile[1]}", preshift_lazy=True, tile=tile)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
