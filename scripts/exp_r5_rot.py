"""TPU experiment: how much of the cascade kernel is sublane-rotate cost?

Variant "r8": same cascade but every node row offset snapped to a multiple
of 8 (semantics differ — timing only).  If it's much faster, misaligned
sublane reads are a real wall.  Also sweeps n_stages_cap to split fixed
overhead (DMA, conds, preshift copies) from marginal per-stage cost.

nohup python scripts/exp_r5_rot.py > /tmp/exp_rot.log 2>&1 &
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

    # aligned-rows variant: r -> r - r%8 (timing only, not semantics)
    sc_r8 = StaticCascade(sc.fr - (sc.fr % 8), sc.fc, sc.fch, sc.thr,
                          sc.left, sc.right, sc.pred, sc.theta)
    # aligned-cols variant on top (c -> 0): kills lane rotates for the
    # single-use pairs that preshift leaves as direct reads
    sc_rc = StaticCascade(sc.fr - (sc.fr % 8), np.zeros_like(sc.fc), sc.fch,
                          sc.thr, sc.left, sc.right, sc.pred, sc.theta)

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
    for name, scv in (("base", sc), ("rows8", sc_r8), ("rows8_cols0", sc_rc)):
        fn = jax.jit(lambda cv, scv=scv: cascade_masked_grid_static(
            cv, scv, valid, (m, n), content_hw=(Hc, Wc),
            with_n_weak=False, preshift=True, block=16))
        timeit(f"casc_{name}", fn, canvases, fetch)

    for cap in (16, 32, 48):
        fn = jax.jit(lambda cv, cap=cap: cascade_masked_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc),
            with_n_weak=False, preshift=True, block=16, n_stages_cap=cap))
        timeit(f"casc_cap{cap}", fn, canvases, fetch)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
