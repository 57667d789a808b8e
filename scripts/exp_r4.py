"""TPU experiments (round 4): masked-kernel encoding + alignment probes.

nohup python scripts/exp_r4.py > /tmp/exp_r4.log 2>&1 &

Variants (FIFO-drain timing, 3 reps, min):
  base         masked kernel as configured for serving (preshift, block=16,
               with_n_weak=False -> -inf latch encoding)
  nw1          with_n_weak=True (old alive-multiply encoding)
  cap16/32/48  n_stages_cap sweep -> marginal per-stage cost
  fr8          TIMING PROBE: fr rounded to multiples of 8 (sublane-aligned
               operand rows; wrong results, measures misalignment cost)
  fc0          TIMING PROBE: fc zeroed (lane-aligned; wrong results)
  e2e          full serving program (canvas+cascade+extract+NMS)
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
    from waldboost_tpu.ops.cascade_static import (StaticCascade,
                                                  cascade_masked_grid_static,
                                                  static_cascade_from_model)
    from waldboost_tpu.parallel.detect import (make_batched_detector,
                                               make_batched_detector_boxes)

    h, w = 480, 640
    # batch 32 / 8 iters for the kernel-variant section: 18 held batch-64
    # canvases (~670 MB each) exhaust HBM
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, _, packed, content_hw = parts
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

    def casc_fn(sc2, wn=False, cap=None, block=16):
        return jax.jit(lambda cv: cascade_masked_grid_static(
            cv, sc2, valid, (m, n), content_hw=(Hc, Wc), with_n_weak=wn,
            preshift=True, block=block, n_stages_cap=cap))

    fetch = lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32)

    timeit("base", casc_fn(sc), canvases, fetch)
    timeit("nw1", casc_fn(sc, wn=True), canvases, fetch)
    for cap in (16, 32, 48):
        timeit(f"cap{cap}", casc_fn(sc, cap=cap), canvases, fetch)

    # alignment probes (WRONG results; timing only)
    sc_fr8 = StaticCascade((sc.fr // 8) * 8, sc.fc, sc.fch, sc.thr, sc.left,
                           sc.right, sc.pred, sc.theta)
    timeit("fr8", casc_fn(sc_fr8), canvases, fetch)
    sc_fc0 = StaticCascade(sc.fr, np.zeros_like(sc.fc), sc.fch, sc.thr,
                           sc.left, sc.right, sc.pred, sc.theta)
    timeit("fc0", casc_fn(sc_fc0), canvases, fetch)
    sc_al = StaticCascade((sc.fr // 8) * 8, np.zeros_like(sc.fc), sc.fch,
                          sc.thr, sc.left, sc.right, sc.pred, sc.theta)
    timeit("fr8fc0", casc_fn(sc_al), canvases, fetch)

    # block-schedule sweep on the new encoding
    for blk in (8, 16, 32, (16, 8), 64):
        name = f"blk{blk}" if isinstance(blk, int) else "blk16_8"
        timeit(name, casc_fn(sc, block=blk), canvases, fetch)

    # end-to-end serving program at the headline config (batch 64)
    del canvases
    batch = 64
    iters = 16
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]
    fn, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                        with_n_weak=False)
    e2e = timeit(
        "e2e", fn, image_sets,
        lambda o: o[2].sum().astype(jnp.float32) + o[1].sum())
    print(json.dumps({"name": "e2e_mps",
                      "mps": round(h * w / 1e6 / e2e * 1e3, 1)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
