"""TPU experiments (round 4c): where does the masked kernel's fixed cost go?

cap1 (1-stage cascade) costs 0.146 ms/img at batch 32 — over half the full
64-stage program.  Candidates: per-dispatch overhead (amortizes with batch),
per-grid-step overhead (scales with tiles), tile DMA volume.

nohup python scripts/exp_r4c.py > /tmp/exp_r4c.log 2>&1 &
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
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, _, packed, _ = parts
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w
    from waldboost_tpu.ops.cascade_static import cascade_grid
    print(json.dumps({"canvas": [Hc, Wc],
                      "grid": cascade_grid((Hc, Wc), (m, n))}), flush=True)

    rng = np.random.RandomState(0)

    def make_sets(batch, n_sets):
        return [
            jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
            for _ in range(n_sets)
        ]

    def timeit(name, fn, inputs, fetch, batch, iters, reps=3):
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

    # --- dispatch floor: trivial program over the same input size ---------
    for batch in (32, 64):
        sets = make_sets(batch, 10)
        triv = jax.jit(lambda x: x.astype(jnp.float32).sum())
        timeit(f"trivial_b{batch}", triv, sets, lambda o: o, batch, 8)

    # --- kernel-only at different batch sizes + tile shapes ---------------
    def casc_fn(tile=(128, 256), cap=None):
        return jax.jit(lambda cv: cascade_masked_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc), with_n_weak=False,
            preshift=True, preshift_lazy=True, block=16, n_stages_cap=cap,
            tile=tile))

    fetch = lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32)

    canvas_jit = jax.jit(canvas_b)
    for batch in (32, 64):
        sets = make_sets(batch, 10)
        cvs = [canvas_jit(ims) for ims in sets]
        _ = float(cvs[-1][0, 0, 0, 0])
        timeit(f"cap1_b{batch}", casc_fn(cap=1), cvs, fetch, batch, 8)
        timeit(f"full_b{batch}", casc_fn(), cvs, fetch, batch, 8)
        del cvs

    # NOTE: content_hw path requires the canvas allocation to cover the
    # halo fetch of the DEFAULT grid; bigger tiles need their own canvas
    # geometry, so tile variants run on the non-fused (padded) path.
    batch = 32
    sets = make_sets(batch, 10)
    cvs_crop = [canvas_jit(ims)[:, :, :Hc, :Wc] for ims in sets]
    _ = float(cvs_crop[-1][0, 0, 0, 0])

    def casc_pad(tile):
        return jax.jit(lambda cv: cascade_masked_grid_static(
            cv, sc, valid, (m, n), with_n_weak=False, preshift=True,
            preshift_lazy=True, block=16, tile=tile))

    for tile in ((128, 256), (128, 512), (256, 256), (256, 512)):
        timeit(f"tile{tile[0]}x{tile[1]}", casc_pad(tile), cvs_crop, fetch,
               batch, 8)
    del cvs_crop

    # --- e2e batch sweep --------------------------------------------------
    for batch in (32, 64, 128):
        sets = make_sets(batch, 18 if batch <= 64 else 10)
        fn, _ = make_batched_detector_boxes(model, (h, w), k=256,
                                            nms_iou=0.5, with_n_weak=False)
        e2e = timeit(f"e2e_b{batch}", fn, sets,
                     lambda o: o[2].sum().astype(jnp.float32) + o[1].sum(),
                     batch, 16 if batch <= 64 else 8)
        print(json.dumps({"name": f"e2e_b{batch}_mps",
                          "mps": round(h * w / 1e6 / e2e * 1e3, 1)}),
              flush=True)
        del sets
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
