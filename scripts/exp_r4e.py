"""TPU (round 4e): phase times of the ACTUAL one-program serving path.

Sum-of-phases vs the composed program exposes composition bubbles.

nohup python scripts/exp_r4e.py > /tmp/exp_r4e.log 2>&1 &
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
    from waldboost_tpu.parallel.detect import (_make_masked_detector_boxes,
                                               make_batched_detector,
                                               make_batched_detector_boxes)

    h, w = 480, 640
    batch = 64
    iters = 4  # batch-64 canvases are 850 MB/set; keep HBM in bounds
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape
    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]

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

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, cascade_masked_b, packed, content_hw = parts
    mats = canvas_b.mats
    cjit = jax.jit(canvas_b)
    canvas_fn = lambda ims: cjit(ims, mats)
    timeit("canvas", canvas_fn, image_sets, lambda cv: cv[0, 0, 0, 0])

    canvases = [canvas_fn(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])
    casc = jax.jit(lambda cv: cascade_masked_b(cv, with_n_weak=False))
    timeit("cascade_masked", casc, canvases,
           lambda o: o[0][0, 0, 0] + o[2].sum().astype(jnp.float32))

    from waldboost_tpu.ops.cascade_static import cascade_grid
    from waldboost_tpu.ops.nms import extract_detections_masked, nms_device
    Hc, Wc = packed.canvas_h, packed.canvas_w
    TU, TV, gi, gj, _, _ = cascade_grid((Hc, Wc), (m, n))
    level_id_map, inv_scales = packed.level_maps((m, n))
    gu, gv = level_id_map.shape
    lid_pad = np.full((gi * TU, gj * TV), -1, np.int32)
    lid_pad[:gu, :gv] = level_id_map
    lid = jnp.asarray(lid_pad)
    offs = jnp.asarray(
        np.array([(pl.y, pl.x) for pl in packed.levels], np.int32))
    iscales = jnp.asarray(inv_scales)
    wnd = jnp.asarray([m, n], jnp.int32)

    def extract_one(masked, count):
        rects, scores, valid, count = extract_detections_masked(
            masked, count, lid, offs, iscales, wnd, k=256)
        keep = nms_device(rects, scores, valid, iou_threshold=0.5)
        return rects, scores, jnp.logical_and(valid, keep), count

    ext = jax.jit(jax.vmap(extract_one))
    maps = [casc(cv) for cv in canvases]
    _ = float(maps[-1][0][0, 0, 0])
    timeit("extract", lambda mc: ext(mc[0], mc[2]),
           [(m0, n0, c0) for (m0, n0, c0) in maps],
           lambda o: o[0].sum())
    del maps, canvases

    fn, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                        with_n_weak=False)
    timeit("one_program", fn, image_sets,
           lambda o: o[2].sum().astype(jnp.float32) + o[1].sum())
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
