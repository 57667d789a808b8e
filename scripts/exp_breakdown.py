"""TPU breakdown of the ACTUAL fused headline path, program by program.

nohup python scripts/exp_breakdown.py > /tmp/exp_bd.log 2>&1 &

Times each jitted program of make_batched_detector_boxes separately with
distinct precomputed inputs (axon dedupes identical executions; FIFO-drain
timing by fetching a scalar from the last result).
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

    canvas_jit, cascade_jit, packed, content_hw = make_batched_detector(
        model, (h, w), _parts=True)

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]

    def timeit(name, fn, inputs, fetch):
        out = fn(inputs[0]); _ = float(fetch(out))
        for i in range(1, warmup):
            out = fn(inputs[i])
        _ = float(fetch(out))
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(inputs[warmup + i])
        _ = float(fetch(last))
        dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(dt, 4)}),
              flush=True)

    # program 1: planes + fused channel kernel
    timeit("canvas_program", canvas_jit, image_sets,
           lambda cv: cv[0, 0, 0, 0])

    canvases = [canvas_jit(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])

    # program 2: cascade-specialized kernel
    timeit("cascade_program", cascade_jit, canvases,
           lambda out: out[2].sum().astype(jnp.float32))

    # program 3: extraction + NMS on precomputed (hs, alive)
    from waldboost_tpu.ops.nms import extract_detections_approx, nms_device
    level_id_map, inv_scales = packed.level_maps((m, n))
    offsets = np.array([(pl.y, pl.x) for pl in packed.levels], np.int32)
    lid = jnp.asarray(level_id_map)
    offs = jnp.asarray(offsets)
    iscales = jnp.asarray(inv_scales)
    wnd = jnp.asarray([m, n], jnp.int32)

    def extract_one(hs, alive):
        rects, scores, valid, count = extract_detections_approx(
            hs, alive, lid, offs, iscales, wnd, k=256)
        keep = nms_device(rects, scores, valid, iou_threshold=0.5)
        return rects, scores, jnp.logical_and(valid, keep), count

    extract_b = jax.jit(jax.vmap(extract_one))
    maps = [cascade_jit(cv)[:2] for cv in canvases]
    _ = float(maps[-1][0][0, 0, 0])
    timeit("extract_program", lambda ha: extract_b(*ha), maps,
           lambda out: out[0].sum())

    # end-to-end for reference
    def full(ims):
        hs, alive, nw = cascade_jit(canvas_jit(ims))
        return extract_b(hs, alive)

    timeit("full_chain", full, image_sets, lambda out: out[0].sum())
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
