"""TPU experiment: per-part costs of the fused masked serving path.

nohup python scripts/exp_fused.py > /tmp/exp_fu.log 2>&1 &

Interleaves variant executions round-robin (the tunnel's throughput drifts
over minutes; consecutive blocks of one variant alias that drift onto the
variant).  Reports ms/image for:
  canvas          — planes + channel kernel program
  casc_nw         — masked cascade kernel, with n_weak accumulation
  casc_nonw       — masked cascade kernel, with_n_weak=False
  extract         — approx_max_k + coords + NMS on the masked map
  full            — the ONE-program serving path (with_n_weak=False)
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
                                               make_batched_detector)
    from waldboost_tpu.ops.cascade_static import cascade_grid
    from waldboost_tpu.ops.nms import extract_detections_masked, nms_device

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    parts = make_batched_detector(model, (h, w), _raw=True)
    canvas_b, _, cascade_masked_b, packed, content_hw = parts
    fused_fn, _ = _make_masked_detector_boxes(model, (h, w), k=256,
                                              nms_iou=0.5, with_n_weak=False)

    Hc, Wc = packed.canvas_h, packed.canvas_w
    TU, TV, gi, gj, _, _ = cascade_grid((Hc, Wc), (m, n))
    level_id_map, inv_scales = packed.level_maps((m, n))
    gu, gv = level_id_map.shape
    lid_pad = np.full((gi * TU, gj * TV), -1, np.int32)
    lid_pad[:gu, :gv] = level_id_map
    offsets = np.array([(pl.y, pl.x) for pl in packed.levels], np.int32)
    lid = jnp.asarray(lid_pad)
    offs = jnp.asarray(offsets)
    iscales = jnp.asarray(inv_scales)
    wnd = jnp.asarray([m, n], jnp.int32)

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]

    canvas_jit = jax.jit(canvas_b)
    casc_nw = jax.jit(lambda cv: cascade_masked_b(cv, with_n_weak=True))
    casc_nonw = jax.jit(lambda cv: cascade_masked_b(cv, with_n_weak=False))

    def extract_one(masked, count):
        rects, scores, valid, count = extract_detections_masked(
            masked, count, lid, offs, iscales, wnd, k=256)
        keep = nms_device(rects, scores, valid, iou_threshold=0.5)
        return rects, scores, jnp.logical_and(valid, keep), count

    extract_jit = jax.jit(jax.vmap(extract_one))

    canvases = [canvas_jit(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])
    mk = [casc_nonw(cv) for cv in canvases]
    _ = float(mk[-1][0][0, 0, 0])

    variants = [
        ("canvas", canvas_jit, image_sets, lambda o: o[0, 0, 0, 0]),
        ("casc_nw", casc_nw, canvases,
         lambda o: o[0][0, 0, 0] + o[2][0].astype(jnp.float32)),
        ("casc_nonw", casc_nonw, canvases,
         lambda o: o[0][0, 0, 0] + o[2][0].astype(jnp.float32)),
        ("extract", lambda mc: extract_jit(mc[0], mc[2]), mk,
         lambda o: o[0].sum()),
        ("full", fused_fn, image_sets,
         lambda o: o[0].sum() + o[3].sum().astype(jnp.float32)),
    ]

    # compile + warm every variant
    for name, fn, inputs, fetch in variants:
        out = fn(inputs[0]); _ = float(fetch(out))
        out = fn(inputs[1]); _ = float(fetch(out))

    totals = {name: 0.0 for name, *_ in variants}
    for i in range(iters):
        for name, fn, inputs, fetch in variants:
            t0 = time.perf_counter()
            out = fn(inputs[warmup + i])
            _ = float(fetch(out))
            totals[name] += time.perf_counter() - t0

    for name, *_ in variants:
        dt = totals[name] / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(dt, 4)}),
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
