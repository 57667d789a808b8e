"""TPU profiling worker: per-phase breakdown of the CURRENT serving pipeline.

Run detached (compiles are nondeterministically slow through the axon
tunnel):  nohup python scripts/profile_tpu.py > /tmp/prof.log 2>&1 &

Phases measured cumulatively (subtract consecutive lines for per-phase):
  1. planes        — polyphase plane assembly (resize einsums + concat)
  2. +channels     — fused channel kernel on top
  3. +cascade      — cascade-specialized kernel on top (full pipeline)
  4. +extract      — on-device box extraction + NMS (the headline bench path)

Also prints the per-stage survivor histogram of the flagship cascade on the
bench workload (sizes the two-phase prefix/capacity).

Timing per CLAUDE.md rules: distinct inputs per call (the runtime dedupes
identical executions), FIFO-drain timing by fetching one scalar from the
last result.
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
    from waldboost_tpu.model import (_packed_plan_cached, _poly_planes,
                                     _poly_pad_geometry)
    from waldboost_tpu.parallel.detect import (make_batched_detector,
                                               make_batched_detector_boxes)

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2

    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)

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
        print(json.dumps({"name": name, "ms_per_image": round(ms_img, 4),
                          "mps": round(h * w / 1e6 / (ms_img / 1e3), 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms_img

    # ---- phase 1: plane assembly ------------------------------------------
    geom = _poly_pad_geometry(cf, packed)

    def planes_b(images):
        return jax.vmap(lambda im: _poly_planes(im, cf, packed, geom=geom))(
            images)

    timeit("planes", jax.jit(
        lambda ims: planes_b(ims)[:, 0, 0, 0, :8].astype(jnp.float32).sum()))

    # ---- phase 2: + channel kernel ----------------------------------------
    interior = jnp.asarray(packed.smooth_interior_mask())
    Hc, Wc = packed.canvas_h, packed.canvas_w

    def chans_b(images):
        planes = planes_b(images)
        return cf.poly_kernel(planes, interior, smooth, False,
                              content_hw=(Hc, Wc))

    timeit("planes+channels",
           jax.jit(lambda ims: chans_b(ims)[:, 0, 0, :8].sum()))

    # ---- phase 3: + cascade (full fused pipeline) --------------------------
    fn_det, _ = make_batched_detector(model, (h, w))
    timeit("planes+channels+cascade",
           lambda ims: fn_det(ims)[2].sum().astype(jnp.float32))

    # ---- phase 4: + extraction + NMS (headline path) ------------------------
    fn_box, _ = make_batched_detector_boxes(model, (h, w), k=256, k_row=16,
                                            nms_iou=0.5)

    def run_boxes(ims):
        rects, scores, valid, count, n_weak = fn_box(ims)
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + n_weak.sum().astype(jnp.float32))

    timeit("full+extract", run_boxes)

    # ---- survivor depth histogram -------------------------------------------
    from waldboost_tpu.ops.cascade import cascade_response_grid, slice_cascade
    casc, meta = model._get_cascade()
    valid = jnp.asarray(packed.valid_mask((m, n)))
    img = jnp.asarray(rng.randint(0, 256, (1, h, w)).astype(np.uint8))

    def canvas_one(ims):
        planes = planes_b(ims)
        return cf.poly_kernel(planes, interior, smooth, False,
                              content_hw=(Hc, Wc))

    cvs = jax.jit(canvas_one)(img)[0]
    counts = {}
    for T in (4, 6, 8, 10, 12, 16, 24, 32, 48, 64):
        cc = slice_cascade(casc, 0, T)
        _, alive, _ = jax.jit(
            lambda cv: cascade_response_grid(cv, cc, (m, n),
                                             meta, init_alive=valid))(cvs)
        counts[T] = int(np.asarray(alive).sum())
    print(json.dumps({"survivors_after_T_stages": counts,
                      "grid": int(valid.size),
                      "valid": int(np.asarray(valid).sum())}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
