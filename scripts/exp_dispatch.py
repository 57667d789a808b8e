"""Headline dispatch-overhead bisection (VGA full pyramid, batch 96).

The per-op breakdown says the device program costs ~287 us/img (= 1071
MP/s) but end-to-end bench measures ~950-975: ~10% is outside the program.
Inputs are pre-staged on device, so candidates are (a) the per-iteration
`_force` reduce dispatch bench.py adds, (b) per-dispatch enqueue cost
through the axon tunnel, (c) batch-96 program time simply being higher
than the batch-32-derived estimate.

Variants measured (same detector program, same pre-staged inputs):
  two_dispatch  — bench.py today: fn(images) then jitted _force, per iter
  one_dispatch  — fn(images) only; the FIFO is drained once at the end by
                  fetching a scalar reduced from the LAST iteration's
                  outputs (in-order execution forces all predecessors)
  fused_reduce  — the forcing reduce folded INTO the detector jit (one
                  program per iter, no separate _force executable)

Run detached on the TPU:
  nohup python scripts/exp_dispatch.py > /tmp/exp_dispatch.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("DISP_BATCH", "96"))
ITERS = int(os.environ.get("DISP_ITERS", "16"))
WARMUP = 2
H, W = 480, 640


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    model = _flagship_model()
    fn, _ = make_batched_detector_boxes(model, (H, W), k=128, k_row=16,
                                        nms_iou=0.5, with_n_weak=False)

    @jax.jit
    def _force(rects, valid, count):
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    def reduce_all(out):
        rects, scores, valid, count, _ = out
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    body = getattr(fn, "body", None)

    rng = np.random.RandomState(0)
    batches = [
        jnp.asarray(rng.randint(0, 256, (BATCH, H, W)).astype(np.uint8))
        for _ in range(ITERS + WARMUP)
    ]

    def timeit(run, drain):
        out = run(batches[0])
        _ = drain(out)
        for i in range(1, WARMUP):
            out = run(batches[i])
        _ = drain(out)
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = run(batches[(WARMUP + i + rep) % len(batches)])
            _ = drain(last)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return H * W / 1e6 * BATCH * ITERS / best

    # --- two_dispatch (bench.py today) ---
    def run_two(images):
        rects, scores, valid, count, _ = fn(images)
        return _force(rects, valid, count)

    print(f"two_dispatch : {timeit(run_two, float):.1f} MP/s", flush=True)

    # --- one_dispatch: no per-iter reduce; drain via scalar off the last ---
    def drain_last(out):
        rects, scores, valid, count, _ = out
        return float(_force(rects, valid, count))

    print(f"one_dispatch : {timeit(fn, drain_last):.1f} MP/s", flush=True)

    # --- fused_reduce: reduce inside the detector program ---
    if body is not None:
        extra = getattr(fn, "body_args", ())
        fused = jax.jit(lambda im: reduce_all(body(im, *extra)))
        print(f"fused_reduce : {timeit(fused, float):.1f} MP/s", flush=True)
    else:
        print("fused_reduce : skipped (no raw body exposed)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
