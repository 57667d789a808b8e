"""TPU validation of the fused FPGA channel kernel (round 6).

Smallest instance first (wedge safety), then e2e boxes at VGA-ish size,
then the 4K headline config timing.

nohup python scripts/exp_r6_fpga.py > /tmp/r6_fpga.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from waldboost_tpu import model as M
    from waldboost_tpu.channels import _normalize_opts

    print("devices:", jax.devices(), flush=True)

    # --- step 1: smallest kernel instance, bitwise vs XLA ---
    for hw in [(48, 64), (240, 320)]:
        opts = dict(shrink=2, n_per_oct=2 if hw[0] < 100 else 4, smooth=0,
                    channels="grad_hist_4_u1")
        shrink, n_per_oct, sm, cf = _normalize_opts(opts)
        packed = M._packed_plan_cached(*hw, shrink, n_per_oct, (12, 12),
                                       halo=cf.halo)
        img = jnp.asarray(np.random.RandomState(3)
                          .randint(0, 256, hw).astype(np.uint8))
        M.set_channel_backend("xla")
        ref = np.asarray(M._channel_canvas_poly(img, sm, cf, packed))
        M.set_channel_backend("pallas")
        ker = np.asarray(M._channel_canvas_poly(img, sm, cf, packed))
        M.set_channel_backend("auto")
        eq = np.array_equal(ref, ker)
        print(f"kernel {hw}: {'bitwise' if eq else 'MISMATCH'}", flush=True)
        if not eq:
            d = np.abs(ref - ker)
            print("  maxdiff", d.max(), "n", (ref != ker).sum(), flush=True)
            return

    # --- step 2: e2e boxes, fused serving vs XLA channels ---
    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    opts = dict(shrink=2, n_per_oct=4, smooth=0, channels="grad_hist_4_u1")
    model = _flagship_model(channel_opts=opts, image_hw=(240, 320))
    h, w = 480, 640
    imgs = jnp.asarray(np.random.RandomState(0)
                       .randint(0, 256, (4, h, w)).astype(np.uint8))
    M.set_channel_backend("xla")
    fn, _ = make_batched_detector_boxes(model, (h, w), k=128,
                                        nms_iou=None, with_n_weak=False)
    ref = [np.asarray(x) for x in fn(imgs)]
    M.set_channel_backend("pallas")
    fn2, _ = make_batched_detector_boxes(model, (h, w), k=128,
                                         nms_iou=None, with_n_weak=False)
    got = [np.asarray(x) for x in fn2(imgs)]
    M.set_channel_backend("auto")
    ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
    print(f"e2e VGA boxes: {'bitwise' if ok else 'MISMATCH'}; counts",
          ref[3], flush=True)
    if not ok:
        for a, b, nm in zip(ref, got, ["rects", "scores", "valid", "count",
                                       "nweak"]):
            if not np.array_equal(a, b):
                print("  field", nm, "differs", flush=True)
        return

    # --- step 3: 4K timing, old vs new path ---
    os.environ["BENCH_CONFIGS"] = "fpga_4k_quantized_throughput"
    import bench
    t0 = time.time()
    print("4K fused:", bench.bench_fpga_4k(8, 8, 2), "MP/s", flush=True)
    print("  (%.0f s incl compile)" % (time.time() - t0), flush=True)
    M.set_channel_backend("xla")
    print("4K xla-chan:", bench.bench_fpga_4k(8, 8, 2), "MP/s", flush=True)
    M.set_channel_backend("auto")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
