"""Device cost of the exact float-image path (VERDICT r4 #5 'measuring
the device cost').

Float images route through dd (double-float) chains: HIGHEST-precision
corner selection + dd two-pass resize lerp, dd [1,2,1] prefilters, dd
projection stores.  This measures VGA batched-detection throughput on
float32 frames vs the uint8 exact path (same trained flagship), pricing
the float contract.

  nohup python scripts/exp_r12_floatcost.py > /tmp/exp_floatcost.log 2>&1 &
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import waldboost_tpu as wb
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = wb.load(os.path.join(root, "models", "flagship_synth_64.pb"))
    sys.path.insert(0, root)
    import bench

    batch, iters, warmup, reps = 96, 16, 2, 3
    fn, _ = make_batched_detector_boxes(model, (480, 640), k=128,
                                        nms_iou=0.5, with_n_weak=False)

    @jax.jit
    def _force(rects, valid, count):
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    def run(images):
        rects, scores, valid, count, _ = fn(images)
        return _force(rects, valid, count)

    rng = np.random.RandomState(0)
    for kind in ("uint8", "float32"):
        batches = []
        for _ in range(iters * reps + warmup):
            x = rng.randint(0, 256, (batch, 480, 640))
            batches.append(jnp.asarray(
                x.astype(np.uint8) if kind == "uint8"
                else x.astype(np.float32)))
        dt = bench._timeit(run, batches, iters, warmup, reps=reps)
        mps = 480 * 640 / 1e6 * batch * iters / dt
        print(json.dumps({"input": kind, "mps": round(mps, 1)}), flush=True)


if __name__ == "__main__":
    main()
