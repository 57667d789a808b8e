"""End-to-end device validation: detections with WB_PLANE_FUSED=1 vs 0.

nohup python scripts/exp_r5_fusedval3.py > /tmp/fusedval3.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    h, w = 480, 640
    B = 4
    model = _flagship_model()

    os.environ["WB_PLANE_FUSED"] = "1"
    fn_f, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                          with_n_weak=False)
    os.environ["WB_PLANE_FUSED"] = "0"
    fn_x, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                          with_n_weak=False)

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (B, h, w)).astype(np.uint8))

    t0 = time.time()
    out_f = jax.tree.map(np.asarray, fn_f(imgs))
    print(f"fused ran [{time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    out_x = jax.tree.map(np.asarray, fn_x(imgs))
    print(f"xla ran [{time.time()-t0:.0f}s]", flush=True)

    leaves_f, treedef = jax.tree.flatten(out_f)
    leaves_x, _ = jax.tree.flatten(out_x)
    ok = True
    for i, (a, b) in enumerate(zip(leaves_f, leaves_x)):
        eq = np.array_equal(a, b)
        print(f"leaf {i} shape={a.shape} dtype={a.dtype} equal={eq}",
              flush=True)
        ok &= eq
    print("RESULT:", "BOXES-IDENTICAL" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
