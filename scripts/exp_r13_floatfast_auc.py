"""Evaluator AUC pricing of the float fast-serving variants.

Companion to exp_r13_floatfast.py (throughput + flip rates): the flip
rate alone over-penalizes threshold-borderline boxes, so — exactly like
the uint8 fast-mode pricing (exp_r11_fast.py) — the quality contract is
the Evaluator AUC on the held-out corpus (fake_data_generator seed 999,
200 images, IoU 0.5) with frames CAST TO FLOAT32, through the same
batched serving path:

  exact      — the dd double-float XLA chain (the float contract)
  fast f32   — WB_SERVING_MODE=fast, f32 planes (default)
  fast bf16  — WB_SERVING_MODE=fast, WB_FAST_FLOAT=bf16 planes

  nohup python scripts/exp_r13_floatfast_auc.py > /tmp/exp_ffauc.log 2>&1 &
"""
import json
import os
import sys
import time
from itertools import islice

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(model, hw, mode, planes=None, k=1024):
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes
    prev_m = os.environ.get("WB_SERVING_MODE")
    prev_p = os.environ.get("WB_FAST_FLOAT")
    os.environ["WB_SERVING_MODE"] = mode
    if planes is not None:
        os.environ["WB_FAST_FLOAT"] = planes
    try:
        fn, _ = make_batched_detector_boxes(model, hw, k=k,
                                            with_n_weak=False)
    finally:
        for key, prev in (("WB_SERVING_MODE", prev_m),
                          ("WB_FAST_FLOAT", prev_p)):
            if prev is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = prev
    return fn


def main():
    import jax.numpy as jnp

    import waldboost_tpu as wb
    from waldboost_tpu.boxes import Boxes, non_max_suppression
    from waldboost_tpu.testing import Evaluator
    from waldboost_tpu.utils import fake_data_generator

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = wb.load(os.path.join(root, "models", "flagship_synth_64.pb"))

    corpus = list(islice(fake_data_generator(seed=999), 200))
    hw = corpus[0]["image"].shape
    fns = {
        "exact": _build(model, hw, "exact"),
        "fast_f32": _build(model, hw, "fast", planes="f32"),
        "fast_bf16": _build(model, hw, "fast", planes="bf16"),
    }
    for label, fn in fns.items():
        ev = Evaluator()
        t0 = time.perf_counter()
        for i0 in range(0, len(corpus), 16):
            chunk = corpus[i0:i0 + 16]
            imgs = jnp.asarray(np.stack([d["image"] for d in chunk])
                               .astype(np.float32))
            rects, scores, valid, _cnt, _ = fn(imgs)
            for b, d in enumerate(chunk):
                v = np.asarray(valid[b])
                bx = Boxes(np.asarray(rects[b])[v],
                           scores=np.asarray(scores[b])[v]
                           .astype(np.float32))
                if len(bx):
                    bx = non_max_suppression(bx, iou_threshold=0.5)
                ev.add_ground_truth(i0 + b, d["groundtruth_boxes"],
                                    d["image"].shape)
                ev.add_detections(i0 + b, bx)
        auc = ev.evaluate()["auc"]
        print(json.dumps({"mode": label, "auc": round(float(auc), 4),
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
