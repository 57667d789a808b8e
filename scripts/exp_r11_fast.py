"""Fast serving mode (WB_SERVING_MODE=fast) quantification on TPU.

VERDICT r4 #1: the serving walls are closed AT bit-exactness; fast mode
relaxes it (bf16 channel canvas without the dd-projection tax + bf16
cascade stage chain).  This script prices the trade on the real chip:

  1. throughput: exact vs fast(bf16 scores) vs fast(f32 scores), trained
     flagship, VGA full pyramid, headline batch;
  2. deviation: box flip rate + common-box score deltas vs exact over a
     scene + noise corpus;
  3. quality: Evaluator AUC on the held-out corpus (seed 999, 200 images,
     the exp_r9_auc protocol) through the SAME batched serving path,
     exact vs fast.

  nohup python scripts/exp_r11_fast.py > /tmp/exp_fast.log 2>&1 &
"""

import json
import os
import sys
import time
from itertools import islice

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(model, hw, fast, scores="bf16", k=1024, nms_iou=None, batch=None):
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes
    prev = os.environ.get("WB_SERVING_MODE")
    os.environ["WB_SERVING_MODE"] = "fast" if fast else "exact"
    os.environ["WB_FAST_SCORES"] = scores
    try:
        fn, _ = make_batched_detector_boxes(model, hw, k=k, nms_iou=nms_iou,
                                            with_n_weak=False)
    finally:
        if prev is None:
            os.environ.pop("WB_SERVING_MODE", None)
        else:
            os.environ["WB_SERVING_MODE"] = prev
    return fn


def boxes_of(out, b):
    rects, scores, valid, count, _ = out
    v = np.asarray(valid[b])
    return (np.asarray(rects[b])[v], np.asarray(scores[b])[v],
            int(np.asarray(count[b])))


def main():
    import jax.numpy as jnp

    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator, scene_generator

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = wb.load(os.path.join(root, "models", "flagship_synth_64.pb"))

    # ---- throughput (bench methodology: distinct inputs, FIFO drain) ----
    sys.path.insert(0, root)
    import bench

    batch, iters, warmup, reps = 192, 16, 2, 3
    for label, fast, sc in [("exact", False, "bf16"),
                            ("fast_bf16", True, "bf16"),
                            ("fast_f32", True, "f32")]:
        os.environ["WB_FAST_SCORES"] = sc
        mps = bench._detect_mps(model, 480, 640, batch, iters, warmup,
                                nms_iou=0.5, reps=reps, fast=fast)
        print(json.dumps({"exp": "throughput", "mode": label,
                          "mps": round(mps, 1)}), flush=True)

    # ---- deviation: flips + score deltas on scenes + noise --------------
    rng = np.random.RandomState(7)
    sg = scene_generator(seed=55, hw=(480, 640))
    frames = {
        "scene": np.stack([next(sg)["image"] for _ in range(48)]),
        "noise": rng.randint(0, 256, (48, 480, 640)).astype(np.uint8),
    }
    fn_ex = build(model, (480, 640), fast=False, k=2048)
    fn_fb = build(model, (480, 640), fast=True, scores="bf16", k=2048)
    fn_ff = build(model, (480, 640), fast=True, scores="f32", k=2048)
    for kind, imgs in frames.items():
        for label, fn in [("fast_bf16", fn_fb), ("fast_f32", fn_ff)]:
            ne = nf = flips = 0
            sdifs = []
            for i0 in range(0, len(imgs), 16):
                chunk = jnp.asarray(imgs[i0:i0 + 16])
                oe = fn_ex(chunk)
                of = fn(chunk)
                for b in range(chunk.shape[0]):
                    re_, se, ce = boxes_of(oe, b)
                    rf, sf, cf2 = boxes_of(of, b)
                    ke = {tuple(np.round(x, 2)): s
                          for x, s in zip(re_, se)}
                    kf = {tuple(np.round(x, 2)): s
                          for x, s in zip(rf, sf)}
                    ne += len(ke)
                    nf += len(kf)
                    flips += len(ke.keys() ^ kf.keys())
                    for kk in ke.keys() & kf.keys():
                        sdifs.append(abs(ke[kk] - kf[kk]))
            sd = np.asarray(sdifs) if sdifs else np.zeros(1)
            print(json.dumps({
                "exp": "deviation", "corpus": kind, "mode": label,
                "exact_boxes": ne, "fast_boxes": nf, "box_flips": flips,
                "flip_rate": round(flips / max(ne, 1), 5),
                "score_d_mean": round(float(sd.mean()), 5),
                "score_d_max": round(float(sd.max()), 5)}), flush=True)

    # ---- AUC on the held-out corpus through the same serving path -------
    from waldboost_tpu.testing import Evaluator
    corpus = list(islice(fake_data_generator(seed=999), 200))
    fns = {"exact": build(model, (256, 256), fast=False, k=1024),
           "fast_bf16": build(model, (256, 256), fast=True, scores="bf16",
                              k=1024),
           "fast_f32": build(model, (256, 256), fast=True, scores="f32",
                             k=1024)}
    from waldboost_tpu.boxes import Boxes, non_max_suppression
    for label, fn in fns.items():
        ev = Evaluator()
        t0 = time.perf_counter()
        for i0 in range(0, len(corpus), 16):
            chunk = corpus[i0:i0 + 16]
            out = fn(jnp.asarray(np.stack([d["image"] for d in chunk])))
            for b, d in enumerate(chunk):
                r, s, c = boxes_of(out, b)
                bx = Boxes(r, scores=s.astype(np.float32))
                if len(bx):
                    bx = non_max_suppression(bx, iou_threshold=0.5)
                ev.add_ground_truth(i0 + b, d["groundtruth_boxes"],
                                    d["image"].shape)
                ev.add_detections(i0 + b, bx)
        auc = ev.evaluate()["auc"]
        print(json.dumps({"exp": "auc", "mode": label,
                          "auc": round(float(auc), 4),
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
