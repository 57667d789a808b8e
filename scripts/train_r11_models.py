"""Round-5 model training: the 256-stage deep cascade + the hard-synthetic
flagship (VERDICT r4 #8 and #3).

1. models/flagship_synth_256.pb — the flagship recipe (quantile binning,
   alpha=0.3, background frames every 2nd record) trained to 256 stages
   with the device-pool trainer; confirms tile-exit SPRT scaling on a
   REALLY-trained deep cascade (the r7 depth sweep used synthetics).
2. models/flagship_hard_64.pb — 64 stages on the HARDER synthetic
   distribution (utils.scene_generator: 3 octaves of object scale,
   variable aspect, ignore-flagged instances, textured clutter) mixed
   with background frames; evaluated with the full Evaluator
   (ignore/min-area machinery exercised end-to-end).

Both get held-out Evaluator AUC + eval_cost records printed as JSON.

  nohup python scripts/train_r11_models.py > /tmp/train_r11.log 2>&1 &
"""

import json
import os
import sys
import time
from itertools import islice

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def hard_scene_stream(seed=None, bg_every=3):
    """scene_generator records interleaved with background frames (the
    flagship rationale: rejection must cover out-of-distribution texture;
    scripts/train_flagship.py)."""
    from waldboost_tpu import groundtruth
    from waldboost_tpu.boxes import Boxes
    from waldboost_tpu.utils import scene_generator

    scenes = scene_generator(seed=seed, hw=(256, 256))
    rng = np.random.RandomState(None if seed is None else seed + 1)
    empty = Boxes(np.zeros((0, 4), np.float32),
                  ignore=np.zeros(0, np.int32))
    while True:
        for _ in range(bg_every - 1):
            yield next(scenes)
        img = rng.randint(0, 256, (256, 256)).astype(np.uint8)
        yield dict(image=img, groundtruth_boxes=empty)


def eval_auc(model, corpus):
    from waldboost_tpu.testing import evaluate_model
    return float(evaluate_model(corpus, model).evaluate()["auc"])


def cost_on(model, frames):
    model.reset()
    for f in frames:
        model.detect(f)
    return model.eval_cost


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.io import prefetch_iterable
    from waldboost_tpu.parallel.trainer import train_sharded
    from waldboost_tpu.utils import fake_data_generator, scene_generator

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mdir = os.path.join(root, "models")

    # ---- 1. deep 256-stage cascade -----------------------------------
    # Trained on the HARD distribution with a 4x pool: on the easy stream
    # cumulative fpr hits 5e-6 by ~stage 60 and the remaining stages are
    # pure boosting on a frozen 1k pool — measured DEGENERATE
    # (flagship_synth_256 first pass: held-out AUC 0.578 vs 0.903 for 64
    # stages, eval_cost 5.95 noise / 25.9 scenes).  The hard stream keeps
    # informative negatives alive far deeper.
    deep_name = "flagship_hard_256"
    deep_path = os.path.join(mdir, deep_name + ".pb")
    if os.path.exists(deep_path):
        model = wb.load(deep_path)  # resumable: trained in a prior run
        print(json.dumps({"model": deep_name, "resumed": True}), flush=True)
    else:
        gen = prefetch_iterable(hard_scene_stream(seed=42, bg_every=2),
                                depth=32)
        model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8, smooth=1,
                                           channels="grad_hist"))
        learner = wb.Learner(alpha=0.3, max_depth=2)
        t0 = time.perf_counter()
        train_sharded(model, gen, mesh=None, learner=learner, length=256,
                      min_tp=4000, min_fp=4000, seed=7)
        dt = time.perf_counter() - t0
        model.save(deep_path)
        print(json.dumps({"model": deep_name,
                          "train_s": round(dt, 1),
                          "stages_per_min": round(256 / dt * 60, 1),
                          "fpr": float(learner.false_positive_rate)}),
              flush=True)
    rng = np.random.RandomState(0)
    noise = [rng.randint(0, 256, (480, 640)).astype(np.uint8)
             for _ in range(8)]
    sg = scene_generator(seed=100, hw=(480, 640))
    scenes = [next(sg)["image"] for _ in range(8)]
    hard_corpus = list(islice(scene_generator(seed=777, hw=(256, 256)), 200))
    print(json.dumps({"model": deep_name,
                      "eval_cost_noise": round(cost_on(model, noise), 3),
                      "eval_cost_scene": round(cost_on(model, scenes), 3),
                      "auc_hard_heldout": round(
                          eval_auc(model, hard_corpus), 4)}),
          flush=True)

    # ---- 2. hard-synthetic flagship ----------------------------------
    hard_path = os.path.join(mdir, "flagship_hard_64.pb")
    if os.path.exists(hard_path):
        model2 = wb.load(hard_path)
        learner2 = wb.Learner(alpha=0.3, max_depth=2)
        dt = 0.0
        print(json.dumps({"model": "flagship_hard_64", "resumed": True}),
              flush=True)
    else:
        gen2 = prefetch_iterable(hard_scene_stream(seed=51, bg_every=3),
                                 depth=32)
        model2 = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8, smooth=1,
                                            channels="grad_hist"))
        learner2 = wb.Learner(alpha=0.3, max_depth=2)
        t0 = time.perf_counter()
        train_sharded(model2, gen2, mesh=None, learner=learner2, length=64,
                      min_tp=1000, min_fp=1000, seed=8)
        dt = time.perf_counter() - t0
        model2.save(hard_path)
    print(json.dumps({"model": "flagship_hard_64", "train_s": round(dt, 1),
                      "auc_hard_heldout": round(
                          eval_auc(model2, hard_corpus), 4),
                      "eval_cost_noise": round(cost_on(model2, noise), 3),
                      "eval_cost_scene": round(cost_on(model2, scenes), 3)}),
          flush=True)
    # the ORIGINAL flagship on the hard corpus (distribution-shift context)
    old = wb.load(os.path.join(mdir, "flagship_synth_64.pb"))
    print(json.dumps({"model": "flagship_synth_64",
                      "auc_hard_heldout": round(
                          eval_auc(old, hard_corpus), 4)}), flush=True)

    # ---- 3. headline-config throughput of both new models ------------
    sys.path.insert(0, root)
    import bench
    for label, path in [(deep_name, deep_path),
                        ("flagship_hard_64", hard_path)]:
        m = wb.load(path)
        mps = bench._detect_mps(m, 480, 640, 192, 16, 2, nms_iou=0.5,
                                reps=3)
        mps_scene = bench._detect_mps(m, 480, 640, 192, 16, 2, nms_iou=0.5,
                                      reps=3, frames=bench._scene_frames())
        print(json.dumps({"model": label, "mps_noise": round(mps, 1),
                          "mps_scene": round(mps_scene, 1)}), flush=True)


if __name__ == "__main__":
    main()
