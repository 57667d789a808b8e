"""Measure the CNN verifier's quality uplift (VERDICT r3 #6).

The reference's verifier exists to improve precision
(/root/reference/waldboost/verification.py:85-105) but ships no number.
Protocol (the exp_r9_auc protocol, verifier arm):

1. Train a detector on the synthetic stream (seed 11; same config as the
   AUC-parity study: 12x12x4 grad_hist shrink2/npo4/smooth1, alpha=0.2
   depth-2, 1000/1000 quotas, 32 stages).
2. Train the CNN verifier on the final pool's TP/FP crops (the survivors
   of the trained cascade — exactly the verifier's serving distribution).
3. Evaluate on the held-out corpus (seed 999, 200 images, IoU 0.5):
   Evaluator AUC of raw detections vs CNN-verified detections.

Run: python scripts/exp_r10_verifier.py [--stages 32] [--eval 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def auc_of(ev):
    return ev.evaluate()["auc"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, default=32)
    ap.add_argument("--eval", type=int, default=200)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    from itertools import islice

    import waldboost_tpu as wb
    from waldboost_tpu import verification
    from waldboost_tpu.testing import Evaluator, evaluate_model
    from waldboost_tpu.utils import fake_data_generator

    t0 = time.perf_counter()
    gen = fake_data_generator(seed=args.seed)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=0)
    wb.train(model, gen, pool=pool, length=args.stages,
             learner=wb.Learner(alpha=0.2, max_depth=2))
    print(f"detector trained: {len(model)} stages "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # verifier training data: the final pool's survivors
    X0, H0 = pool.get_false_positives()
    X1, H1 = pool.get_true_positives()
    print(f"verifier data: {len(X0)} FP, {len(X1)} TP", flush=True)
    module, params = verification.init_verifier(model.shape, seed=0)
    params = verification.train(module, params, X0, H0, X1, H1,
                                epochs=args.epochs, steps=args.steps,
                                verbose=True)

    corpus = list(islice(fake_data_generator(seed=999), args.eval))

    ev_base = evaluate_model(corpus, model)
    auc_base = auc_of(ev_base)
    print(f"baseline AUC: {auc_base:.4f}", flush=True)

    ev_ver = Evaluator()
    for i, d in enumerate(corpus, 1):
        dt = verification.detect_and_verify(d["image"], model, module,
                                            params)
        ev_ver.add_ground_truth(i, d["groundtruth_boxes"],
                                d["image"].shape)
        ev_ver.add_detections(i, dt)
    auc_ver = auc_of(ev_ver)
    print(f"verified AUC: {auc_ver:.4f}", flush=True)

    print(json.dumps({
        "stages": args.stages, "eval_images": args.eval,
        "seed": args.seed,
        "auc_base": round(auc_base, 4),
        "auc_verified": round(auc_ver, 4),
        "uplift": round(auc_ver - auc_base, 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
