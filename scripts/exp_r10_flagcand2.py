"""Round-4 flagship candidate: same recipe as train_flagship.py but a
2.5x bigger sample pool (2500/2500) — the MXU histogram trainer made pool
size cheap.  Swap the committed flagship ONLY if held-out AUC and noise
eval_cost both improve.

MEASURED OUTCOME (2026-08-21): the bigger pool LOST on both axes —
held-out AUC 0.8649 vs the committed flagship's 0.9027, noise eval_cost
1.394 vs 1.224 (re-measured same run).  With 2.5x the negatives per
stage the SPRT thetas turn conservative early (harder negatives survive
the mining filter longer), which costs rejection speed AND ranking on
this corpus.  Committed flagship retained; pool size is not the lever.

nohup python scripts/exp_r10_flagcand2.py > /tmp/flagcand2.log 2>&1 &
"""
import json
import os
import sys
import time
from itertools import islice

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_flagship import noisy_scene_generator  # noqa: E402 (scripts/)


def evaluate(model, tag):
    from waldboost_tpu.testing import evaluate_model
    from waldboost_tpu.utils import fake_data_generator

    corpus = list(islice(fake_data_generator(seed=999), 200))
    auc = evaluate_model(corpus, model).evaluate()["auc"]
    # noise eval_cost (the bench input distribution)
    rng = np.random.RandomState(3)
    model.reset()
    for _ in range(4):
        model.detect(rng.randint(0, 256, (480, 640)).astype(np.uint8))
    print(json.dumps({"tag": tag, "auc": round(auc, 4),
                      "noise_eval_cost": round(model.eval_cost, 3),
                      "worst_eval_cost": round(model.worst_eval_cost, 3)}),
          flush=True)
    return auc, model.eval_cost


def main():
    import waldboost_tpu as wb

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = wb.load(os.path.join(repo, "models", "flagship_synth_64.pb"))
    evaluate(base, "committed")

    gen = noisy_scene_generator(seed=42, bg_every=2)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8, smooth=1,
                                       channels="grad_hist"))
    pool = wb.SamplePool(min_tp=2500, min_fp=2500, seed=7)
    t0 = time.perf_counter()
    wb.train(model, gen, pool=pool, length=64,
             learner=wb.Learner(alpha=0.3, max_depth=2))
    print(f"candidate trained in {time.perf_counter() - t0:.0f}s",
          flush=True)
    model.save("/tmp/flagship_cand2500.pb")
    evaluate(model, "pool2500")


if __name__ == "__main__":
    main()
