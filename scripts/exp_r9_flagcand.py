"""Flagship trained-cascade candidates: rejection-shaping levers vs AUC.

Trains 64-stage flagship variants (scripts/train_flagship.py recipe) on
CPU with different quality/rejection levers, evaluates each on a held-out
synthetic corpus, and saves them under /tmp/flagcand_*.pb for TPU speed
benching (scripts/exp_r9_flagbench.py).  Levers:

  - binning: quantile vs uniform histogram splits (BASELINE.md AUC table)
  - alpha:   SPRT error bound — larger rejects earlier (speed) at a
             bounded miss cost (/root/reference/waldboost/training.py:191)
  - bg_every: noise-background mixing ratio (commit 40dc3ca)

  nohup python scripts/exp_r9_flagcand.py > /tmp/exp_flagcand.log 2>&1 &
"""

import json
import os
import sys
import time
from itertools import islice

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_platforms", "cpu")

N_EVAL = int(os.environ.get("FLAG_EVAL", "200"))
LENGTH = int(os.environ.get("FLAG_LENGTH", "64"))


def main():
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "scripts"))

    import waldboost_tpu as wb
    from waldboost_tpu.testing import evaluate_model
    from waldboost_tpu.utils import fake_data_generator
    from train_flagship import noisy_scene_generator

    corpus = list(islice(fake_data_generator(seed=999), N_EVAL))

    sets = {
        "1": [
            ("committed", None),  # models/flagship_synth_64.pb as-is
            ("q_a20_bg3", dict(binning="quantile", alpha=0.2, bg_every=3)),
            ("q_a30_bg3", dict(binning="quantile", alpha=0.3, bg_every=3)),
            ("q_a20_bg2", dict(binning="quantile", alpha=0.2, bg_every=2)),
            ("u_a30_bg3", dict(binning="uniform", alpha=0.3, bg_every=3)),
        ],
        # round 2: combine the round-1 winners (alpha=0.3 lifted BOTH AUC
        # and rejection; bg_every=2 nearly halved noise eval_cost)
        "2": [
            ("u_a30_bg2", dict(binning="uniform", alpha=0.3, bg_every=2)),
            ("q_a30_bg2", dict(binning="quantile", alpha=0.3, bg_every=2)),
            ("u_a40_bg2", dict(binning="uniform", alpha=0.4, bg_every=2)),
            ("u_a40_bg3", dict(binning="uniform", alpha=0.4, bg_every=3)),
        ],
    }
    cands = sets[os.environ.get("FLAG_SET", "1")]
    for name, kw in cands:
        t0 = time.perf_counter()
        if kw is None:
            model = wb.load(os.path.join(REPO, "models",
                                         "flagship_synth_64.pb"))
        else:
            gen = noisy_scene_generator(seed=42, bg_every=kw["bg_every"])
            model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8,
                                               smooth=1,
                                               channels="grad_hist"))
            pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=7)
            wb.train(model, gen, pool=pool, length=LENGTH,
                     learner=wb.Learner(alpha=kw["alpha"], max_depth=2,
                                        binning=kw["binning"]))
            model.save(f"/tmp/flagcand_{name}.pb")
        res = evaluate_model(corpus, model).evaluate()
        # rejection profile on a noise probe (serving speed proxy): mean
        # surviving stages per window on a 256x256 uniform-noise frame
        rng = np.random.RandomState(5)
        probe = rng.randint(0, 256, (256, 256)).astype(np.uint8)
        model.n_weak = model.n_loc = 0
        model.detect(probe)
        cost_noise = float(model.eval_cost)
        model.n_weak = model.n_loc = 0
        model.detect(np.atleast_3d(corpus[0]["image"])[:, :, 0])
        cost_scene = float(model.eval_cost)
        print(json.dumps({"cand": name, "auc": round(res["auc"], 4),
                          "eval_cost_noise": round(cost_noise, 3),
                          "eval_cost_scene": round(cost_scene, 3),
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
