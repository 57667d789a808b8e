"""AUC-gap diagnosis: hist-splitter variants vs sklearn/reference trainers.

train_auc_parity.py measured hist 0.728 / sklearn 0.789 / reference 0.805
(seed 11, 32 stages).  Hypotheses: (a) seed noise, (b) uniform-bin-grid
granularity (outliers stretch [fmin, fmax]; sklearn splits exactly).
Sweeps training seeds x n_bins on CPU.

  nohup env PARITY_CPU=1 python scripts/exp_r9_auc.py > /tmp/exp_auc.log 2>&1 &
"""

import json
import os
import sys
import time
from itertools import islice

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N_STAGES = int(os.environ.get("PARITY_STAGES", "32"))
N_EVAL = int(os.environ.get("PARITY_EVAL", "200"))
SHAPE = (12, 12, 4)


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.testing import evaluate_model
    from waldboost_tpu.utils import fake_data_generator

    corpus = list(islice(fake_data_generator(seed=999), N_EVAL))

    def eval_auc(model):
        return evaluate_model(corpus, model).evaluate()["auc"]

    def train(seed, **kw):
        gen = fake_data_generator(seed=seed)
        model = wb.Model(SHAPE, dict(shrink=2, n_per_oct=4, smooth=1,
                                     channels=wb.channels.grad_hist))
        pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=0)
        wb.train(model, gen, pool=pool,
                 learner=wb.Learner(alpha=0.2, **kw), length=N_STAGES)
        return model

    for seed in (11, 12, 13):
        for label, kw in [("hist_b256", dict(max_depth=2)),
                          ("hist_b1024", dict(max_depth=2, n_bins=1024)),
                          ("hist_b4096", dict(max_depth=2, n_bins=4096)),
                          ("sklearn", dict(max_depth=2, backend="sklearn"))]:
            t0 = time.perf_counter()
            model = train(seed, **kw)
            auc = eval_auc(model)
            print(json.dumps({"variant": label, "seed": seed,
                              "auc": round(auc, 4),
                              "s": round(time.perf_counter() - t0, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
