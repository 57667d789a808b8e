"""AUC sweep round 3: quantile-256 hist trainer vs sklearn backend vs the
reference trainer, seeds 14-18 (extends exp_r9_auc.py / exp_r9_auc2.py —
see /tmp/exp_auc.log, /tmp/exp_auc2.log).  Evidence base for VERDICT r2
"Next round" #3 (training-quality parity); numbers recorded in BASELINE.md.

  nohup python scripts/exp_r9_auc3.py > /tmp/exp_auc3.log 2>&1 &
"""

import json
import os
import sys
import time
from itertools import islice

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N_STAGES = int(os.environ.get("PARITY_STAGES", "32"))
N_EVAL = int(os.environ.get("PARITY_EVAL", "200"))
SHAPE = (12, 12, 4)
SEEDS = tuple(int(s) for s in os.environ.get("PARITY_SEEDS",
                                             "14,15,16,17,18").split(","))


def _train_reference(seed):
    for name, val in [("bool", bool), ("int", int), ("float", float)]:
        if name not in np.__dict__:
            setattr(np, name, val)
    for p in (os.path.join(REPO, "tests", "refshims"), "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import waldboost_tpu.proto.model_pb2 as pb2
    sys.modules.setdefault("waldboost.model_pb2", pb2)
    import waldboost as ref

    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator

    def gen():
        for d in fake_data_generator(seed=seed):
            gt = d["groundtruth_boxes"]
            yield dict(image=d["image"],
                       groundtruth_boxes=gt if len(gt) else None)

    rmodel = ref.Model(SHAPE, dict(shrink=2, n_per_oct=4, smooth=1,
                                   channels=ref.channels.grad_hist))
    ref.train(rmodel, gen(), learner=ref.training.Learner(alpha=0.2,
                                                          max_depth=2),
              pool=ref.SamplePool(min_tp=1000, min_fp=1000), length=N_STAGES)
    path = f"/tmp/ref_parity_s{seed}.pb"
    rmodel.save(path)
    return wb.load(path)


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

    for seed in SEEDS:
        arms = [
            ("hist_q256", lambda s=seed: train(s, max_depth=2,
                                               binning="quantile")),
            ("sklearn", lambda s=seed: train(s, max_depth=2,
                                             backend="sklearn")),
            ("reference", lambda s=seed: _train_reference(s)),
        ]
        for label, fn in arms:
            t0 = time.perf_counter()
            model = fn()
            auc = eval_auc(model)
            print(json.dumps({"variant": label, "seed": seed,
                              "auc": round(auc, 4),
                              "s": round(time.perf_counter() - t0, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
