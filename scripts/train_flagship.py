"""Train the committed flagship cascade (bench config 6, VERDICT r1 #7).

Trains a 64-stage depth-2 detector on the synthetic dataset with the
HEADLINE channel config (shrink=2, n_per_oct=8, smooth=1, grad_hist) and
writes models/flagship_synth_64.pb — bench.py's trained_cascade config
loads it so the headline throughput claim is also measured under REAL
rejection dynamics, not just the quantile-calibrated synthetic cascade.

  nohup python scripts/train_flagship.py > /tmp/train_flagship.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models", "flagship_synth_64.pb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    gen = fake_data_generator(seed=42)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8, smooth=1,
                                       channels="grad_hist"))
    pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=7)
    t0 = time.perf_counter()
    learner = wb.train(model, gen, pool=pool, length=64,
                       learner=wb.Learner(alpha=0.2, max_depth=2))
    dt = time.perf_counter() - t0
    model.save(out)
    stats = learner.get_stats()
    print(f"trained 64 stages in {dt:.1f}s "
          f"({64 / dt * 60:.1f} stages/min)")
    print("fpr:", stats["false_positive_rate"][-1],
          "tpr:", stats["true_positive_rate"][-1])
    d = next(gen)
    import numpy as np
    img = np.atleast_3d(d["image"])[:, :, 0]
    boxes = model.detect(img)
    print("detect:", len(boxes), "boxes; eval_cost:", model.eval_cost)
    print("saved:", out)


if __name__ == "__main__":
    main()
