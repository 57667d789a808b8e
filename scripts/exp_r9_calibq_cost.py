"""Operating-point check for the calib-q headline sweep (CPU side).

exp_r9_calibq.py sweeps the synthetic flagship's survivor-quantile q on
TPU for throughput; this companion verifies each q's OPERATING POINT so a
faster calibration stays honest: eval_cost (mean weak evaluations per
window, the reference's cascade-cost diagnostic,
/root/reference/waldboost/model.py:69-89) must stay in the 2-5 band that
really-trained detectors occupy, and survivor depth must vary with q.

MEASURED OUTCOME (recorded per ADVICE r3): the synthetic random-tree
cascade detects ZERO boxes on scenes at EVERY q in 0.35-0.60 (only the
trained anchor detects; random trees have no signal to fire on), so the
box-count column discriminates nothing between candidates — the q=0.6
default choice rests on (a) eval_cost staying inside the 2-5 trained
band on scenes and (b) noise eval_cost varying smoothly with q (deeper
tails at higher q = later rejection = the diagnostic still exercises the
full cascade depth).  Reports, per q: eval_cost on a uniform-noise frame
(the bench workload), eval_cost + box count on synthetic scenes, and the
committed trained flagship (commit 40dc3ca) as the reality anchor.

  XLA_FLAGS=--xla_force_host_platform_device_count=1 \
      python scripts/exp_r9_calibq_cost.py
"""

import json
import os
import sys
from itertools import islice

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_platforms", "cpu")


def costs(model, scenes):
    import numpy as np

    rng = np.random.RandomState(5)
    probe = rng.randint(0, 256, (480, 640)).astype(np.uint8)
    model.n_weak = model.n_loc = 0
    model.detect(probe)
    cost_noise = float(model.eval_cost)
    model.n_weak = model.n_loc = 0
    boxes = 0
    for d in scenes:
        img = np.atleast_3d(d["image"])[:, :, 0]
        boxes += len(model.detect(img))
    return cost_noise, float(model.eval_cost), boxes / len(scenes)


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator
    from __graft_entry__ import _flagship_model

    scenes = list(islice(fake_data_generator(seed=999), 8))

    trained = wb.load(os.path.join(REPO, "models", "flagship_synth_64.pb"))
    cn, cs, bx = costs(trained, scenes)
    print(json.dumps({"cand": "trained_committed",
                      "eval_cost_noise": round(cn, 3),
                      "eval_cost_scene": round(cs, 3),
                      "boxes_per_scene": round(bx, 1)}), flush=True)

    for q in (0.35, 0.42, 0.50, 0.60):
        model = _flagship_model(calib_q=q)
        cn, cs, bx = costs(model, scenes)
        print(json.dumps({"cand": f"synth_q{q:.2f}",
                          "eval_cost_noise": round(cn, 3),
                          "eval_cost_scene": round(cs, 3),
                          "boxes_per_scene": round(bx, 1)}), flush=True)


if __name__ == "__main__":
    main()
