"""Per-phase breakdown of the training loop (BASELINE config 4).

Times each stage's phases — pool rescore+prune, mining (device scans vs
host labeling), sample copy-out, tree fit + SPRT — and prints a table plus
stages/min.  Run detached on the TPU:

  nohup python scripts/profile_train.py > /tmp/train_prof.log 2>&1 &
"""

import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STAGES = int(os.environ.get("PROF_STAGES", "12"))
WARMUP = int(os.environ.get("PROF_WARMUP", "2"))
MINE_BATCH = int(os.environ.get("PROF_MINE_BATCH", "8"))
PREFETCH = int(os.environ.get("PROF_PREFETCH", "16"))


def main():
    import waldboost_tpu as wb
    from waldboost_tpu import samples as S
    from waldboost_tpu.utils import fake_data_generator

    t_phase = defaultdict(float)
    counts = defaultdict(int)

    # wrap the pool's phases with timers
    class TimedPool(wb.SamplePool):
        def update_scores(self, model):
            t0 = time.perf_counter()
            super().update_scores(model)
            t_phase["rescore"] += time.perf_counter() - t0

        def remove_low_scoring(self, min_score=-np.inf):
            t0 = time.perf_counter()
            super().remove_low_scoring(min_score)
            t_phase["prune"] += time.perf_counter() - t0

    orig_scan = wb.Model.scan_packed_batch

    def timed_scan(self, images, n_real=None):
        t0 = time.perf_counter()
        out = orig_scan(self, images, n_real=n_real)
        t_phase["mine_scan"] += time.perf_counter() - t0
        counts["mine_images"] += (n_real if n_real is not None
                                  else len(images))
        return out

    wb.Model.scan_packed_batch = timed_scan

    orig_upd = TimedPool.update

    def timed_update(self, model, it):
        t0 = time.perf_counter()
        orig_upd(self, model, it)
        t_phase["pool_update_total"] += time.perf_counter() - t0

    TimedPool.update = timed_update

    orig_fit = wb.Learner.fit_stage

    def timed_fit(self, model, X0, H0, X1, H1, theta=None):
        t0 = time.perf_counter()
        out = orig_fit(self, model, X0, H0, X1, H1, theta=theta)
        t_phase["fit_stage"] += time.perf_counter() - t0
        return out

    wb.Learner.fit_stage = timed_fit

    gen = fake_data_generator(seed=11)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    pool = TimedPool(min_tp=1000, min_fp=1000, seed=0,
                     mine_batch=MINE_BATCH)
    learner = wb.Learner(alpha=0.2, max_depth=2)
    # stage 0-1 pay compilation; then time the steady state
    wb.train(model, gen, pool=pool, learner=learner, length=WARMUP,
             prefetch=PREFETCH)
    for k in list(t_phase):
        t_phase[k] = 0.0
    counts.clear()
    t0 = time.perf_counter()
    wb.train(model, gen, pool=pool, learner=learner,
             length=WARMUP + N_STAGES, prefetch=PREFETCH)
    dt = time.perf_counter() - t0
    print(f"mine_batch={MINE_BATCH} prefetch={PREFETCH}")
    print(f"{N_STAGES} stages in {dt:.2f}s -> "
          f"{N_STAGES / dt * 60:.1f} stages/min")
    other = dt - t_phase["pool_update_total"] - t_phase["fit_stage"]
    mine_host = (t_phase["pool_update_total"] - t_phase["rescore"]
                 - t_phase["prune"] - t_phase["mine_scan"])
    for k in ("rescore", "prune", "mine_scan", "fit_stage"):
        print(f"  {k:18s} {t_phase[k]:7.2f}s "
              f"({t_phase[k] / dt * 100:4.1f}%)")
    print(f"  {'mine_host(label+gather)':18s} {mine_host:7.2f}s "
          f"({mine_host / dt * 100:4.1f}%)")
    print(f"  {'other':18s} {other:7.2f}s ({other / dt * 100:4.1f}%)")
    print(f"  images mined: {counts['mine_images']}")

    # TPU-native trainer: device-resident pool, one program per stage
    from waldboost_tpu.io import prefetch_iterable
    from waldboost_tpu.parallel.trainer import train_sharded

    gen2 = prefetch_iterable(fake_data_generator(seed=12), depth=32)
    model2 = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                        channels="grad_hist"))
    learner2 = wb.Learner(alpha=0.2, max_depth=2)
    train_sharded(model2, gen2, mesh=None, learner=learner2, length=WARMUP,
                  min_tp=1000, min_fp=1000, seed=0)
    for k in list(t_phase):
        t_phase[k] = 0.0
    counts.clear()
    t0 = time.perf_counter()
    train_sharded(model2, gen2, mesh=None, learner=learner2,
                  length=WARMUP + N_STAGES, min_tp=1000, min_fp=1000,
                  seed=0)
    dt = time.perf_counter() - t0
    print(f"device-pool trainer: {N_STAGES} stages in {dt:.2f}s -> "
          f"{N_STAGES / dt * 60:.1f} stages/min "
          f"(mine_scan {t_phase['mine_scan']:.2f}s, "
          f"images {counts['mine_images']})")


if __name__ == "__main__":
    main()
