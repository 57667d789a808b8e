"""Per-phase breakdown of the DEVICE-POOL training loop (config 4b).

Times each stage's refill (mining: device scans + host labeling + pool
inserts), the one-program train step (dispatch + device compute), and the
host tail (tree pull + model append), then prints a table and stages/min.
Run detached on the TPU:

  nohup python scripts/profile_train_device.py > /tmp/train_dev_prof.log 2>&1 &
"""

import os
import sys
import time
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STAGES = int(os.environ.get("PROF_STAGES", "24"))
WARMUP = int(os.environ.get("PROF_WARMUP", "2"))
MINE_BATCH = int(os.environ.get("PROF_MINE_BATCH", "8"))


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.io import prefetch_iterable
    from waldboost_tpu.parallel import trainer as T
    from waldboost_tpu.utils import fake_data_generator

    t_phase = defaultdict(float)
    counts = defaultdict(int)
    stage_t = []

    orig_scan = wb.Model.scan_packed_batch

    def timed_scan(self, images, n_real=None):
        t0 = time.perf_counter()
        out = orig_scan(self, images, n_real=n_real)
        t_phase["mine_scan"] += time.perf_counter() - t0
        counts["mine_images"] += (n_real if n_real is not None
                                  else len(images))
        counts["mine_dispatch"] += 1
        return out

    wb.Model.scan_packed_batch = timed_scan

    orig_insert = T.DevicePool.insert

    def timed_insert(self, X_new, H_new):
        t0 = time.perf_counter()
        out = orig_insert(self, X_new, H_new)
        t_phase["pool_insert"] += time.perf_counter() - t0
        counts["inserted"] += out
        return out

    T.DevicePool.insert = timed_insert

    orig_insert_dev = T.DevicePool.insert_from_device

    def timed_insert_dev(self, src_x, src_H, idx):
        t0 = time.perf_counter()
        out = orig_insert_dev(self, src_x, src_H, idx)
        t_phase["pool_insert"] += time.perf_counter() - t0
        counts["inserted"] += out
        return out

    T.DevicePool.insert_from_device = timed_insert_dev

    orig_apply = T.DevicePool.apply_stage

    def timed_apply(self, H, v, count=None):
        t0 = time.perf_counter()
        orig_apply(self, H, v, count=count)
        t_phase["pool_apply"] += time.perf_counter() - t0

    T.DevicePool.apply_stage = timed_apply

    orig_get = jax.device_get

    def timed_get(x):
        t0 = time.perf_counter()
        out = orig_get(x)
        t_phase["device_get"] += time.perf_counter() - t0
        return out

    jax.device_get = timed_get

    import waldboost_tpu.model as M
    orig_prewarm = M.prewarm_mining_buckets

    def timed_prewarm(*a, **k):
        t0 = time.perf_counter()
        out = orig_prewarm(*a, **k)
        t_phase["prewarm_call"] += time.perf_counter() - t0
        return out

    M.prewarm_mining_buckets = timed_prewarm

    from waldboost_tpu import samples as S
    orig_mlw = S.mine_labeled_windows

    def timed_mlw(*a, **k):
        # labeling time = call wall minus the scan time accrued inside it
        scan0 = t_phase["mine_scan"]
        t0 = time.perf_counter()
        out = orig_mlw(*a, **k)
        t_phase["mine_label"] += (time.perf_counter() - t0
                                  - (t_phase["mine_scan"] - scan0))
        return out

    S.mine_labeled_windows = timed_mlw

    orig_make = T.make_train_step

    def timed_make(**kw):
        step = orig_make(**kw)

        def timed_step(*a, **k):
            t0 = time.perf_counter()
            res = step(*a, **k)
            # force the scalar outputs (theta read happens on host anyway)
            float(res.theta)
            t_phase["train_step"] += time.perf_counter() - t0
            counts["steps"] += 1
            return res

        return timed_step

    T.make_train_step = timed_make

    gen = prefetch_iterable(fake_data_generator(seed=11), depth=32)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    learner = wb.Learner(alpha=0.2, max_depth=2)

    # warmup stages pay all compiles; the pools dict carries the device
    # pool into the measured segment (same contract as bench.py config 4b)
    pools = {}
    T.train_sharded(model, gen, mesh=None, learner=learner, length=WARMUP,
                    min_tp=1000, min_fp=1000, seed=0, mine_batch=MINE_BATCH,
                    pools=pools, prewarm_length=WARMUP + N_STAGES)
    for k in list(t_phase):
        del t_phase[k]
    for k in list(counts):
        del counts[k]

    wall0 = time.perf_counter()
    last = wall0

    class StageClock:
        def __call__(self, model, learner, stage):
            nonlocal last
            now = time.perf_counter()
            stage_t.append(now - last)
            last = now

    T.train_sharded(model, gen, mesh=None, learner=learner,
                    length=WARMUP + N_STAGES, min_tp=1000, min_fp=1000,
                    seed=0, mine_batch=MINE_BATCH, callbacks=[StageClock()],
                    pools=pools)
    wall = time.perf_counter() - wall0

    print(f"\n{N_STAGES} stages in {wall:.2f}s = "
          f"{N_STAGES / wall * 60:.1f} stages/min")
    total = sum(t_phase.values())
    for k in sorted(t_phase, key=t_phase.get, reverse=True):
        print(f"  {k:<12} {t_phase[k]:7.2f}s  {t_phase[k] / wall * 100:5.1f}%")
    print(f"  {'(untimed)':<12} {wall - total:7.2f}s  "
          f"{(wall - total) / wall * 100:5.1f}%")
    for k, v in sorted(counts.items()):
        print(f"  {k}: {v}")
    q = np.percentile(stage_t, [50, 90, 100])
    print(f"  stage time p50/p90/max: {q[0]:.3f}/{q[1]:.3f}/{q[2]:.3f} s")


if __name__ == "__main__":
    main()
