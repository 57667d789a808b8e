"""Reproduce bench.bench_train_loop_device_pool with per-stage timestamps
to find where the warm bench loses time vs the profile's 0.056 s p50.

nohup python scripts/exp_r10_benchdp.py > /tmp/benchdp.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waldboost_tpu as wb
from waldboost_tpu.io import prefetch_iterable
from waldboost_tpu.parallel.trainer import train_sharded
from waldboost_tpu.utils import fake_data_generator

n_stages = 12
reps = 2

gen = fake_data_generator(seed=11)
model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                   channels="grad_hist"))
learner = wb.Learner(alpha=0.2, max_depth=2)
gen = prefetch_iterable(gen, depth=32)
pools = {}

stamps = []


def cb(model, learner, stage):
    stamps.append((stage, time.perf_counter()))


t0 = time.perf_counter()
train_sharded(model, gen, mesh=None, learner=learner, length=2,
              min_tp=1000, min_fp=1000, seed=0, pools=pools,
              prewarm_length=2 + reps * n_stages, callbacks=[cb])
print(f"warmup segment: {time.perf_counter() - t0:.2f}s", flush=True)

for r in range(reps):
    t0 = time.perf_counter()
    train_sharded(model, gen, mesh=None, learner=learner,
                  length=2 + (r + 1) * n_stages,
                  min_tp=1000, min_fp=1000, seed=0, pools=pools,
                  callbacks=[cb])
    dt = time.perf_counter() - t0
    print(f"segment {r}: {dt:.2f}s = {n_stages / dt * 60:.1f} stages/min",
          flush=True)

prev = None
for s, t in stamps:
    if prev is not None:
        print(f"  stage {s}: +{t - prev:.3f}s", flush=True)
    prev = t
