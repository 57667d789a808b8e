"""Per-op device trace of the training stage program (make_train_step):
where do its ~42 ms/dispatch go?

nohup python scripts/exp_r10_steptrace.py > /tmp/steptrace.log 2>&1 &
"""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waldboost_tpu  # noqa: F401
from waldboost_tpu.parallel.train_step import make_train_step

N = 2048
F = 12 * 12 * 4
K = 8

rng = np.random.RandomState(0)
step = make_train_step(alpha=0.2, max_depth=2, n_bins=256,
                       binning="quantile", mesh=None)

xs = []
for i in range(K + 2):
    xs.append((jnp.asarray(rng.randn(N, F).astype("f")),
               jnp.asarray(rng.randn(N).astype("f") * 0.1),
               jnp.asarray(rng.rand(N) < 0.9),
               jnp.asarray((rng.randn(N, F) + 1.0).astype("f")),
               jnp.asarray(rng.randn(N).astype("f") * 0.1),
               jnp.asarray(rng.rand(N) < 0.9)))


def run(a):
    x0, H0, v0, x1, H1, v1 = a
    return step(x0, H0, v0, x1, H1, v1, jnp.float32(1.0), jnp.float32(1.0),
                jnp.float32(-np.inf), jnp.asarray(True))


_ = float(run(xs[0]).loss)
_ = float(run(xs[1]).loss)

tdir = "/tmp/jxtrace_step"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    last = None
    for a in xs[2:]:
        last = run(a)
    _ = float(last.loss)

paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
from xprof.convert import raw_to_tool_data as r2t
data, _ctype = r2t.xspace_to_tool_data([paths[0]], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode()
j = json.loads(data)
cols = [c["label"] for c in j["cols"]]
per_op = {}
tot = 0.0
for row in j["rows"]:
    d = dict(zip(cols, [c.get("v") for c in row["c"]]))
    t = d["Total self time (us)"]
    tot += t
    key = (d.get("Program id"), d["HLO op name"])
    a = per_op.setdefault(key, [0.0, 0, d["HLO op category"]])
    a[0] += t
    a[1] += int(d["#Occurrences"])
print(f"TOTAL device: {tot/K/1e3:.2f} ms/step over {K} steps", flush=True)
for (pid, name), (t, n, cat) in sorted(per_op.items(),
                                       key=lambda kv: -kv[1][0])[:35]:
    print(f"{t/K:9.1f} us/step  n={n:4d}  {cat:20s} {name[:90]}", flush=True)
print("DONE", flush=True)
