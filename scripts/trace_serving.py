"""Device trace of the fused serving program; prints per-op time aggregates.

nohup python scripts/trace_serving.py > /tmp/trace_sv.log 2>&1 &
"""

import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    cfgname = os.environ.get("TRACE_CONFIG", "vga")
    if cfgname == "fpga4k":
        h, w = 2160, 3840
        batch = int(os.environ.get("TRACE_BATCH", "4"))
        opts = dict(shrink=2, n_per_oct=4, smooth=0,
                    channels="grad_hist_4_u1")
        model = _flagship_model(channel_opts=opts, image_hw=(540, 960))
        nms_iou = None
    elif cfgname == "trained":
        # the committed trained flagship — the HEADLINE config since round 3
        import waldboost_tpu as wb
        h, w = 480, 640
        batch = int(os.environ.get("TRACE_BATCH", "32"))
        model = wb.load(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models", "flagship_synth_64.pb"))
        nms_iou = 0.5
    else:
        h, w = 480, 640
        batch = int(os.environ.get("TRACE_BATCH", "32"))
        model = _flagship_model()
        nms_iou = 0.5
    fn, _ = make_batched_detector_boxes(model, (h, w), k=256,
                                        nms_iou=nms_iou, with_n_weak=False)
    rng = np.random.RandomState(0)
    sets = [jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
            for _ in range(6)]
    out = fn(sets[0]); _ = float(out[0].sum())
    out = fn(sets[1]); _ = float(out[0].sum())

    tdir = "/tmp/jxtrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        last = None
        for s in sets[2:]:
            last = fn(s)
        _ = float(last[0].sum())

    # parse via xprof's hlo_stats converter (per-op device self time)
    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    n_img = (len(sets) - 2) * batch
    from xprof.convert import raw_to_tool_data as r2t
    data, _ctype = r2t.xspace_to_tool_data([paths[0]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    j = json.loads(data)
    cols = [c["label"] for c in j["cols"]]
    agg = {}
    tot = 0.0
    for row in j["rows"]:
        d = dict(zip(cols, [c.get("v") for c in row["c"]]))
        t = d["Total self time (us)"]
        tot += t
        key = (d["HLO op category"], d["HLO op name"].split(".")[0][:48])
        a = agg.setdefault(key, [0.0, 0])
        a[0] += t
        a[1] += int(d["#Occurrences"])
    for (cat, name), (t, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{t/n_img:8.1f} us/img  n={n:5d}  {cat:22s} {name}",
              flush=True)
    print(f"TOTAL per img: {tot/n_img:.1f} us", flush=True)
    # top individual ops (full names + program) for precise attribution
    per_op = {}
    for row in j["rows"]:
        d = dict(zip(cols, [c.get("v") for c in row["c"]]))
        key = (d.get("Program id"), d["HLO op name"])
        a = per_op.setdefault(key, [0.0, 0, d["HLO op category"]])
        a[0] += d["Total self time (us)"]
        a[1] += int(d["#Occurrences"])
    print("--- top individual ops ---", flush=True)
    for (pid, name), (t, n, cat) in sorted(per_op.items(),
                                           key=lambda kv: -kv[1][0])[:30]:
        print(f"{t/n_img:8.2f} us/img  n={n:4d}  p={pid}  {cat:18s} {name[:80]}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
