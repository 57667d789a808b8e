"""Round-4 batch re-sweep after the AND-tree encoding switch (one process,
one device claim): headline 192/224/256, FHD 16/24, 4K 8/12.

nohup python scripts/exp_r10_batchsweep.py > /tmp/sweep_r10.log 2>&1 &
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def rec(name, **kw):
    print(json.dumps(dict(metric=name, **kw)), flush=True)


for b in (192, 224, 256):
    v = bench.bench_vga_full_pyramid(b, 16, 2, reps=2)
    rec("headline", batch=b, mps=round(v, 1))

for b in (16, 24):
    v = bench.bench_fhd_stream_depth2(b, 16, 2, reps=2)
    rec("fhd", batch=b, mps=round(v, 1))

for b in (8, 12):
    v = bench.bench_fpga_4k(b, 8, 2, reps=2)
    rec("fpga4k", batch=b, mps=round(v, 1))
