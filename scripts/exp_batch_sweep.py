"""Headline-config batch sweep (VGA full pyramid, 64-stage cascade).

The serving batch trades dispatch-gap amortization against memory pressure;
the optimum moved when kernel times changed (round-3: 64, round-5: 96).
Re-measure after the exact-projection chains changed the channel kernel's
cost.  Run detached on the TPU:

  nohup python scripts/exp_batch_sweep.py > /tmp/batch_sweep.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = [int(b) for b in
           os.environ.get("SWEEP_BATCHES", "80,96,112,128").split(",")]
ITERS = int(os.environ.get("SWEEP_ITERS", "16"))


def main():
    from bench import bench_vga_full_pyramid

    for b in BATCHES:
        mps = bench_vga_full_pyramid(b, ITERS, 2)
        print(f"batch {b}: {mps:.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()
