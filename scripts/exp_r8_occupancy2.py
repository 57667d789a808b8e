"""Occupancy follow-up: trained cascade on ITS OWN data distribution.

exp_r8_occupancy.py showed the trained flagship barely rejects uniform-noise
windows before stage 24 and accepts 2.3% of them terminally, while the
quantile-calibrated synthetic rejects noise almost immediately.  Hypothesis:
distribution mismatch — the model trained on fake_data_generator scenes and
never saw uniform noise.  This script replays the same occupancy analysis on
scene images from the training generator.

  XLA_FLAGS=--xla_force_host_platform_device_count=1 python scripts/exp_r8_occupancy2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from exp_r8_occupancy import occupancy


def main():
    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trained = wb.load(os.path.join(repo, "models", "flagship_synth_64.pb"))

    gen = fake_data_generator(seed=123)  # unseen seed = held-out scenes
    for idx in range(3):
        img = next(gen)["image"]
        if img.shape != (480, 640):
            import cv2  # noqa: F401  (not available; pad/crop instead)
    # fake scenes may not be VGA; just use them at their native size
    gen = fake_data_generator(seed=123)
    for idx in range(3):
        d = next(gen)
        img = d["image"]
        wf, tf, grid, nvalid = occupancy(trained, img)
        T = len(wf)
        block = 16
        cost = sum(tf[b - 1] if b else 1.0 for b in range(0, T, block))
        print(f"\n== scene {idx} {img.shape}: grid {grid}, {nvalid} valid, "
              f"T={T}, block-cost {cost:.3f} (of {T // block}.0 max)")
        for t in list(range(0, T, 8)) + [T - 1]:
            print(f"  {t:4d} | {wf[t]:9.5f} | {tf[t]:9.4f}")


if __name__ == "__main__":
    main()
