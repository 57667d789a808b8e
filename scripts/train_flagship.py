"""Train the committed flagship cascade (bench config 6, VERDICT r1 #7).

Trains a 64-stage depth-2 detector on the synthetic dataset with the
HEADLINE channel config (shrink=2, n_per_oct=8, smooth=1, grad_hist) and
writes models/flagship_synth_64.pb — bench.py's trained_cascade config
loads it so the headline throughput claim is also measured under REAL
rejection dynamics, not just the quantile-calibrated synthetic cascade.

The training stream mixes the synthetic scenes with textureless BACKGROUND
frames (uniform noise at several contrasts, smoothed noise — no ground
truth, so every mined window is a negative).  Rationale (VERDICT r2 #1 +
scripts/exp_r8_occupancy*.py): a detector trained on scenes alone never
learns SPRT thetas that reject out-of-distribution noise — on bench noise
frames 78% of windows stayed alive through stage 20 and 2.3% were accepted
terminally (block-cost 3.667/4), while on its own scene distribution it
rejects to <0.3% by stage 8 (cost 1.0-2.5).  Mixing background frames in
makes the learned rejection schedule cover both, which is also the honest
production posture: real deployments see texture the scene generator
doesn't produce.

  nohup python scripts/train_flagship.py > /tmp/train_flagship.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noisy_scene_generator(seed=None, bg_every=3):
    """fake_data_generator records interleaved with 256x256 background
    frames every ``bg_every``-th record: uniform noise, half-contrast
    noise, and 3x3-box-smoothed noise (rotating), with empty ground truth.
    All frames share the scene shape so mining batches stay intact
    (samples.batched_records flushes on shape change)."""
    import numpy as np

    from waldboost_tpu import groundtruth
    from waldboost_tpu.utils import fake_data_generator

    scenes = fake_data_generator(seed=seed)
    rng = np.random.RandomState(None if seed is None else seed + 1)
    empty_gt = groundtruth.bbox_list(
        np.zeros((0, 4)), format=groundtruth.RectFormat.YXYX)
    k = 0
    while True:
        for _ in range(bg_every - 1):
            yield next(scenes)
        kind = k % 3
        k += 1
        if kind == 0:
            img = rng.randint(0, 256, (256, 256)).astype(np.uint8)
        elif kind == 1:
            img = (64 + rng.randint(0, 128, (256, 256))).astype(np.uint8)
        else:
            f = rng.randint(0, 256, (258, 258)).astype(np.float32)
            img = ((f[:-2, :-2] + f[1:-1, :-2] + f[2:, :-2]
                    + f[:-2, 1:-1] + f[1:-1, 1:-1] + f[2:, 1:-1]
                    + f[:-2, 2:] + f[1:-1, 2:] + f[2:, 2:]) / 9.0
                   ).astype(np.uint8)
        yield dict(image=img, groundtruth_boxes=empty_gt)


def main():
    import waldboost_tpu as wb

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models", "flagship_synth_64.pb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # recipe from the scripts/exp_r9_flagcand.py sweeps: quantile binning
    # (the package default) + alpha=0.3 + background frames every 2nd
    # record land BOTH the best held-out AUC (0.903 vs 0.846 for the
    # round-2 recipe) and the cheapest rejection (noise eval_cost 1.17 vs
    # 2.17 — the serving bench's input distribution)
    gen = noisy_scene_generator(seed=42, bg_every=2)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=8, smooth=1,
                                       channels="grad_hist"))
    pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=7)
    t0 = time.perf_counter()
    learner = wb.train(model, gen, pool=pool, length=64,
                       learner=wb.Learner(alpha=0.3, max_depth=2))
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
