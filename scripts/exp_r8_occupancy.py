"""Per-stage tile-occupancy analysis: trained vs quantile-calibrated cascade.

The cascade kernel exits at TILE granularity (128x256 window tiles, blocks of
16 stages per lax.cond region, ops/cascade_static.py).  Its cost is roughly

    cost ~= sum over blocks b of (fraction of tiles alive entering b)

This script replays both flagship cascades (models/flagship_synth_64.pb and
the synthetic quantile-calibrated one from __graft_entry__) on bench-style
noise images and prints, per 16-stage block: window-alive fraction,
tile-alive fraction (128x256), and the cumulative cost model — so we can see
exactly which depth range the trained stragglers inflate.

Runs fine on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=1 python scripts/exp_r8_occupancy.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def occupancy(model, img, tile=(128, 256), block=16):
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import _canvas_jit, _packed_plan_cached
    from waldboost_tpu.ops.cascade import cascade_stage_responses

    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(img.shape[0], img.shape[1], shrink,
                                 n_per_oct, (m, n), halo=cf.halo)
    valid = np.asarray(packed.valid_mask((m, n)))
    casc, meta = model._get_cascade()
    canvas = _canvas_jit(jnp.asarray(img), shrink, n_per_oct, smooth, cf,
                         packed)
    resp = np.asarray(cascade_stage_responses(canvas, casc, (m, n), meta))
    T = len(model.classifier)
    resp = resp[:T]
    theta = np.asarray(model.theta[:T], np.float64)

    GU, GV = valid.shape
    TU, TV = tile
    gi, gj = -(-GU // TU), -(-GV // TV)
    H = np.zeros((GU, GV))
    alive = valid.copy()
    win_frac = []
    tile_frac = []
    for t in range(T):
        H += resp[t]
        alive &= (H >= theta[t]) | ~valid  # padding can't matter; keep valid-only
        alive &= valid
        win_frac.append(alive.sum() / valid.sum())
        ta = 0
        for i in range(gi):
            for j in range(gj):
                if alive[i * TU:(i + 1) * TU, j * TV:(j + 1) * TV].any():
                    ta += 1
        tile_frac.append(ta / (gi * gj))
    return np.array(win_frac), np.array(tile_frac), (gi, gj), valid.sum()


def main():
    import waldboost_tpu as wb
    from __graft_entry__ import _flagship_model

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (480, 640)).astype(np.uint8)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trained = wb.load(os.path.join(repo, "models", "flagship_synth_64.pb"))
    synth = _flagship_model()

    for name, model in [("synthetic", synth), ("trained", trained)]:
        wf, tf, grid, nvalid = occupancy(model, img)
        T = len(wf)
        block = 16
        cost = sum(tf[b - 1] if b else 1.0 for b in range(0, T, block))
        print(f"\n== {name}: grid {grid}, {nvalid} valid windows, "
              f"T={T}, block-cost model {cost:.3f} (of {T // block}.0 max)")
        print(" stage | win-alive | tile-alive")
        for t in list(range(0, T, 4)) + [T - 1]:
            print(f"  {t:4d} | {wf[t]:9.5f} | {tf[t]:9.4f}")


if __name__ == "__main__":
    main()
