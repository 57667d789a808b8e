"""Deep-cascade (256-stage) serving: where does tile-exit-only SPRT
saturate, and does finer exit granularity (bands / block schedule) win?

VERDICT r1 #10 stretch: sweep the masked static kernel over cascade depth
{64, 128, 256} x bands {1, 2, 4} x block {8, 16} on a VGA canvas with a
quantile-calibrated cascade, reporting us/img minima over 3 reps.

  nohup python scripts/exp_r7_deepcascade.py > /tmp/deepcasc.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import _canvas_batch_jit, _packed_plan_cached
    from waldboost_tpu.ops.cascade_static import (
        cascade_masked_grid_static, static_cascade_from_model)

    import waldboost_tpu as wb

    h, w = 480, 640
    batch = 16
    rng = np.random.RandomState(0)

    trained = wb.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models", "flagship_synth_64.pb"))

    for T in ("trained64", 64, 128, 256):
        model = trained if T == "trained64" else _flagship_model(n_stages=T)
        m, n, _ = model.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
        packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n),
                                     halo=cf.halo)
        valid = jnp.asarray(packed.valid_mask((m, n)))
        sc = static_cascade_from_model(model)

        sets = [jnp.asarray(rng.randint(0, 256, (batch, h, w))
                            .astype(np.uint8)) for _ in range(6)]
        cvs_sets = [_canvas_batch_jit(s, shrink, n_per_oct, smooth, cf,
                                      packed) for s in sets]
        _ = float(cvs_sets[-1].sum())

        for bands in (1, 2, 4):
            for block in (8, 16):
                fn = jax.jit(lambda cvs: cascade_masked_grid_static(
                    cvs, sc, valid, (m, n), preshift=True,
                    preshift_lazy=True, preshift_min_uses=1,
                    with_n_weak=False, bands=bands, block=block)[0].sum())
                best = None
                for rep in range(3):
                    _ = float(fn(cvs_sets[0]))
                    t0 = time.perf_counter()
                    last = None
                    for cv in cvs_sets[1:]:
                        last = fn(cv)
                    _ = float(last)
                    dt = (time.perf_counter() - t0) / (len(cvs_sets) - 1) \
                        / batch * 1e6
                    best = dt if best is None else min(best, dt)
                print(f"T={T!s:>9} bands={bands} block={block:2d}: "
                      f"{best:7.1f} us/img", flush=True)


if __name__ == "__main__":
    main()
