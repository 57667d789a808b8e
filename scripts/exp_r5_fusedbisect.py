"""Bisect the fused shelf kernel's device-only NaN: run the parity check
on real TPU at increasing sizes.

nohup python scripts/exp_r5_fusedbisect.py > /tmp/fusedbis.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(h, w, npo):
    import jax
    import jax.numpy as jnp
    import waldboost_tpu.model as M
    from waldboost_tpu.model import _normalize_opts
    from waldboost_tpu.ops.channels_pallas import plane_pad_geometry

    opts = dict(shrink=2, n_per_oct=npo, smooth=1, channels="grad_hist")
    shrink, n_per_oct, sm, cf = _normalize_opts(opts)
    packed = M._packed_plan_cached(h, w, shrink, n_per_oct, (8, 8),
                                   halo=cf.halo)
    halo_m = packed.halo if (cf.boundary == "reflect" and cf.halo > 0) else 0
    geom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randint(0, 256, (2, h, w)).astype(np.uint8))
    mats, spec = M._poly_mats_cached(packed, halo_m, (h, w))
    fmats, fspec = M._poly_fused_cached(packed, halo_m, (h, w))
    nsh = len(fspec["shelves"])
    stripes = [ -(-sh[3].pitch // 64) for sh in fspec["shelves"] ]

    @jax.jit
    def diff(ims):
        ref = jax.vmap(lambda im: M._poly_planes(im, cf, packed, geom=geom,
                                                 mats=mats, spec=spec))(ims)
        got = M._poly_planes_fused(ims, fmats, fspec, interpret=False)
        d = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))
        return jnp.max(d), jnp.sum(d > 0), d.size

    t0 = time.time()
    mx, nbad, tot = diff(imgs)
    print(f"  ({h},{w},npo={npo}) shelves={nsh} stripes/shelf={stripes}: "
          f"max|d|={float(mx)} bad={int(nbad)}/{int(tot)} "
          f"[{time.time()-t0:.0f}s]", flush=True)
    return float(mx) == 0.0


def main():
    for h, w, npo in [(48, 64, 2), (96, 128, 2), (160, 256, 4),
                      (480, 640, 8)]:
        ok = run_case(h, w, npo)
        print(f"  -> {'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
