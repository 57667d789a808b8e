"""Stage-separated device validation of the flagship fused path.

nohup python scripts/exp_r5_fusedval2.py > /tmp/fusedval2.log 2>&1 &
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
    import waldboost_tpu.model as M
    from waldboost_tpu.ops.channels_pallas import plane_pad_geometry

    h, w = 480, 640
    B = 2
    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, sm, cf = M._normalize_opts(model.channel_opts)
    packed = M._packed_plan_cached(h, w, shrink, n_per_oct, (m, n),
                                   halo=cf.halo)
    halo_m = packed.halo if (cf.boundary == "reflect" and cf.halo > 0) else 0
    geom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    print("flagship window", (m, n), "canvas", packed.canvas_h,
          packed.canvas_w, "halo", halo_m, flush=True)

    mats, spec = M._poly_mats_cached(packed, halo_m, (h, w))
    fmats, fspec = M._poly_fused_cached(packed, halo_m, (h, w))
    print("shelves:", len(fspec["shelves"]), "vmem:",
          fspec["vmem_bytes"] / 2**20, flush=True)

    rng = np.random.RandomState(42)
    imgs = jnp.asarray(rng.randint(0, 256, (B, h, w)).astype(np.uint8))

    @jax.jit
    def pdiff(ims):
        ref = jax.vmap(lambda im: M._poly_planes(im, cf, packed, geom=geom,
                                                 mats=mats, spec=spec))(ims)
        got = M._poly_planes_fused(ims, fmats, fspec, interpret=False)
        rf = ref.astype(jnp.float32)
        gf = got.astype(jnp.float32)
        d = jnp.abs(rf - gf)
        return (jnp.max(d), jnp.sum(d > 0),
                jnp.sum(jnp.isnan(rf)), jnp.sum(jnp.isnan(gf)))

    t0 = time.time()
    mx, nbad, nan_r, nan_g = pdiff(imgs)
    print(f"planes: max|d|={float(mx)} bad={int(nbad)} "
          f"nan_ref={int(nan_r)} nan_fused={int(nan_g)} "
          f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
