"""TPU experiment: channel-kernel and cascade-kernel component costs.

nohup python scripts/exp_kernels.py > /tmp/exp_k.log 2>&1 &
"""

import json
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
    from waldboost_tpu.model import _packed_plan_cached, _poly_planes
    from waldboost_tpu.ops.cascade_static import (cascade_grid,
                                                  cascade_response_grid_static,
                                                  static_cascade_from_model)
    from waldboost_tpu.ops.channels_pallas import (channel_grid,
                                                   plane_pad_geometry)

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    sc = static_cascade_from_model(model)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    Hc, Wc = packed.canvas_h, packed.canvas_w
    print(json.dumps({"canvas_hw": [Hc, Wc]}), flush=True)

    TUc, TVc, gi2, gj2, HU, HV = cascade_grid((Hc, Wc), (m, n))
    need = (gi2 * TUc + HU, gj2 * TVc + HV)
    TU, TV, _, _ = channel_grid(Hc, Wc)
    out_grid = (-(-need[0] // TU), -(-need[1] // TV))
    geom = plane_pad_geometry(Hc, Wc, out_grid=out_grid)
    interior = jnp.asarray(packed.smooth_interior_mask())

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]

    def timeit(name, fn, inputs, fetch):
        out = fn(inputs[0]); _ = float(fetch(out))
        for i in range(1, warmup):
            out = fn(inputs[i])
        _ = float(fetch(out))
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(inputs[warmup + i])
        _ = float(fetch(last))
        dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(dt, 4)}),
              flush=True)

    # planes with the fused (enlarged) geometry
    planes_fused = jax.jit(lambda ims: jax.vmap(
        lambda im: _poly_planes(im, cf, packed, geom=geom))(ims))
    timeit("planes_fused_geom", planes_fused, image_sets,
           lambda p: p[0, 0, 0, 0, 0].astype(jnp.float32))

    planes_sets = [planes_fused(ims) for ims in image_sets]
    _ = float(planes_sets[-1][0, 0, 0, 0, 0].astype(jnp.float32))

    # channel kernel alone (fused geometry, no crop)
    chan = jax.jit(lambda p: cf.poly_kernel(
        p, interior, smooth, False, content_hw=(Hc, Wc), out_grid=out_grid,
        crop=False))
    timeit("channel_kernel", chan, planes_sets, lambda c: c[0, 0, 0, 0])

    canvases = [chan(p) for p in planes_sets]
    _ = float(canvases[-1][0, 0, 0, 0])

    # cascade kernel variants
    for block in (8, 16, 32):
        fn = jax.jit(lambda cv, b=block: cascade_response_grid_static(
            cv, sc, valid, (m, n), content_hw=(Hc, Wc), block=b))
        timeit(f"cascade_block{block}", fn, canvases,
               lambda o: o[2].sum().astype(jnp.float32))

    # cascade without any early exit conds (block > T burns all stages)
    fn = jax.jit(lambda cv: cascade_response_grid_static(
        cv, sc, valid, (m, n), content_hw=(Hc, Wc), block=64))
    timeit("cascade_block64_noexit", fn, canvases,
           lambda o: o[2].sum().astype(jnp.float32))

    # cascade tile variants
    for tile in ((64, 256), (128, 128), (256, 256), (128, 512)):
        try:
            fn = jax.jit(lambda cv, t=tile: cascade_response_grid_static(
                cv[:, :, :Hc, :Wc], sc, valid, (m, n), tile=t))
            timeit(f"cascade_tile{tile[0]}x{tile[1]}", fn, canvases,
                   lambda o: o[2].sum().astype(jnp.float32))
        except Exception as e:
            print(json.dumps({"name": f"cascade_tile{tile}", "error": str(e)[:200]}),
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
