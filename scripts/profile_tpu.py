"""TPU profiling worker: per-phase breakdown of the detection pipeline.

Run detached (compiles are nondeterministically slow through the axon
tunnel):  nohup python scripts/profile_tpu.py > /tmp/prof.log 2>&1 &

Timing per CLAUDE.md rules: distinct inputs per call (the runtime dedupes
identical executions), FIFO-drain timing by fetching one scalar from the
last result, batch=16 VGA images.
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
    from waldboost_tpu.channels import CanvasCtx, _compute_octaves, _normalize_opts
    from waldboost_tpu.model import _channel_canvas_fast, _packed_plan_cached
    from waldboost_tpu.ops.cascade import cascade_response_grid, slice_cascade
    from waldboost_tpu.ops.cascade_pallas import cascade_response_grid_pallas
    from waldboost_tpu.ops.warp import reflect_halos, resize_matrices

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2

    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    casc, meta = model._get_cascade()
    valid = jnp.asarray(packed.valid_mask((m, n)))

    rng = np.random.RandomState(0)
    n_batches = iters + warmup

    def timeit(name, fn):
        batches = [
            jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
            for _ in range(n_batches)
        ]
        t_c0 = time.perf_counter()
        out = fn(batches[0])
        _ = float(out)
        compile_s = time.perf_counter() - t_c0
        for i in range(1, warmup):
            out = fn(batches[i])
        _ = float(out)
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(batches[warmup + i])
        _ = float(last)
        dt = time.perf_counter() - t0
        ms_img = dt / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(ms_img, 3),
                          "mps": round(h * w / 1e6 / (ms_img / 1e3), 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms_img

    # ---- canvas phases ----------------------------------------------------
    n_oct = max(pl.level.octave for pl in packed.levels) + 1
    Hc_img, Wc_img = packed.image_canvas_shape()
    regions = packed.reflect_regions()

    def resize_only(image):
        octaves = _compute_octaves(image, n_oct)
        img_canvas = jnp.zeros((Hc_img, Wc_img), jnp.float32)
        for pl in packed.levels:
            lv = pl.level
            oct_img = octaves[lv.octave].astype(jnp.float32)
            Rh, Rw = resize_matrices(oct_img.shape[0], oct_img.shape[1],
                                     lv.height, lv.width)
            im = jnp.einsum("ah,hw,bw->ab", jnp.asarray(Rh), oct_img,
                            jnp.asarray(Rw), preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            im = jnp.floor(im + 1e-4)
            img_canvas = jax.lax.dynamic_update_slice(
                img_canvas, im, (pl.y * shrink, pl.x * shrink))
        return img_canvas

    def resize_reflect(image):
        return reflect_halos(resize_only(image), regions)

    timeit("canvas_resize_only",
           jax.jit(lambda ims: jax.vmap(resize_only)(ims).sum()))
    timeit("canvas_resize_reflect",
           jax.jit(lambda ims: jax.vmap(resize_reflect)(ims).sum()))
    canvas_b = jax.vmap(
        lambda im: _channel_canvas_fast(im, shrink, smooth, cf, packed)
        .astype(jnp.float32))
    timeit("canvas_full", jax.jit(lambda ims: canvas_b(ims).sum()))

    # ---- cascade variants (canvas + cascade; subtract canvas_full) --------
    def detect_pallas(tile, T=None):
        cc = casc if T is None else slice_cascade(casc, 0, T)

        def fn(images):
            cvs = canvas_b(images)
            outs = [cascade_response_grid_pallas(
                cvs[i], cc, valid, (m, n), meta, tile=tile)[2]
                for i in range(batch)]
            return jnp.stack(outs).sum()
        return jax.jit(fn)

    timeit("canvas+pallas64_t128x256", detect_pallas((128, 256)))
    timeit("canvas+pallas64_t256x256", detect_pallas((256, 256)))
    timeit("canvas+pallas64_t64x512", detect_pallas((64, 512)))
    timeit("canvas+pallas16_t128x256", detect_pallas((128, 256), T=16))

    def detect_xla(images):
        cvs = canvas_b(images)
        outs = [cascade_response_grid(cvs[i], casc, (m, n), meta,
                                      init_alive=valid)[2]
                for i in range(batch)]
        return jnp.stack(outs).sum()

    timeit("canvas+xla64", jax.jit(detect_xla))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
