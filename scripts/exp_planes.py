"""TPU experiment: where do the polyphase-plane milliseconds go?

nohup python scripts/exp_planes.py > /tmp/exp_pl.log 2>&1 &

Variants (batch 32 VGA, FIFO-drain, 2-rep min):
  octaves        — the halved-octave chain alone
  blocks_highest — per-level polyphase resize einsums (HIGHEST precision)
  blocks_default — same einsums at DEFAULT precision (cost of exactness)
  blocks_stack1  — pass-1 stacked per octave (one matmul/octave) + per-level
                   pass 2
  planes_full    — current production assembly (einsums + concat + pad)
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
    from waldboost_tpu.channels import _compute_octaves, _normalize_opts
    from waldboost_tpu.model import (_packed_plan_cached, _poly_planes)
    from waldboost_tpu.ops.channels_pallas import plane_pad_geometry
    from waldboost_tpu.ops.warp import build_resize_matrix, resize_taps

    h, w = 480, 640
    batch, iters, warmup = 32, 8, 2
    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n),
                                 halo=cf.halo)
    geom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    halo = packed.halo
    n_oct = max(pl.level.octave for pl in packed.levels) + 1
    print(json.dumps({"n_levels": len(packed.levels), "n_oct": n_oct,
                      "geom": list(geom)}), flush=True)

    rng = np.random.RandomState(0)
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters + warmup)
    ]

    def timeit(name, fn, inputs, fetch, reps=2):
        best = None
        for _rep in range(reps):
            out = fn(inputs[0]); _ = float(fetch(out))
            out = fn(inputs[1]); _ = float(fetch(out))
            t0 = time.perf_counter()
            for i in range(iters):
                last = fn(inputs[warmup + i])
            _ = float(fetch(last))
            dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
            best = dt if best is None else min(best, dt)
        print(json.dumps({"name": name, "ms_per_image": round(best, 4)}),
              flush=True)

    # --- octaves alone
    oct_jit = jax.jit(lambda ims: jax.vmap(
        lambda im: sum(o.astype(jnp.float32)[0, 0]
                       for o in _compute_octaves(im, n_oct)))(ims))
    timeit("octaves", oct_jit, image_sets, lambda o: o.sum())

    # --- per-level einsums (pass1+pass2), no concat
    def _ext_pm(R, size):
        if halo:
            R = np.concatenate([R[halo - 1::-1], R,
                                R[size - 1:size - halo - 1:-1]])
        return np.concatenate([R[halo % 2::2], R[(1 + halo) % 2::2]])

    def blocks(image, precision):
        octaves = _compute_octaves(image, n_oct)
        acc = jnp.zeros((), jnp.float32)
        for pl_ in packed.levels:
            lv = pl_.level
            oct_img = octaves[lv.octave].astype(jnp.float32)
            oh, ow = oct_img.shape
            i0h, frh = (_ext_pm(t, lv.height)
                        for t in resize_taps(oh, lv.height))
            i0w, frw = (_ext_pm(t, lv.width)
                        for t in resize_taps(ow, lv.width))
            hq = (lv.height + 2 * halo) // 2
            wq = (lv.width + 2 * halo) // 2
            Rh = build_resize_matrix(i0h, frh, oh).reshape(2, hq, oh)
            Rw = build_resize_matrix(i0w, frw, ow).reshape(2, wq, ow)
            blk = jnp.einsum("prh,hw,qcw->pqrc", Rh, oct_img, Rw,
                             preferred_element_type=jnp.float32,
                             precision=precision)
            blk = jnp.floor(blk + 1e-4)
            acc = acc + blk[0, 0, 0, 0] + blk.sum()
        return acc

    for name, prec in (("blocks_highest", jax.lax.Precision.HIGHEST),
                       ("blocks_default", jax.lax.Precision.DEFAULT)):
        fn = jax.jit(lambda ims, p=prec: jax.vmap(
            lambda im: blocks(im, p))(ims))
        timeit(name, fn, image_sets, lambda o: o.sum())

    # --- pass-1 stacked per octave, pass 2 per level
    def blocks_stack1(image):
        octaves = _compute_octaves(image, n_oct)
        acc = jnp.zeros((), jnp.float32)
        by_oct = {}
        for li, pl_ in enumerate(packed.levels):
            by_oct.setdefault(pl_.level.octave, []).append(pl_)
        for oc, pls in by_oct.items():
            oct_img = octaves[oc].astype(jnp.float32)
            oh, ow = oct_img.shape
            Rhs = []
            meta = []
            off = 0
            for pl_ in pls:
                lv = pl_.level
                i0h, frh = (_ext_pm(t, lv.height)
                            for t in resize_taps(oh, lv.height))
                hq = (lv.height + 2 * halo) // 2
                Rh = build_resize_matrix(i0h, frh, oh).reshape(2 * hq, oh)
                Rhs.append(Rh)
                meta.append((off, hq, lv))
                off += 2 * hq
            Rh_all = jnp.concatenate(Rhs, axis=0)  # (sum 2hq, oh)
            tmp = jnp.einsum("ro,ow->rw", Rh_all, oct_img,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            for off, hq, lv in meta:
                i0w, frw = (_ext_pm(t, lv.width)
                            for t in resize_taps(ow, lv.width))
                wq = (lv.width + 2 * halo) // 2
                Rw = build_resize_matrix(i0w, frw, ow).reshape(2, wq, ow)
                t_l = tmp[off:off + 2 * hq].reshape(2, hq, ow)
                blk = jnp.einsum("prw,qcw->pqrc", t_l, Rw,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                blk = jnp.floor(blk + 1e-4)
                acc = acc + blk[0, 0, 0, 0] + blk.sum()
        return acc

    fn = jax.jit(lambda ims: jax.vmap(blocks_stack1)(ims))
    timeit("blocks_stack1", fn, image_sets, lambda o: o.sum())

    # --- full production planes
    planes_jit = jax.jit(lambda ims: jax.vmap(
        lambda im: _poly_planes(im, cf, packed, geom=geom))(ims))
    timeit("planes_full", planes_jit, image_sets,
           lambda p: p[0, 0, 0, 0, 0].astype(jnp.float32))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
