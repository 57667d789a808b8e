"""TPU experiment: polyphase resize variants.

nohup python scripts/exp_resize.py > /tmp/exp_resize.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waldboost_tpu.channels import _normalize_opts, _compute_octaves
from waldboost_tpu.model import _packed_plan_cached, _poly_planes
from waldboost_tpu.ops.warp import reflect_halos_poly, resize_matrices

h, w = 480, 640
batch, iters, warmup = 16, 8, 2
opts = dict(shrink=2, n_per_oct=8, smooth=1, channels="grad_hist")
shrink, n_per_oct, smooth, cf = _normalize_opts(opts)
packed = _packed_plan_cached(h, w, shrink, n_per_oct, (12, 12), halo=cf.halo)
rng = np.random.RandomState(0)
n_oct = max(pl.level.octave for pl in packed.levels) + 1
Hc, Wc = packed.canvas_h, packed.canvas_w
regions = packed.reflect_regions()
HI = jax.lax.Precision.HIGHEST


def timeit(name, fn):
    batches = [jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
               for _ in range(iters + warmup)]
    t0 = time.perf_counter(); out = fn(batches[0]); _ = float(out)
    cs = time.perf_counter() - t0
    for i in range(1, warmup):
        out = fn(batches[i])
    _ = float(out)
    t0 = time.perf_counter()
    for i in range(iters):
        last = fn(batches[warmup + i])
    _ = float(last)
    dt = time.perf_counter() - t0
    ms = dt / (iters * batch) * 1e3
    print(json.dumps({"name": name, "ms_per_image": round(ms, 3),
                      "compile_s": round(cs, 1)}), flush=True)


def pm(R):
    return np.concatenate([R[0::2], R[1::2]])


# components
timeit("octaves_only", jax.jit(lambda ims: sum(
    o.astype(jnp.float32).sum() for o in
    jax.vmap(lambda im: tuple(_compute_octaves(im, n_oct)))(ims))))


def einsums_only(image):
    octaves = _compute_octaves(image, n_oct)
    acc = jnp.zeros((), jnp.float32)
    for pl_ in packed.levels:
        lv = pl_.level
        oi = octaves[lv.octave].astype(jnp.float32)
        Rh, Rw = resize_matrices(oi.shape[0], oi.shape[1], lv.height, lv.width)
        blk = jnp.einsum("ah,hw,bw->ab", jnp.asarray(pm(Rh)), oi,
                         jnp.asarray(pm(Rw)),
                         preferred_element_type=jnp.float32, precision=HI)
        acc = acc + jnp.floor(blk + 1e-4).sum()
    return acc


timeit("einsums_nodus", jax.jit(lambda ims: jax.vmap(einsums_only)(ims).sum()))

# V1: current (planes array, 4 quadrant DUS, separate reflect pass)
timeit("v1_current", jax.jit(lambda ims: jax.vmap(
    lambda im: _poly_planes(im, cf, packed))(ims).sum()))


# V2: four separate (Hc, Wc) canvases, 2D DUS, stack at end, reflect pass
def v2(image):
    octaves = _compute_octaves(image, n_oct)
    planes = [[jnp.zeros((Hc, Wc), jnp.float32) for _ in range(2)]
              for _ in range(2)]
    for pl_ in packed.levels:
        lv = pl_.level
        oi = octaves[lv.octave].astype(jnp.float32)
        Rh, Rw = resize_matrices(oi.shape[0], oi.shape[1], lv.height, lv.width)
        blk = jnp.einsum("ah,hw,bw->ab", jnp.asarray(pm(Rh)), oi,
                         jnp.asarray(pm(Rw)),
                         preferred_element_type=jnp.float32, precision=HI)
        blk = jnp.floor(blk + 1e-4)
        h2, w2 = lv.height // 2, lv.width // 2
        for a in (0, 1):
            for b in (0, 1):
                planes[a][b] = jax.lax.dynamic_update_slice(
                    planes[a][b], blk[a * h2:(a + 1) * h2, b * w2:(b + 1) * w2],
                    (pl_.y, pl_.x))
    st = jnp.stack([jnp.stack(r) for r in planes])
    return reflect_halos_poly(st, regions)


timeit("v2_sep_planes", jax.jit(lambda ims: jax.vmap(v2)(ims).sum()))


# V4: per-octave stacked vertical matmul + per-level horizontal
def v4(image):
    octaves = _compute_octaves(image, n_oct)
    planes = [[jnp.zeros((Hc, Wc), jnp.float32) for _ in range(2)]
              for _ in range(2)]
    by_oct = {}
    for pl_ in packed.levels:
        by_oct.setdefault(pl_.level.octave, []).append(pl_)
    for o, pls in by_oct.items():
        oi = octaves[o].astype(jnp.float32)
        Rhs = [resize_matrices(oi.shape[0], oi.shape[1], p.level.height,
                               p.level.width)[0] for p in pls]
        Rh_cat = np.concatenate([pm(R) for R in Rhs])
        Z = jnp.einsum("rh,hw->rw", jnp.asarray(Rh_cat), oi,
                       preferred_element_type=jnp.float32, precision=HI)
        r0 = 0
        for p, Rh in zip(pls, Rhs):
            lv = p.level
            Rw = resize_matrices(oi.shape[0], oi.shape[1], lv.height,
                                 lv.width)[1]
            Zl = Z[r0:r0 + lv.height]
            r0 += lv.height
            blk = jnp.einsum("rw,cw->rc", Zl, jnp.asarray(pm(Rw)),
                             preferred_element_type=jnp.float32, precision=HI)
            blk = jnp.floor(blk + 1e-4)
            h2, w2 = lv.height // 2, lv.width // 2
            for a in (0, 1):
                for b in (0, 1):
                    planes[a][b] = jax.lax.dynamic_update_slice(
                        planes[a][b],
                        blk[a * h2:(a + 1) * h2, b * w2:(b + 1) * w2],
                        (p.y, p.x))
    st = jnp.stack([jnp.stack(r) for r in planes])
    return reflect_halos_poly(st, regions)


timeit("v4_stacked_vert", jax.jit(lambda ims: jax.vmap(v4)(ims).sum()))
print("DONE", flush=True)
