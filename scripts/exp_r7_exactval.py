"""Round-7 TPU validation of the exact-arithmetic paths (ops.exact).

Phases (smallest first, per the chip-wedge protocol — all changes are pure
vector arithmetic on proven kernel scaffolds, no new DMA/semaphore shapes):
  1. combine4_exact i32/split variants via XLA on-device vs host expectation
  2. grad_hist channel kernel vs XLA polyphase chain (small canvas), bitwise
  3. fused shelf plane kernel vs XLA mats path (96x128 + 240x320), bitwise
  4. end-to-end detect at VGA: fused serving path vs XLA path, boxes equal

Usage: nohup python scripts/exp_r7_exactval.py > /tmp/r7val.log 2>&1 &
"""
import os
import sys

os.environ.setdefault("WB_PLANE_FUSED", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phase1():
    from waldboost_tpu.ops.exact import axis_taps_exact, combine4_exact, \
        combine_kind
    from fractions import Fraction

    rng = np.random.RandomState(0)
    for axes, vmax in [((480, 440, 640, 586), 255),
                       ((2160, 1981, 3840, 3522), 255),
                       ((480, 441, 640, 587), 1 << 14)]:  # forces 'split'
        i0r, fnr, dr = axis_taps_exact(axes[0], axes[1])
        i0c, fnc, dc = axis_taps_exact(axes[2], axes[3])
        ks = rng.randint(0, axes[1], 4096)
        ls = rng.randint(0, axes[3], 4096)
        g = [rng.randint(0, 256, 4096).astype(np.int64) for _ in range(4)]
        want = []
        for t in range(4096):
            fr = Fraction(int(fnr[ks[t]]), dr)
            fc = Fraction(int(fnc[ls[t]]), dc)
            v = (1 - fr) * (1 - fc) * int(g[0][t]) \
                + (1 - fr) * fc * int(g[1][t]) \
                + fr * (1 - fc) * int(g[2][t]) + fr * fc * int(g[3][t])
            want.append(v.numerator // v.denominator)
        f = jax.jit(lambda a, b, c, d, x, y: combine4_exact(
            a, b, c, d, x, y, dr, dc, vmax=vmax))
        got = np.asarray(f(*[jnp.asarray(q, jnp.float32) for q in g],
                           jnp.asarray(fnr[ks], jnp.float32),
                           jnp.asarray(fnc[ls], jnp.float32)))
        ok = np.array_equal(got, np.asarray(want, np.float32))
        print(f"phase1 {axes} kind={combine_kind(dr, dc, vmax)}: "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            bad = np.flatnonzero(got != np.asarray(want, np.float32))[:5]
            for t in bad:
                print("  t", t, "want", want[t], "got", got[t])
            raise SystemExit(1)


def phase2():
    import dataclasses
    from waldboost_tpu import model as M
    from waldboost_tpu.channels import _normalize_opts

    for hw, smooth in [((96, 128), 0), ((96, 128), 1), ((240, 320), 1)]:
        h, w = hw
        opts = dict(shrink=2, n_per_oct=4, smooth=smooth,
                    channels="grad_hist")
        shrink, n_per_oct, sm, cf = _normalize_opts(opts)
        packed = M._packed_plan_cached(h, w, shrink, n_per_oct, (12, 12),
                                       halo=cf.halo)
        rng = np.random.RandomState(11)
        img = jnp.asarray(rng.randint(0, 256, (h, w)).astype(np.uint8))
        planes = M._poly_planes(img, cf, packed)
        kern = np.asarray(M._poly_channels(planes, sm, cf, packed))
        cf_nok = dataclasses.replace(cf, poly_kernel=None)
        xla = np.asarray(M._poly_channels(planes, sm, cf_nok, packed))
        ok = np.array_equal(kern, xla)
        print(f"phase2 {hw} smooth={smooth}: {'OK' if ok else 'FAIL'} "
              f"(maxdiff {np.abs(kern - xla).max()})", flush=True)
        if not ok:
            raise SystemExit(1)


def phase3():
    from waldboost_tpu import model as M
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.ops.channels_pallas import plane_pad_geometry

    for hw, npo in [((96, 128), 2), ((240, 320), 4)]:
        h, w = hw
        opts = dict(shrink=2, n_per_oct=npo, smooth=1, channels="grad_hist")
        shrink, n_per_oct, sm, cf = _normalize_opts(opts)
        packed = M._packed_plan_cached(h, w, shrink, n_per_oct, (8, 8),
                                       halo=cf.halo)
        halo_m = packed.halo if (cf.boundary == "reflect" and cf.halo > 0) \
            else 0
        rng = np.random.RandomState(7)
        imgs = jnp.asarray(
            rng.randint(0, 256, (2, h, w)).astype(np.uint8))
        fmats, fspec = M._poly_fused_cached(packed, halo_m, (h, w))
        fused = np.asarray(
            M._poly_planes_fused(imgs, fmats, fspec).astype(jnp.float32))
        mats, spec = M._poly_mats_cached(packed, halo_m, (h, w))
        geom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
        ref = np.asarray(jax.vmap(
            lambda im: M._poly_planes(im, cf, packed, geom=geom,
                                      mats=mats, spec=spec))(imgs)
            .astype(jnp.float32))
        ok = np.array_equal(fused, ref)
        print(f"phase3 {hw} npo={npo}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            d = np.argwhere(fused != ref)
            print("  mismatches", len(d), "first", d[:5])
            raise SystemExit(1)


def phase4():
    """Fully-fused VGA serving (fused planes + channel kernel + static
    cascade + extraction) vs the all-XLA path: identical outputs."""
    from __graft_entry__ import _flagship_model
    from waldboost_tpu import model as M
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    model = _flagship_model()
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randint(0, 256, (2, 480, 640)).astype(np.uint8))
    try:
        M.set_channel_backend("xla")
        M.set_cascade_backend("static")
        fn, _ = make_batched_detector_boxes(model, (480, 640), k=256,
                                            nms_iou=None, with_n_weak=False)
        ref = [np.asarray(x) for x in fn(imgs)]
        M.set_channel_backend("pallas")
        fn2, _ = make_batched_detector_boxes(model, (480, 640), k=256,
                                             nms_iou=None,
                                             with_n_weak=False)
        got = [np.asarray(x) for x in fn2(imgs)]
    finally:
        M.set_channel_backend("auto")
        M.set_cascade_backend("auto")
    ok = all(np.array_equal(a, b) for a, b in zip(ref, got)) \
        and ref[3].sum() > 0
    print(f"phase4 VGA fused-vs-xla serving outputs: "
          f"{'OK' if ok else 'FAIL'} (survivors {int(ref[3].sum())})",
          flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    phase1()
    phase2()
    phase3()
    phase4()
    print("ALL OK", flush=True)
