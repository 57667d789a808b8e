"""TPU validation of the stacked-canvas packer (guillotine shelf->column->
stack) through the fused plane kernels and end-to-end detection.

The stacking generalization changed the fused shelf kernel's store pattern
(pieces trimmed to level rows, static in-stripe offsets instead of
stripe-start-only stores) — a NEW store pattern, so per the chip-wedge
protocol this validates the smallest stacked instance first, then scales:

  stage 1: (160, 256) npo=4  — smallest plan with stacked columns; fused
           planes (WB_PLANE_FUSED=1) bitwise vs the XLA chain (=0).
  stage 2: (480, 640) npo=8  — headline geometry; same bitwise check.
  stage 3: VGA end-to-end boxes with the flagship cascade: stacked plan
           (WB_PACK_TRIALS default) vs FFDH plan (WB_PACK_TRIALS=0) must
           produce identical boxes (plans differ, detections must not).
           Runs in subprocesses: the packer reads WB_PACK_TRIALS at plan
           build and plans are lru_cached per process.

Run detached:  nohup python scripts/exp_r8_stackpack.py > /tmp/exp_stack.log 2>&1 &
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = os.environ.get("STACK_STAGE", "")


def planes_bitwise(h, w, npo):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import waldboost_tpu.model as M
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.ops.channels_pallas import plane_pad_geometry

    opts = dict(shrink=2, n_per_oct=npo, smooth=1, channels="grad_hist")
    shrink, n_per_oct, sm, cf = _normalize_opts(opts)
    packed = M._packed_plan_cached(h, w, shrink, n_per_oct, (8, 8),
                                   halo=cf.halo)
    shares = len(packed.levels) - len({(p.band, p.col)
                                       for p in packed.levels})
    print(f"{h}x{w} npo={npo}: canvas {packed.canvas_h}x{packed.canvas_w}, "
          f"{len(packed.levels)} levels, {shares} stacked", flush=True)
    assert shares > 0, "plan did not stack; nothing to validate"
    halo_m = packed.halo if (cf.boundary == "reflect" and cf.halo > 0) else 0
    geom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    rng = np.random.RandomState(11)
    imgs = jnp.asarray(rng.randint(0, 256, (2, h, w)).astype(np.uint8))
    mats, spec = M._poly_mats_cached(packed, halo_m, (h, w))
    ref = jax.jit(jax.vmap(lambda im: M._poly_planes(
        im, cf, packed, geom=geom, mats=mats, spec=spec)))(imgs)
    fmats, fspec = M._poly_fused_cached(packed, halo_m, (h, w))
    got = M._poly_planes_fused(imgs, fmats, fspec)
    # compare ON DEVICE, fetch one scalar (full canvases crawl through the
    # device->host tunnel at ~40 KB/s); count mismatches for diagnostics
    nbad = int(jax.jit(lambda a, b: (a != b).sum())(ref, got))
    print(f"  fused vs mats: "
          f"{'BITWISE OK' if nbad == 0 else f'{nbad} MISMATCHES'}",
          flush=True)
    if nbad:
        raise SystemExit(1)


def boxes_stage(trials_env):
    import numpy as np
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    H, W = 480, 640
    model = _flagship_model()
    fn, packed = make_batched_detector_boxes(model, (H, W), k=128, k_row=16,
                                             nms_iou=0.5, with_n_weak=False)
    shares = len(packed.levels) - len({(p.band, p.col)
                                       for p in packed.levels})
    print(f"plan: {packed.canvas_h}x{packed.canvas_w}, stacked={shares}, "
          f"WB_PACK_TRIALS={trials_env}", flush=True)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (4, H, W)).astype(np.uint8))
    rects, scores, valid, count, *_ = fn(imgs)
    out = []
    for b in range(4):
        v = np.asarray(valid[b]).astype(bool)
        r = np.asarray(rects[b])[v]
        s = np.asarray(scores[b])[v]
        o = np.lexsort((s, r[:, 0], r[:, 1], r[:, 2], r[:, 3]))
        out.append(np.concatenate([r[o], s[o, None]], axis=1))
    np.save(f"/tmp/stack_boxes_{trials_env}.npy",
            np.concatenate(out), allow_pickle=False)
    print("saved", sum(len(o) for o in out), "boxes", flush=True)


def main():
    if STAGE == "planes_small":
        planes_bitwise(160, 256, 4)
    elif STAGE == "planes_vga":
        planes_bitwise(480, 640, 8)
    elif STAGE.startswith("boxes"):
        boxes_stage(os.environ.get("WB_PACK_TRIALS", "64"))
    else:
        env = dict(os.environ)
        for stage, extra in [("planes_small", {}), ("planes_vga", {}),
                             ("boxes_a", {"WB_PACK_TRIALS": "64"}),
                             ("boxes_b", {"WB_PACK_TRIALS": "0"})]:
            print(f"=== stage {stage}", flush=True)
            e = dict(env, STACK_STAGE=stage, **extra)
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=e)
            if r.returncode:
                raise SystemExit(f"stage {stage} failed")
        import numpy as np
        a = np.load("/tmp/stack_boxes_64.npy")
        b = np.load("/tmp/stack_boxes_0.npy")
        same = a.shape == b.shape and np.array_equal(a, b)
        print("stacked vs FFDH boxes:",
              "IDENTICAL" if same else f"DIFFER {a.shape} vs {b.shape}")
        if not same:
            raise SystemExit(1)
        print("ALL STAGES OK", flush=True)


if __name__ == "__main__":
    main()
