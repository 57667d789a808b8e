"""Fast-serving float path: throughput + deviation vs the exact float path.

Round-5 follow-up to exp_r12_floatcost.py (exact float serving measured
208.1 vs 1173.0 MP/s uint8 — a 5.6x dd-contract tax).  With
WB_SERVING_MODE=fast, float frames now ride the SAME fused pipeline as
uint8: bf16 planes (default-precision selection einsums — the in-pass
bf16 rounding is the mode's input quantization — plain f32 lerp,
polyphase._combine_block_plain) into the fast channel kernel (plain f32
chains, bf16 canvas) and the bf16-ingest cascade kernel.

Two plane variants (WB_FAST_FLOAT, resolved at build time):
  f32 (default) — exact HIGHEST one-hot selection, plain f32 lerp, f32
      planes into the kernel's plain chains;
  bf16 — content quantized to bf16 planes (single-pass selection), the
      exact uint8 kernel layout.  First TPU run measured the bf16
      variant at 900.2 MP/s with a 20.7% scene box-flip rate vs
      exact-float (flips too coarse for a default — hence f32).

Measures, on the trained flagship at VGA batch 96, for each variant:
  1. float32 fast throughput (vs the exact float + exact uint8 records)
  2. box flip rate + score deltas, fast-float vs exact-float, on scene
     frames (utils.scene_generator content cast to float32)

  nohup python scripts/exp_r13_floatfast.py > /tmp/exp_floatfast.log 2>&1 &
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(model, mode, batch_hw, k=128, nms_iou=0.5):
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes
    prev = os.environ.get("WB_SERVING_MODE")
    os.environ["WB_SERVING_MODE"] = mode
    try:
        fn, _ = make_batched_detector_boxes(model, batch_hw, k=k,
                                            nms_iou=nms_iou,
                                            with_n_weak=False)
    finally:
        if prev is None:
            os.environ.pop("WB_SERVING_MODE", None)
        else:
            os.environ["WB_SERVING_MODE"] = prev
    return fn


def main():
    import jax
    import jax.numpy as jnp

    import waldboost_tpu as wb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = wb.load(os.path.join(root, "models", "flagship_synth_64.pb"))
    sys.path.insert(0, root)
    import bench

    h, w = 480, 640
    batch, iters, warmup, reps = 96, 16, 2, 3

    @jax.jit
    def _force(rects, valid, count):
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    from waldboost_tpu.utils import scene_generator
    gen = scene_generator(seed=123, hw=(h, w))
    frames = np.stack([np.asarray(next(gen)["image"], np.float32)
                       for _ in range(48)])
    fn_exact = _build(model, "exact", (h, w))

    rng = np.random.RandomState(0)
    for variant in ("f32", "bf16"):
        prev = os.environ.get("WB_FAST_FLOAT")
        os.environ["WB_FAST_FLOAT"] = variant
        try:
            fn_fast = _build(model, "fast", (h, w))
        finally:
            if prev is None:
                os.environ.pop("WB_FAST_FLOAT", None)
            else:
                os.environ["WB_FAST_FLOAT"] = prev

        def run(images):
            rects, scores, valid, count, _ = fn_fast(images)
            return _force(rects, valid, count)

        batches = [jnp.asarray(rng.randint(0, 256, (batch, h, w))
                               .astype(np.float32))
                   for _ in range(iters * reps + warmup)]
        dt = bench._timeit(run, batches, iters, warmup, reps=reps)
        mps = h * w / 1e6 * batch * iters / dt
        print(json.dumps({"input": "float32", "mode": "fast",
                          "planes": variant, "mps": round(mps, 1)}),
              flush=True)

        # --- deviation: fast-float vs exact-float on scene frames ---
        total_e = flips = 0
        score_ds = []
        nb = 8
        for i in range(0, len(frames), nb):
            fb = jnp.asarray(frames[i:i + nb])
            oe = fn_exact(fb)
            of = fn_fast(fb)
            for b in range(fb.shape[0]):
                def boxes(o):
                    rects, scores, valid, _cnt, _ = o
                    v = np.asarray(valid[b])
                    r = np.asarray(rects[b])[v]
                    s = np.asarray(scores[b])[v]
                    return {tuple(np.round(x, 1)): float(sc)
                            for x, sc in zip(r, s)}
                be, bf = boxes(oe), boxes(of)
                total_e += len(be)
                flips += len(set(be) ^ set(bf))
                score_ds += [abs(be[kk] - bf[kk])
                             for kk in set(be) & set(bf)]
        print(json.dumps({
            "planes": variant,
            "scene_frames": len(frames), "exact_boxes": total_e,
            "flips": flips,
            "flip_rate": round(flips / max(total_e, 1), 4),
            "score_delta_mean": round(float(np.mean(score_ds)), 4)
            if score_ds else None,
            "score_delta_max": round(float(np.max(score_ds)), 4)
            if score_ds else None,
        }), flush=True)


if __name__ == "__main__":
    main()
