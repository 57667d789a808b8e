"""Benchmarks for the five BASELINE.json configs on one chip.

Prints one JSON line per config ({"metric", "value", "unit", "vs_baseline"});
the HEADLINE config — VGA full-pyramid detection (BASELINE.json config 2) —
prints LAST so the driver parses it.  vs_baseline is relative to the
driver-set north star of 1000 MP/s/chip (BASELINE.json:5; the CPU reference
publishes no numbers, BASELINE.md).

Configs (BASELINE.json:6-12):
  1. vga_single_scale — 12x12x4 grad_hist stump model, 640x480, one scale
  2. vga_full_pyramid — shrink=2/n_per_oct=8/smooth=1 pyramid, 64-stage
     depth-2 cascade, on-device box extraction + NMS  [HEADLINE].  The
     headline cascade is the committed REALLY-TRAINED flagship
     (models/flagship_synth_64.pb, scripts/train_flagship.py — AUC 0.903
     on the held-out synthetic corpus): a detector framework's honest
     number runs under real trained rejection dynamics.  The synthetic
     quantile-calibrated cascade that headlined rounds 1-2 stays as the
     `synthetic_calibrated_throughput` diagnostic (training-independent
     kernel regression tracking).
  3. fhd_stream_depth2 — depth-2 trees, batched 1920x1080 stream
  4. train_loop — SamplePool + Learner.fit_stage (alpha=0.2), synthetic data
  5. fpga_4k — quantized integer channels, multi-channel
     grad_hist_4_u1+grad_mag_u1 (C=5), 3840x2160, NMS on; plus a smooth=1
     variant (fpga_4k_smooth)

Every iteration uses distinct inputs (the axon runtime dedupes identical
executions); timing drains the FIFO by fetching a scalar from the last
result (block_until_ready is unreliable through the tunnel).
"""

import json
import os
import time
import traceback

import numpy as np

NORTH_STAR = 1000.0  # MP/s/chip (BASELINE.json:5)


def _timeit(fn, batches, iters, warmup, reps=1):
    """Time ``reps`` segments of ``iters`` dispatches each and return the
    MINIMUM segment time (scripts/trace_serving.py: one-off timings swing
    +-15% run to run under tunnel/host load; 2-3 rep minima are stable).
    Every dispatch gets a distinct input — the axon runtime dedupes
    identical executions, so inputs must never repeat across reps."""
    out = fn(batches[0])
    _ = float(out)
    for i in range(1, warmup):
        out = fn(batches[i])
    _ = float(out)
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(batches[warmup + r * iters + i])
        _ = float(last)
        best = min(best, time.perf_counter() - t0)
    return best


def _detect_mps(model, h, w, batch, iters, warmup, nms_iou=None, k=128,
                k_row=16, reps=1, frames=None, fast=False, as_float=False):
    """End-to-end batched detection throughput: channels + cascade +
    on-device box extraction (+ optional on-device NMS).

    ``frames``: optional (N, h, w) uint8 pool of frames to cycle through
    (default: fresh uniform noise per dispatch).  ``fast``: build the
    detector under WB_SERVING_MODE=fast (bf16 serving kernels — the opt-in
    non-bit-exact mode; the env is resolved at build time)."""
    import jax
    import jax.numpy as jnp

    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    # with_n_weak=False: serving parity with the reference's detect (boxes +
    # scores only; the evaluation counter is an eval_cost diagnostic)
    prev = os.environ.get("WB_SERVING_MODE")
    if fast:
        os.environ["WB_SERVING_MODE"] = "fast"
    try:
        fn, _ = make_batched_detector_boxes(model, (h, w), k=k, k_row=k_row,
                                            nms_iou=nms_iou,
                                            with_n_weak=False)
    finally:
        if fast:
            if prev is None:
                os.environ.pop("WB_SERVING_MODE", None)
            else:
                os.environ["WB_SERVING_MODE"] = prev

    # one jitted reduce (vs three eager ops = three extra dispatches per
    # iteration through the tunnel); it forces materialization of every
    # output without transferring them
    @jax.jit
    def _force(rects, valid, count):
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    def run(images):
        rects, scores, valid, count, _ = fn(images)
        return _force(rects, valid, count)

    rng = np.random.RandomState(0)
    n_batches = iters * reps + warmup
    idt = np.float32 if as_float else np.uint8
    if frames is None:
        batches = [
            jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(idt))
            for _ in range(n_batches)
        ]
    else:
        # cycle the frame pool with a distinct rotation per batch (the axon
        # runtime dedupes identical executions — no two batches may match)
        N = frames.shape[0]
        batches = []
        for i in range(n_batches):
            idx = (np.arange(batch) * 7 + i * 13) % N
            batches.append(jnp.asarray(frames[idx]))
    dt = _timeit(run, batches, iters, warmup, reps=reps)
    return h * w / 1e6 * batch * iters / dt


def bench_vga_single_scale(batch, iters, warmup, reps=1):
    """Config 1: stump model, single 640x480 image, ONE pyramid scale.

    Runs the fused serving pipeline capped at the first pyramid level
    (make_batched_detector_boxes(n_scales=1) — exact vs the reference-
    style predict_on_image on the first channel_pyramid scale,
    tests/test_parallel.py::test_n_scales_capped_detector_matches_first_scale).
    History: a hand-rolled XLA chain benched 2335 in r4, but that number
    rode a pre-round-5 uncontracted plain-float path (a stray f32
    pre-cast); with contracts everywhere the XLA chain measures 1870
    (uint8 exact) / 1836 (float dd), and the fused-kernel path below is
    the honest fast way to serve it."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    h, w = 480, 640
    model = _flagship_model(n_stages=64, depth=1)
    fn, _ = make_batched_detector_boxes(model, (h, w), k=128,
                                        with_n_weak=False, n_scales=1)

    @jax.jit
    def _force(rects, valid, count):
        return (valid.sum().astype(jnp.float32) + rects.sum()
                + count.sum().astype(jnp.float32))

    def run(images):
        rects, scores, valid, count, _ = fn(images)
        return _force(rects, valid, count)

    rng = np.random.RandomState(0)
    batches = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(iters * reps + warmup)
    ]
    dt = _timeit(run, batches, iters, warmup, reps=reps)
    return h * w / 1e6 * batch * iters / dt


def bench_vga_full_pyramid(batch, iters, warmup, reps=1):
    """Config 2 (HEADLINE): full pyramid + the committed trained 64-stage
    depth-2 cascade + on-device extraction + NMS."""
    import waldboost_tpu as wb

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "models", "flagship_synth_64.pb")
    model = wb.load(path)
    return _detect_mps(model, 480, 640, batch, iters, warmup, nms_iou=0.5,
                       reps=reps)


def bench_vga_full_pyramid_fast(batch, iters, warmup, reps=1):
    """Config 2, WB_SERVING_MODE=fast: the opt-in bf16 serving mode (no
    exactness contract — deviation quantified in BASELINE.md's fast-mode
    table).  Same trained flagship, same pipeline, fast kernels."""
    import waldboost_tpu as wb

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "models", "flagship_synth_64.pb")
    model = wb.load(path)
    return _detect_mps(model, 480, 640, batch, iters, warmup, nms_iou=0.5,
                       reps=reps, fast=True)


def bench_float_image_fast(batch, iters, warmup, reps=1):
    """Config 2f: float32 frames under WB_SERVING_MODE=fast.  Exact float
    serving pays the dd double-float contract (measured 208 vs 1173 MP/s,
    BASELINE.md float-path record); fast mode routes float content through
    the same fused bf16 plane + kernel pipeline as uint8
    (polyphase._combine_block_plain)."""
    import waldboost_tpu as wb

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "models", "flagship_synth_64.pb")
    model = wb.load(path)
    return _detect_mps(model, 480, 640, batch, iters, warmup, nms_iou=0.5,
                       reps=reps, fast=True, as_float=True)


def _scene_frames(n=64, hw=(480, 640), seed=100):
    """Fixed seeded corpus of OBJECT-BEARING VGA frames (multi-scale
    rectangles + clutter, utils.scene_generator) — the honest-workload
    counterpart of the uniform-noise headline (VERDICT r4 weak #2: noise
    frames reward rejection aggressiveness; scene frames measure the
    detector doing work: flagship eval_cost 1.22 on noise vs 2.38 on
    scenes, BASELINE.md)."""
    from waldboost_tpu.utils import scene_generator
    gen = scene_generator(seed=seed, hw=hw)
    return np.stack([next(gen)["image"] for _ in range(n)])


def bench_scene_frames(batch, iters, warmup, reps=1):
    """Config 2s: the trained flagship on scene frames (objects present)."""
    import waldboost_tpu as wb

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "models", "flagship_synth_64.pb")
    model = wb.load(path)
    return _detect_mps(model, 480, 640, batch, iters, warmup, nms_iou=0.5,
                       reps=reps, frames=_scene_frames())


def bench_synthetic_calibrated(batch, iters, warmup, reps=1):
    """Config 2 diagnostic: the synthetic quantile-calibrated cascade of
    __graft_entry__ (random trees over real channel statistics, survivor-
    quantile thetas) on the same VGA full-pyramid pipeline — tracks kernel
    regressions independently of any training run."""
    from __graft_entry__ import _flagship_model
    model = _flagship_model()
    return _detect_mps(model, 480, 640, batch, iters, warmup, nms_iou=0.5,
                       reps=reps)


def bench_fhd_stream_depth2(batch, iters, warmup, reps=1):
    """Config 3: depth-2 trees over 1080p image streams."""
    from __graft_entry__ import _flagship_model
    model = _flagship_model(image_hw=(540, 960))
    return _detect_mps(model, 1080, 1920, batch, iters, warmup, nms_iou=0.5,
                       reps=reps)


def bench_fpga_4k(batch, iters, warmup, smooth=0, reps=1):
    """Config 5 as written (BASELINE.json:11): FPGA quantized integer
    channels + multi-channel (grad_hist_4_u1 + grad_mag_u1, C=5) on 4K
    frames, NMS on.  ``smooth=1`` additionally measures the in-kernel
    3x3/16 smooth variant (the full reference channel contract)."""
    from __graft_entry__ import _flagship_model
    opts = dict(shrink=2, n_per_oct=4, smooth=smooth,
                channels="grad_hist_4_u1+grad_mag_u1")
    model = _flagship_model(channel_opts=opts, image_hw=(540, 960),
                            shape=(12, 12, 5))
    return _detect_mps(model, 2160, 3840, batch, iters, warmup, nms_iou=0.5,
                       reps=reps)


def bench_train_loop(n_stages=6, reps=1):
    """Config 4: WaldBoost training-loop throughput (stages/min) on the
    synthetic dataset — pool mining + device histogram tree fit + SPRT
    (the HOST-pool reference-parity path).  Best of ``reps`` segments of
    ``n_stages`` each (host/tunnel load swings one-off segments)."""
    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator

    gen = fake_data_generator(seed=11)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    pool = wb.SamplePool(min_tp=1000, min_fp=1000, seed=0)
    learner = wb.Learner(alpha=0.2, max_depth=2)
    # stage 0 pays all compilation; time the steady-state stages
    wb.train(model, gen, pool=pool, learner=learner, length=2)
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        wb.train(model, gen, pool=pool, learner=learner,
                 length=2 + (r + 1) * n_stages)
        best = min(best, time.perf_counter() - t0)
    return n_stages / best * 60.0


def bench_train_loop_device_pool(n_stages=12, reps=1):
    """Config 4b: the TPU-native trainer (device-resident sample pool, the
    whole numeric stage as one program, batched+prefetched mining with
    bit-packed survivor maps) — wb.train's mesh path on one device."""
    import waldboost_tpu as wb
    from waldboost_tpu.parallel.trainer import train_sharded
    from waldboost_tpu.utils import fake_data_generator

    gen = fake_data_generator(seed=11)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    learner = wb.Learner(alpha=0.2, max_depth=2)
    from waldboost_tpu.io import prefetch_iterable
    gen = prefetch_iterable(gen, depth=32)
    # the pools dict carries the device-resident pool across segments —
    # the same steady-state contract as the host-pool config, which reuses
    # its SamplePool (a fresh pool per segment would re-measure bootstrap
    # mining, not the training loop)
    pools = {}
    # the warmup segment prewarms every length bucket the measured
    # segments will cross (its end-of-call join absorbs the compiles)
    train_sharded(model, gen, mesh=None, learner=learner, length=2,
                  min_tp=1000, min_fp=1000, seed=0, pools=pools,
                  prewarm_length=2 + reps * n_stages)
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        train_sharded(model, gen, mesh=None, learner=learner,
                      length=2 + (r + 1) * n_stages,
                      min_tp=1000, min_fp=1000, seed=0, pools=pools)
        best = min(best, time.perf_counter() - t0)
    return n_stages / best * 60.0


def main():
    only = os.environ.get("BENCH_CONFIGS", "all")
    # batch 192 amortizes the per-batch dispatch gap best at the round-3
    # trained-cascade speeds (measured twice on the headline config:
    # 1197.5/1194.0 MP/s at 192 vs 1168 at 96, 1161 at 128, 1169 at 256;
    # earlier rounds favored 96 when kernels were slower).  The FHD/4K
    # batches below stay at their own measured optima (16 / 8), decoupled
    # from this default.
    batch = int(os.environ.get("BENCH_BATCH", "192"))
    # 16+ iterations: the axon tunnel's first dispatches after a compile are
    # erratically slow; 8-iter runs under-measure steady state by ~20%
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    # best-of-N segments (VERDICT r2 weak #2: one-off timings swing +-15%
    # under host load; trace_serving.py's rep-minima practice)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    warmup = 2

    def add(name, fn, unit="MP/s/chip", baseline=NORTH_STAR):
        if only != "all" and name not in only:
            return
        try:
            value = fn()
            # print immediately (a crashing later config must not lose
            # earlier results); the headline runs last so the driver's
            # last-JSON-line parse still lands on it
            rec = {"metric": name, "value": round(value, 2), "unit": unit,
                   "vs_baseline": (round(value / baseline, 4)
                                   if baseline else None)}
            print(json.dumps(rec), flush=True)
        except Exception:
            traceback.print_exc()

    # single-scale rides the fused n_scales=1 serving path since round 5;
    # batch sweep: 5186 / 6255 / 6244 / 6364 MP/s at 96 / 192 / 256 / 384
    ss_batch = int(os.environ.get("BENCH_BATCH_SINGLE", "384"))
    add("single_scale_detection_throughput",
        lambda: bench_vga_single_scale(ss_batch, iters, warmup, reps=reps))
    # FHD/4K batches stay at their measured optima (16 / 8) independent of
    # the headline batch default
    # FHD batch re-swept round 4 after the AND-tree encoding switch
    # (scripts/exp_r10_batchsweep.py): 1189.8 / 1210.2 MP/s at 16 / 24
    # (headline stays at 192: 1201.4/1201.8/1174.0 at 192/224/256)
    fhd_batch = int(os.environ.get("BENCH_BATCH_FHD", "24"))
    fpga_batch = int(os.environ.get("BENCH_BATCH_4K", "8"))
    add("fhd_depth2_stream_throughput",
        lambda: bench_fhd_stream_depth2(fhd_batch, iters, warmup,
                                        reps=reps))
    add("fpga_4k_quantized_throughput",
        lambda: bench_fpga_4k(fpga_batch, max(iters // 2, 2),
                              warmup, reps=reps))
    add("fpga_4k_smooth_throughput",
        lambda: bench_fpga_4k(fpga_batch, max(iters // 2, 2),
                              warmup, smooth=1, reps=reps))
    # no meaningful reference baseline exists for stages/min (the CPU
    # reference publishes no training numbers): vs_baseline is null
    add("training_loop_throughput",
        lambda: bench_train_loop(reps=min(reps, 2)), unit="stages/min",
        baseline=None)
    add("training_loop_device_pool",
        lambda: bench_train_loop_device_pool(reps=min(reps, 2)),
        unit="stages/min", baseline=None)
    add("synthetic_calibrated_throughput",
        lambda: bench_synthetic_calibrated(batch, iters, warmup, reps=reps))
    # scene-frame honesty metric: the same trained flagship on object-
    # bearing frames (eval_cost ~2.4 vs 1.22 on noise) — guards the
    # headline against rejection-aggressiveness workload drift
    add("scene_frame_detection_throughput",
        lambda: bench_scene_frames(batch, iters, warmup, reps=reps))
    # opt-in fast mode (bf16 serving kernels, no exactness contract)
    add("full_pyramid_fast_throughput",
        lambda: bench_vga_full_pyramid_fast(batch, iters, warmup,
                                            reps=reps))
    # float32 frames under fast mode (exact float serving is the dd
    # double-float path, 208 MP/s — BASELINE.md float-path record).
    # Own batch optimum: f32 planes carry 4x the uint8 input traffic
    # (measured 515.4 at 96 vs 491.3 at 192)
    flt_batch = int(os.environ.get("BENCH_BATCH_FLOAT", "96"))
    add("float_image_fast_throughput",
        lambda: bench_float_image_fast(flt_batch, iters, warmup, reps=reps))
    # headline LAST (the driver parses the final JSON line): the committed
    # trained flagship — rounds 1-2 reported it as
    # trained_cascade_throughput (892.5 in r2) next to a synthetic-cascade
    # headline; the trained detector IS the honest config-2 workload
    add("full_pyramid_detection_throughput",
        lambda: bench_vga_full_pyramid(batch, iters, warmup, reps=reps))


if __name__ == "__main__":
    main()
