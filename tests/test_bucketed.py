"""Bucketed arbitrary-size serving: one compiled program per size bucket,
TRUE-SIZE detection semantics.

Anchor: the reference handles any image size because it is interpreted and
re-plans the pyramid per size (/root/reference/waldboost/channels.py:93-146);
a compiled detector fleet must not recompile per novel camera resolution AND
must not change the answer.  The bucket program feeds per-real-size geometry
(exact resize taps, masks, level maps) as runtime operands, so
``BucketedDetector.detect(img)`` is bit-identical to ``Model.detect(img)``.
"""

import sys

import numpy as np


def _model(channels="grad_hist", smooth=1, shape=(8, 8, 4)):
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model

    opts = dict(shrink=2, n_per_oct=4, smooth=smooth, channels=channels)
    return _flagship_model(seed=0, n_stages=12, shape=shape,
                           image_hw=(96, 128), channel_opts=opts)


def _box_set(boxes):
    return set(map(tuple, np.concatenate(
        [boxes.get(), boxes.get_field("scores")[:, None]], 1)))


def test_bucketed_true_size_exact_and_shares_programs():
    from waldboost_tpu.parallel.detect import BucketedDetector

    model = _model()
    det = BucketedDetector(model, bucket=64, k=256)
    rng = np.random.RandomState(2)
    # three DIFFERENT sizes in the same (128, 128) bucket + one in another
    img_a = rng.randint(0, 256, (90, 120)).astype(np.uint8)
    img_b = rng.randint(0, 256, (101, 127)).astype(np.uint8)
    img_d = rng.randint(0, 256, (65, 70)).astype(np.uint8)
    img_c = rng.randint(0, 256, (150, 200)).astype(np.uint8)
    out = det.detect_many([img_a, img_b, img_d, img_c])
    assert det.compiles == 2  # (128, 128) shared by a+b+d; (192, 256) for c

    # TRUE-SIZE semantics: bit-identical to the per-size exact path on the
    # ORIGINAL image (boxes AND scores) — not to detection on the padding
    for img, boxes in zip([img_a, img_b, img_d, img_c], out):
        want = model.detect(img)
        assert _box_set(want) == _box_set(boxes), \
            (img.shape, len(want), len(boxes))
        if len(boxes):
            rr = boxes.get()
            assert (rr[:, 2] <= img.shape[1] + 1e-3).all()
            assert (rr[:, 3] <= img.shape[0] + 1e-3).all()

    # repeated detects reuse the compiled programs; novel sizes inside a
    # known bucket cost geometry only, never a compile
    det.detect(img_b)
    det.detect(rng.randint(0, 256, (77, 99)).astype(np.uint8))
    assert det.compiles == 2


def test_bucketed_true_size_float_images():
    from waldboost_tpu.parallel.detect import BucketedDetector

    model = _model()
    det = BucketedDetector(model, bucket=64, k=256)
    rng = np.random.RandomState(5)
    img = rng.rand(90, 115).astype(np.float32) * 255.0
    got = det.detect(img)
    want = model.detect(img)
    assert _box_set(want) == _box_set(got)


def test_bucketed_float_fast_mode_bounded_deviation():
    """WB_SERVING_MODE=fast on a float image: the bucket's XLA chain runs
    plain f32 channels (CanvasCtx.fast — no dd) and the cascade kernel
    ingests bf16; boxes must stay close to the exact bucketed path's."""
    import os

    from waldboost_tpu.parallel.detect import BucketedDetector

    model = _model()
    rng = np.random.RandomState(6)
    img = rng.rand(90, 115).astype(np.float32) * 255.0
    exact = BucketedDetector(model, bucket=64, k=256).detect(img)
    os.environ["WB_SERVING_MODE"] = "fast"
    try:
        fast = BucketedDetector(model, bucket=64, k=256).detect(img)
    finally:
        os.environ.pop("WB_SERVING_MODE", None)
    se, sf = _box_set(exact), _box_set(fast)
    assert len(se ^ sf) <= 0.25 * max(len(se), 1), (len(se ^ sf), len(se))


def test_bucketed_grad_mag_midpipeline_reflect():
    # grad_mag re-reflects the magnitude before its normalization conv
    # (halo 6) — exercises the runtime reflection permutation
    from waldboost_tpu.parallel.detect import BucketedDetector

    model = _model(channels="grad_mag", shape=(8, 8, 1))
    det = BucketedDetector(model, bucket=64, k=256)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (87, 113)).astype(np.uint8)
    got = det.detect(img)
    want = model.detect(img)
    assert _box_set(want) == _box_set(got)


def test_bucketed_mesh_matches_unmeshed():
    """BucketedDetector(mesh=...) must return exactly the no-mesh boxes
    (data parallelism over the group batch changes the device layout,
    never the answer) — CPU-mesh equality backing the dryrun's
    BucketedDetector(mesh) leg (VERDICT r3 #4)."""
    import jax
    import pytest

    from waldboost_tpu.parallel.bucket import BucketedDetector
    from waldboost_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(4)
    model = _model()
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (45, 60)).astype(np.uint8)
            for _ in range(4)]
    plain = BucketedDetector(model, bucket=32, k=128).detect_many(imgs)
    meshed = BucketedDetector(model, bucket=32, k=128,
                              mesh=mesh, max_batch=4).detect_many(imgs)
    assert len(plain) == len(meshed) == 4
    for a, b in zip(plain, meshed):
        assert _box_set(a) == _box_set(b)


def test_bucketed_track_cost_matches_detect():
    """track_cost=True folds the kernel's per-image weak-eval counts into
    the model's counters with the same totals Model.detect records (the
    runtime-geometry path scans the same windows with the same rejection)."""
    from waldboost_tpu.parallel.bucket import BucketedDetector

    model = _model()
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (45, 60)).astype(np.uint8)

    model.reset()
    ref_boxes = model.detect(img)
    ref_weak, ref_loc = model.n_weak, model.n_loc

    model.reset()
    det = BucketedDetector(model, bucket=32, k=128, track_cost=True)
    got_boxes = det.detect(img)
    assert _box_set(got_boxes) == _box_set(ref_boxes)
    assert model.n_loc == ref_loc
    assert model.n_weak == ref_weak
    assert model.cost_stats()["n_images"] == 1
