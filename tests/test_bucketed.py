"""Bucketed arbitrary-size serving: one compiled program per size bucket.

Anchor: the reference handles any image size because it is interpreted
(/root/reference/waldboost/channels.py:111-146); a compiled detector fleet
must not recompile per novel camera resolution.
"""

import sys

import numpy as np


def _model():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model

    opts = dict(shrink=2, n_per_oct=4, smooth=1, channels="grad_hist")
    return _flagship_model(seed=0, n_stages=12, shape=(8, 8, 4),
                           image_hw=(96, 128), channel_opts=opts)


def test_bucketed_shares_programs_and_crops_to_extent():
    from waldboost_tpu.parallel.detect import BucketedDetector

    model = _model()
    det = BucketedDetector(model, bucket=64, k=256)
    rng = np.random.RandomState(2)
    # two NEARBY sizes in the same bucket + one in another bucket
    img_a = rng.randint(0, 256, (90, 120)).astype(np.uint8)
    img_b = rng.randint(0, 256, (101, 127)).astype(np.uint8)
    img_c = rng.randint(0, 256, (150, 200)).astype(np.uint8)
    out = det.detect_many([img_a, img_b, img_c])
    assert det.compiles == 2  # (128, 128) shared by a+b; (192, 256) for c

    # semantics: detect on the zero-padded bucket image, cropped to the
    # real extent — identical to the per-size exact path on that padding
    for img, boxes in zip([img_a, img_b, img_c], out):
        H, W = det._snap(*img.shape)
        padded = np.zeros((H, W), np.uint8)
        padded[:img.shape[0], :img.shape[1]] = img
        want = model.detect(padded)
        r = want.get()
        keep = (r[:, 2] <= img.shape[1]) & (r[:, 3] <= img.shape[0])
        want = want[np.flatnonzero(keep)]
        a = set(map(tuple, np.round(np.concatenate(
            [want.get(), want.get_field("scores")[:, None]], 1), 3)))
        b = set(map(tuple, np.round(np.concatenate(
            [boxes.get(), boxes.get_field("scores")[:, None]], 1), 3)))
        assert a == b, (img.shape, len(a), len(b))
        # every kept box lies inside the real image extent
        if len(boxes):
            rr = boxes.get()
            assert (rr[:, 2] <= img.shape[1] + 1e-3).all()
            assert (rr[:, 3] <= img.shape[0] + 1e-3).all()

    # repeated detects reuse the compiled programs
    det.detect(img_b)
    assert det.compiles == 2
