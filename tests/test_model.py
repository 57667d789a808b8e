import numpy as np
import pytest

import waldboost_tpu as wb
from waldboost_tpu.training import DTree

from test_cascade import random_stage


def make_model(n_stages=6, shape=(8, 8, 4), seed=0, with_theta=True,
               opts=None):
    rng = np.random.RandomState(seed)
    opts = opts or dict(shrink=2, n_per_oct=4, smooth=1, channels="grad_hist")
    model = wb.Model(shape, opts)
    for t in range(n_stages):
        s = random_stage(rng, shape[:2], shape[2])
        s["threshold"] = (rng.rand(len(s["threshold"])) * 0.4).astype("f")
        theta = -np.inf
        if with_theta and t % 2 == 1:
            theta = -0.8 - 0.1 * t
        tree = DTree([tuple(f) for f in s["feature"]], s["threshold"],
                     s["left"], s["right"], s["prediction"])
        model.append(tree, theta)
    return model


def test_detect_matches_per_level_loop():
    """Packed-canvas detect must produce exactly the per-level reference loop's
    box set (/root/reference/waldboost/model.py:149-179)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (96, 112)).astype(np.uint8)
    model = make_model()

    got = model.detect(img)

    # reference-style per-level loop using the same public APIs
    want = []
    for chns, scale in model.channels(img):
        r, c, h = model.predict_on_image(chns)
        b = model.get_boxes(r, c, scale)
        b.set_field("scores", h)
        want.append(b)
    want = wb.bbx.concatenate(want)

    assert len(got) == len(want)
    # order may differ: compare as multisets of rounded rows
    def keyset(bx):
        arr = np.concatenate([bx.get(), bx.get_field("scores").reshape(-1, 1)], axis=1)
        return set(map(tuple, np.round(arr, 3).tolist()))
    assert keyset(got) == keyset(want)


def test_detect_empty_model_scores_zero():
    img = np.random.RandomState(0).randint(0, 256, (40, 40)).astype(np.uint8)
    model = wb.Model((8, 8, 4), dict(shrink=2, n_per_oct=2, smooth=0,
                                     channels="grad_hist"))
    out = model.detect(img)
    assert len(out) > 0
    assert (out.get_field("scores") == 0).all()


def test_eval_cost_accumulates():
    img = np.random.RandomState(2).randint(0, 256, (64, 64)).astype(np.uint8)
    model = make_model(opts=dict(shrink=2, n_per_oct=2, smooth=1,
                                 channels="grad_hist"))
    model.reset()
    model.detect(img)
    assert model.n_loc > 0
    assert 0 < model.eval_cost <= len(model)


def test_proto_roundtrip(tmp_path):
    model = make_model()
    p = tmp_path / "m.pb"
    model.save(str(p))
    m2 = wb.load(str(p))
    assert m2.shape == model.shape
    assert len(m2) == len(model)
    assert m2.channel_opts["shrink"] == model.channel_opts["shrink"]
    assert m2.channel_opts["channels"].name == model.channel_opts["channels"].name
    for (w1, t1), (w2, t2) in zip(model, m2):
        assert t1 == pytest.approx(t2) or (np.isneginf(t1) and np.isneginf(t2))
        np.testing.assert_array_equal(w1.feature, w2.feature)
        np.testing.assert_allclose(w1.threshold, w2.threshold, rtol=1e-6)
        np.testing.assert_array_equal(w1.left, w2.left)
        np.testing.assert_array_equal(w1.right, w2.right)
        np.testing.assert_allclose(w1.prediction, w2.prediction, rtol=1e-6)

    img = np.random.RandomState(3).randint(0, 256, (48, 48)).astype(np.uint8)
    b1 = model.detect(img)
    b2 = m2.detect(img)
    np.testing.assert_allclose(b1.get(), b2.get())
    np.testing.assert_allclose(b1.get_field("scores"), b2.get_field("scores"))


def test_predict_shape_validation():
    model = make_model()
    with pytest.raises(AssertionError):
        model.predict(np.zeros((2, 4, 4, 4), "f"))


def test_two_phase_detect_matches_dense():
    """The two-phase (lockstep prefix + compacted suffix) path must return
    exactly the dense lockstep path's survivor set and scores."""
    from waldboost_tpu import model as wm
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (96, 112)).astype(np.uint8)
    # 20 stages (> prefix) with thetas that reject most windows early
    model = make_model(n_stages=20, shape=(8, 8, 4), seed=12, with_theta=False,
                       opts=dict(shrink=2, n_per_oct=3, smooth=1,
                                 channels="grad_hist"))
    base = model.detect(img)  # calibrate thetas from real score scale
    q = np.quantile(base.get_field("scores"), 0.7)
    model.theta = [(-np.inf if t < 2 else float(q)) for t in range(20)]
    model._version += 1

    two = model.detect(img)  # uses the two-phase path (20 > prefix)
    old = wm.TWO_PHASE_PREFIX
    try:
        wm.TWO_PHASE_PREFIX = 10 ** 9  # force dense path
        dense = model.detect(img)
    finally:
        wm.TWO_PHASE_PREFIX = old
    assert len(two) == len(dense)
    def keyset(bx):
        arr = np.concatenate([bx.get(), bx.get_field("scores").reshape(-1, 1)], 1)
        return set(map(tuple, np.round(arr, 3).tolist()))
    assert keyset(two) == keyset(dense)


def test_two_phase_overflow_falls_back():
    """With every window surviving phase 1 (capacity overflow), detect must
    fall back to the dense path and still return the full survivor set."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (64, 72)).astype(np.uint8)
    model = make_model(n_stages=16, shape=(8, 8, 4), seed=14, with_theta=False,
                       opts=dict(shrink=2, n_per_oct=2, smooth=0,
                                 channels="grad_hist"))
    # thetas -inf: every valid window survives -> way beyond capacity
    out = model.detect(img)
    n_valid = 0
    from waldboost_tpu.model import _packed_plan_cached
    from waldboost_tpu.channels import _normalize_opts
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(64, 72, shrink, n_per_oct, (8, 8),
                                 halo=cf.halo)
    n_valid = int(packed.valid_mask((8, 8)).sum())
    assert len(out) == n_valid  # full survivor set despite overflow


def test_multi_model_detect():
    img = np.random.RandomState(4).randint(0, 256, (48, 56)).astype(np.uint8)
    m1 = make_model(n_stages=3, seed=5)
    m2 = make_model(n_stages=3, seed=6)
    out = wb.detect(img, m1, m2, response_scale=[1.0, 2.0])
    assert out.has_field("label")
    labels = out.get_field("label")
    assert set(np.unique(labels)) <= {0, 1}

    # single-model wb.detect equals Model.detect
    one = wb.detect(img, m1)
    direct = m1.detect(img)
    assert len(one) == len(direct)
