import numpy as np
import pytest

import waldboost_tpu as wb
from waldboost_tpu import testing as wt
from waldboost_tpu.boxes import Boxes


def test_precision_recall_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    for _ in range(5):
        y = rng.rand(60) > 0.5
        s = rng.randn(60) + y
        p1, r1, t1 = sk.precision_recall_curve(y, s)
        p2, r2, t2 = wt.precision_recall(y, s)
        np.testing.assert_allclose(p1, p2)
        np.testing.assert_allclose(r1, r2)
        np.testing.assert_allclose(t1, t2)
        assert sk.auc(r1, p1) == pytest.approx(wt.auc(r2, p2))


def test_evaluator_perfect_detector():
    E = wt.Evaluator()
    for i in range(3):
        gt = Boxes(np.array([[10, 10, 30, 30]], "f"), ignore=np.array([0]))
        dt = Boxes(np.array([[10, 10, 30, 30]], "f"), scores=np.array([5.0]))
        E.add_ground_truth(i, gt, (100, 100))
        E.add_detections(i, dt)
    r = E.evaluate()
    assert r["auc"] == pytest.approx(1.0)
    assert r["n_eval"] == 3 and r["n_ign"] == 0


def test_evaluator_ignores_out_of_image_gt():
    E = wt.Evaluator()
    gt = Boxes(np.array([[10, 10, 30, 30], [90, 90, 140, 140]], "f"),
               ignore=np.array([0, 0]))
    dt = Boxes(np.array([[10, 10, 30, 30]], "f"), scores=np.array([1.0]))
    E.add_ground_truth(0, gt, (100, 100))
    E.add_detections(0, dt)
    r = E.evaluate(min_gt_area_in_image=1)
    assert r["n_ign"] == 1  # the half-out-of-image GT box


def test_evaluate_model_on_fake_data():
    from waldboost_tpu.utils import fake_data_generator
    from test_model import make_model
    model = make_model(n_stages=2, shape=(8, 8, 4),
                       opts=dict(shrink=2, n_per_oct=2, smooth=1,
                                 channels="grad_hist"))
    gen = fake_data_generator(seed=5)
    E = wt.evaluate_model(gen, model, num_images=2)
    r = E.evaluate()
    assert 0.0 <= r["auc"] <= 1.0
    assert set(r) >= {"precision", "recall", "threshold", "auc"}


def test_random_iterator():
    out = list(wt.random_iterator([1, 2, 3], maxlen=7))
    assert len(out) == 8  # maxlen semantics: stops when i > maxlen
    assert set(out) <= {1, 2, 3}
    with pytest.raises(TypeError):
        next(wt.random_iterator(iter([1, 2])))
