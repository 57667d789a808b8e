import numpy as np
import pytest

from waldboost_tpu import boxes as bbx
from waldboost_tpu.boxes import Boxes


def test_boxes_basic():
    b = Boxes(np.array([[0, 0, 10, 10], [5, 5, 15, 15]], "f"), scores=np.array([1.0, 2.0]))
    assert len(b) == 2
    assert b.num_boxes() == 2
    assert b.has_field("scores")
    np.testing.assert_allclose(b.area(), [100, 100])
    sub = b[np.array([1])]
    assert len(sub) == 1
    np.testing.assert_allclose(sub.get_field("scores"), [2.0])


def test_boxes_1d_rect():
    b = Boxes([0, 0, 4, 6])
    assert b.get().shape == (1, 4)


def test_normalized_scales_coords():
    b = Boxes(np.array([[1, 2, 3, 4]], "f"))
    np.testing.assert_allclose(b.normalized(scale=2.0).get(), [[2, 4, 6, 8]])


def test_iou():
    a = Boxes(np.array([[0, 0, 10, 10]], "f"))
    b = Boxes(np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]], "f"))
    m = bbx.iou(a, b)
    np.testing.assert_allclose(m, [[1.0, 50 / 150, 0.0]], atol=1e-6)


def test_concatenate_field_intersection():
    a = Boxes(np.array([[0, 0, 1, 1]], "f"), scores=[1.0], label=[0])
    b = Boxes(np.array([[1, 1, 2, 2]], "f"), scores=[2.0])
    c = bbx.concatenate([a, b])
    assert len(c) == 2
    assert c.has_field("scores") and not c.has_field("label")


def test_nms():
    rects = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], "f")
    b = Boxes(rects, scores=np.array([0.5, 0.9, 0.3]))
    kept = bbx.non_max_suppression(b, iou_threshold=0.5)
    assert len(kept) == 2
    # the higher-scoring of the overlapping pair survives
    assert 0.9 in kept.get_field("scores")
    assert 0.5 not in kept.get_field("scores")


def test_sort_by_field():
    b = Boxes(np.zeros((3, 4), "f"), scores=np.array([3.0, 1.0, 2.0]))
    s = bbx.sort_by_field(b, "scores")
    np.testing.assert_allclose(s.get_field("scores"), [1, 2, 3])
    s = bbx.sort_by_field(b, "scores", descending=True)
    np.testing.assert_allclose(s.get_field("scores"), [3, 2, 1])


def test_boxes_in_window():
    b = Boxes(np.array([[0, 0, 10, 10], [95, 95, 105, 105]], "f"))
    win = Boxes(np.array([0, 0, 100, 100], "f"))
    inside = bbx.boxes_in_window(b, win, min_overlap=1.0)
    np.testing.assert_array_equal(inside, [True, False])
    inside = bbx.boxes_in_window(b, win, min_overlap=0.2)
    np.testing.assert_array_equal(inside, [True, True])


def test_set_aspect_ratio():
    b = Boxes(np.array([[0, 0, 10, 20]], "f"))
    out = bbx.set_aspect_ratio(b, 1.0)
    r = out.get()[0]
    assert r[3] - r[1] == 20  # height preserved
    assert r[2] - r[0] == 20  # width = ar * height
    assert (r[0] + r[2]) / 2 == 5  # centered


def test_field_shape_validation():
    b = Boxes(np.zeros((2, 4), "f"))
    with pytest.raises(ValueError):
        b.set_field("scores", np.zeros(3))
