"""Box substrate: container for rectangles with named per-box fields.

This replaces the reference's external ``bbx`` dependency (see call-site
contract catalogued in SURVEY.md; e.g. /root/reference/waldboost/model.py:136-147,
/root/reference/waldboost/samples.py:125-157, /root/reference/waldboost/testing.py:39-62).

Design: the ``Boxes`` container is a host-side (numpy) structure because box
lists are inherently ragged -- it lives at the API boundary.  The geometry
kernels (``iou``, ``non_max_suppression``) have device (JAX) implementations in
:mod:`waldboost_tpu.ops.nms` operating on fixed-shape arrays; the functions here
dispatch to numpy for small host-side lists.

Rect format is XYXY float32: ``[xmin, ymin, xmax, ymax]``.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

__all__ = [
    "Boxes",
    "concatenate",
    "iou",
    "non_max_suppression",
    "set_aspect_ratio",
    "sort_by_field",
    "boxes_in_window",
    "empty_boxes",
]


class Boxes:
    """(N, 4) XYXY float rectangles plus arbitrary named per-box fields.

    Mirrors the API surface of ``bbx.Boxes`` that the reference consumes:
    ``get``, ``get_field``/``set_field``/``add_field``/``has_field``, fancy
    ``__getitem__``, ``__len__``, ``num_boxes``, ``area``, ``normalized``.
    """

    def __init__(self, rects, **fields):
        rects = np.asarray(rects, dtype=np.float32)
        rects = np.atleast_2d(rects)
        if rects.size == 0:
            rects = rects.reshape(0, 4)
        if rects.ndim != 2 or rects.shape[1] != 4:
            raise ValueError(f"Rects must have shape (N, 4), got {rects.shape}")
        self._rects = rects
        self._fields: Dict[str, np.ndarray] = {}
        for name, value in fields.items():
            self.set_field(name, value)

    # -- core accessors ----------------------------------------------------
    def get(self) -> np.ndarray:
        return self._rects

    def num_boxes(self) -> int:
        return self._rects.shape[0]

    def __len__(self) -> int:
        return self._rects.shape[0]

    def __bool__(self) -> bool:
        return self._rects.shape[0] > 0

    def field_names(self) -> List[str]:
        return list(self._fields)

    def has_field(self, name: str) -> bool:
        return name in self._fields

    def get_field(self, name: str) -> np.ndarray:
        if name not in self._fields:
            raise KeyError(f"Field '{name}' does not exist")
        return self._fields[name]

    def set_field(self, name: str, value) -> None:
        value = np.asarray(value)
        if value.shape[:1] != (len(self),):
            raise ValueError(
                f"Field '{name}' first dimension {value.shape[:1]} does not "
                f"match number of boxes ({len(self)})"
            )
        self._fields[name] = value

    def add_field(self, name: str, value) -> None:
        self.set_field(name, value)

    def remove_field(self, name: str) -> None:
        del self._fields[name]

    # -- geometry ----------------------------------------------------------
    def area(self) -> np.ndarray:
        x1, y1, x2, y2 = self._rects.T
        return np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)

    def normalized(self, scale: float = 1.0) -> "Boxes":
        """Return a copy with all coordinates multiplied by ``scale``.

        Matches the call at /root/reference/waldboost/model.py:147 which maps
        channel-grid coordinates ``r, c`` back to image space via ``1/scale``.
        """
        out = Boxes(self._rects * np.float32(scale))
        for name, value in self._fields.items():
            out.set_field(name, value)
        return out

    # -- indexing ----------------------------------------------------------
    def __getitem__(self, idx) -> "Boxes":
        if np.isscalar(idx) or (isinstance(idx, np.ndarray) and idx.ndim == 0):
            idx = np.array([idx])
        out = Boxes(self._rects[idx])
        for name, value in self._fields.items():
            out.set_field(name, value[idx])
        return out

    def copy(self) -> "Boxes":
        out = Boxes(self._rects.copy())
        for name, value in self._fields.items():
            out.set_field(name, value.copy())
        return out

    def __repr__(self) -> str:
        return f"Boxes(n={len(self)}, fields={self.field_names()})"


def empty_boxes(**fields) -> Boxes:
    """Empty box list with given (empty) fields."""
    out = Boxes(np.empty((0, 4), np.float32))
    for name, value in fields.items():
        out.set_field(name, np.asarray(value))
    return out


def concatenate(box_lists: Sequence[Boxes], fields: Optional[Iterable[str]] = None) -> Boxes:
    """Concatenate a sequence of :class:`Boxes`.

    ``fields`` selects which fields to keep; when ``None``, the intersection of
    fields present in every member is kept.  Mirrors ``bbx.concatenate`` used
    at /root/reference/waldboost/model.py:179 and /root/reference/waldboost/__init__.py:130.
    """
    box_lists = [b for b in box_lists if b is not None]
    if not box_lists:
        return empty_boxes()
    if fields is None:
        names = set(box_lists[0].field_names())
        for b in box_lists[1:]:
            names &= set(b.field_names())
        fields = sorted(names)
    rects = np.concatenate([b.get() for b in box_lists], axis=0)
    out = Boxes(rects)
    for name in fields:
        out.set_field(name, np.concatenate([b.get_field(name) for b in box_lists], axis=0))
    return out


def iou(a: Boxes, b: Boxes) -> np.ndarray:
    """Pairwise intersection-over-union matrix of shape ``(len(a), len(b))``."""
    ra, rb = a.get(), b.get()
    return iou_matrix(ra, rb)


def iou_matrix(ra: np.ndarray, rb: np.ndarray) -> np.ndarray:
    """IoU between two (N,4) / (M,4) XYXY rect arrays (numpy)."""
    ra = np.asarray(ra, np.float32).reshape(-1, 4)
    rb = np.asarray(rb, np.float32).reshape(-1, 4)
    x1 = np.maximum(ra[:, None, 0], rb[None, :, 0])
    y1 = np.maximum(ra[:, None, 1], rb[None, :, 1])
    x2 = np.minimum(ra[:, None, 2], rb[None, :, 2])
    y2 = np.minimum(ra[:, None, 3], rb[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    area_a = np.maximum(ra[:, 2] - ra[:, 0], 0) * np.maximum(ra[:, 3] - ra[:, 1], 0)
    area_b = np.maximum(rb[:, 2] - rb[:, 0], 0) * np.maximum(rb[:, 3] - rb[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out.astype(np.float32)


def non_max_suppression(boxes: Boxes, iou_threshold: float = 0.5, score_field: str = "scores") -> Boxes:
    """Greedy NMS by descending score.  Keeps the highest-scoring box of every
    overlapping (IoU > threshold) cluster.  Host implementation; the on-device
    fixed-shape version lives in :func:`waldboost_tpu.ops.nms.nms_device`.
    """
    n = len(boxes)
    if n == 0:
        return boxes
    scores = np.asarray(boxes.get_field(score_field)).reshape(-1)
    order = np.argsort(-scores, kind="stable")
    rects = np.asarray(boxes.get(), np.float32)[order].reshape(-1, 4)
    # matrix-free greedy: one IoU ROW per kept box (an untrained cascade can
    # emit tens of thousands of boxes per image — the full n x n matrix and
    # its broadcast temporaries are O(n^2) memory and thrash at that scale).
    # The keep set is identical: a kept box suppresses exactly the rows its
    # matrix row would have.
    area = np.maximum(rects[:, 2] - rects[:, 0], 0) \
        * np.maximum(rects[:, 3] - rects[:, 1], 0)
    keep_order_idx = []
    suppressed = np.zeros(n, bool)
    for i in range(n):
        if suppressed[i]:
            continue
        keep_order_idx.append(i)
        suppressed[i] = True
        rest = ~suppressed
        if not rest.any():
            break
        rr = rects[rest]
        x1 = np.maximum(rects[i, 0], rr[:, 0])
        y1 = np.maximum(rects[i, 1], rr[:, 1])
        x2 = np.minimum(rects[i, 2], rr[:, 2])
        y2 = np.minimum(rects[i, 3], rr[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        union = area[i] + area[rest] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            iou_row = np.where(union > 0, inter / union, 0.0)
        sup = np.zeros(n, bool)
        sup[rest] = iou_row.astype(np.float32) > iou_threshold
        suppressed |= sup
    keep = order[np.array(keep_order_idx, int)]
    keep = np.sort(keep)
    return boxes[keep]


def sort_by_field(boxes: Boxes, field: str, descending: bool = False) -> Boxes:
    values = np.asarray(boxes.get_field(field)).reshape(len(boxes), -1)[:, 0]
    order = np.argsort(values, kind="stable")
    if descending:
        order = order[::-1]
    return boxes[order]


def set_aspect_ratio(boxes: Boxes, aspect_ratio: float) -> Boxes:
    """Return boxes with width adjusted about the center so w/h == aspect_ratio.

    Height is preserved.  Used by the evaluator's ``normalize_ar`` option
    (/root/reference/waldboost/testing.py:49-51).
    """
    r = boxes.get().copy()
    cx = (r[:, 0] + r[:, 2]) / 2
    h = r[:, 3] - r[:, 1]
    w = h * aspect_ratio
    r[:, 0] = cx - w / 2
    r[:, 2] = cx + w / 2
    out = Boxes(r)
    for name in boxes.field_names():
        out.set_field(name, boxes.get_field(name))
    return out


def boxes_in_window(boxes: Boxes, window: Boxes, min_overlap: float = 1.0) -> np.ndarray:
    """Bool array: fraction of each box's area inside ``window`` >= min_overlap.

    Mirrors the usage at /root/reference/waldboost/testing.py:43 (ignore GT
    boxes that are not sufficiently inside the image).
    """
    r = boxes.get()
    win = np.atleast_2d(window.get())[0]
    x1 = np.maximum(r[:, 0], win[0])
    y1 = np.maximum(r[:, 1], win[1])
    x2 = np.minimum(r[:, 2], win[2])
    y2 = np.minimum(r[:, 3], win[3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    area = boxes.area()
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(area > 0, inter / area, 0.0)
    return frac >= min_overlap
