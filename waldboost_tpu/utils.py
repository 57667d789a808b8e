"""Utilities: synthetic data generator, visualization, training callbacks.

Parity with /root/reference/waldboost/utils.py.  cv2/matplotlib are imported
lazily so the core library has no hard viz dependencies.
"""

from __future__ import annotations

import numpy as np

from . import boxes as bbx
from . import groundtruth

__all__ = [
    "fake_data_generator",
    "montage",
    "draw_detections",
    "ShowImageCallback",
    "class_prob_callback",
]


def fake_data_generator(seed=None):
    """Infinite synthetic dataset: bright squares on noise, 256x256 uint8,
    with YXYX ground truth (/root/reference/waldboost/utils.py:81-97).
    Yields dicts {"image", "groundtruth_boxes"}."""
    rng = np.random.RandomState(seed)
    while True:
        image = np.zeros((256, 256), "f")
        gt = []
        n_objects = rng.randint(2)
        for _ in range(n_objects):
            w = rng.randint(30, 60)
            x = rng.randint(256 - w)
            y = rng.randint(256 - w)
            i = rng.uniform(0.2, 1)
            image[y:y + w, x:x + w] += i
            gt.append([y - 5, x - 5, y + w + 5, x + w + 5])
        image += rng.rand(*image.shape) * 0.3 * rng.rand()
        image = (np.clip(image, 0, 1) * 255).astype("u1")
        gt = np.array(gt, "f") if gt else np.empty((0, 4))
        gt_boxes = groundtruth.bbox_list(gt, format=groundtruth.RectFormat.YXYX)
        yield dict(image=np.atleast_2d(image), groundtruth_boxes=gt_boxes)


def montage(X, nrows=4, ncols=4, figsize=None):
    """Grid plot of sample windows (/root/reference/waldboost/utils.py:15-30)."""
    import matplotlib.pyplot as plt
    if figsize is None:
        width = 15
        h, w = X.shape[1:3]
        f = w * ncols / width
        figsize = width, (h * nrows) / f
    plt.figure(figsize=figsize)
    vmax = np.percentile(X, 99)
    for i, x in enumerate(X[:nrows * ncols]):
        plt.subplot(nrows, ncols, i + 1)
        plt.imshow(np.squeeze(x), cmap="gray", vmax=vmax)
        plt.axis("off")
    plt.show()


def draw_detections(image, dt_boxes, gt_boxes=None, *, dt_thickness=1,
                    gt_thickness=1, gt_color=(255, 0, 0), vmin=None, vmax=None):
    """Draw detections colored by score (/root/reference/waldboost/utils.py:33-78).
    Returns an RGB image."""
    import cv2
    import matplotlib as mpl
    from matplotlib import cm

    img = np.asarray(image).copy()
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)

    if gt_boxes is not None:
        for x1, y1, x2, y2 in gt_boxes.get().astype("i"):
            cv2.rectangle(img, (x1, y1), (x2, y2), gt_color, thickness=gt_thickness)

    if dt_boxes is not None and len(dt_boxes):
        scores = dt_boxes.get_field("scores")
        if vmin is None:
            vmin = scores.min()
        if vmax is None:
            vmax = scores.max()
        N = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
        colors = cm.plasma
        dt_boxes = bbx.sort_by_field(dt_boxes, "scores", descending=False)
        for (x1, y1, x2, y2), score in zip(dt_boxes.get().astype("i"),
                                           dt_boxes.get_field("scores")):
            clr = (255 * np.array(colors(N(score)))).astype("u1")
            clr = tuple(map(int, clr))
            cv2.rectangle(img, (x1, y1), (x2, y2), clr, thickness=dt_thickness)

    return img[..., ::-1]


class ShowImageCallback:
    """Callback showing the test image with detections once fpr is low enough
    (/root/reference/waldboost/utils.py:100-112)."""

    def __init__(self, image, gt_boxes, max_fpr=0.05):
        self.image = image
        self.gt = gt_boxes
        self.max_fpr = max_fpr

    def __call__(self, model, learner, stage):
        import cv2
        if learner.false_positive_rate < self.max_fpr:
            dt_boxes = model.detect(self.image)
            I = draw_detections(self.image, dt_boxes, self.gt, gt_thickness=3,
                                gt_color=(255, 0, 0))
            cv2.imshow("Testing image", I)
            cv2.waitKey(20)


def class_prob_callback(model, learner, stage):
    print(f"Stage {stage}:")
    print(f"\tp0 = {learner.false_positive_rate:.5f}; "
          f"p1 = {learner.true_positive_rate:.5f}")
