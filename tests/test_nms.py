import numpy as np
import jax.numpy as jnp

from waldboost_tpu import boxes as bbx
from waldboost_tpu.boxes import Boxes
from waldboost_tpu.ops import nms as dnms


def test_device_nms_matches_host():
    rng = np.random.RandomState(0)
    for trial in range(5):
        K = 64
        n_valid = rng.randint(5, K)
        centers = rng.rand(n_valid, 2) * 100
        sizes = rng.rand(n_valid, 2) * 30 + 5
        rects = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype("f")
        scores = rng.randn(n_valid).astype("f")

        host = bbx.non_max_suppression(Boxes(rects, scores=scores),
                                       iou_threshold=0.4)
        host_set = set(map(tuple, np.round(host.get(), 3).tolist()))

        rects_p = np.zeros((K, 4), "f")
        rects_p[:n_valid] = rects
        scores_p = np.zeros(K, "f")
        scores_p[:n_valid] = scores
        valid = np.zeros(K, bool)
        valid[:n_valid] = True
        keep = np.asarray(dnms.nms_device(jnp.asarray(rects_p),
                                          jnp.asarray(scores_p),
                                          jnp.asarray(valid),
                                          iou_threshold=0.4))
        dev_set = set(map(tuple, np.round(rects_p[keep], 3).tolist()))
        assert dev_set == host_set, f"trial {trial}"


def test_topk_detections_extracts_boxes():
    gu, gv = 16, 140
    hs = np.full((gu, gv), -np.inf, "f")
    alive = np.zeros((gu, gv), bool)
    # two survivors in "level 0" (offset 2,3, scale 0.5 -> inv 2.0)
    hs[4, 10] = 3.0
    alive[4, 10] = True
    hs[5, 12] = 1.0
    alive[5, 12] = True
    level_id = np.zeros((gu, gv), np.int32)
    offsets = jnp.asarray(np.array([[2, 3]], np.int64))
    inv_scales = jnp.asarray(np.array([2.0], "f"))
    rects, scores, valid = dnms.topk_detections(
        jnp.asarray(hs), jnp.asarray(alive), jnp.asarray(level_id),
        offsets, inv_scales, jnp.asarray([8, 8]), k=4)
    rects, scores, valid = map(np.asarray, (rects, scores, valid))
    assert valid.sum() == 2
    assert scores[0] == 3.0 and scores[1] == 1.0
    # (r=4, c=10) -> local (2, 7) -> box (7,2,15,10)*2
    np.testing.assert_allclose(rects[0], [14, 4, 30, 20])


def test_model_detect_topk_matches_detect():
    from test_model import make_model
    model = make_model(n_stages=4, shape=(8, 8, 4),
                       opts=dict(shrink=2, n_per_oct=2, smooth=1,
                                 channels="grad_hist"))
    img = np.random.RandomState(7).randint(0, 256, (56, 72)).astype(np.uint8)
    full = model.detect(img)
    topk = model.detect_topk(img, k=4096)
    assert len(topk) == len(full)
    np.testing.assert_allclose(np.sort(topk.get_field("scores")),
                               np.sort(full.get_field("scores")), rtol=1e-6)
    # and with small k: the k highest-scoring survivors
    k_small = model.detect_topk(img, k=8)
    assert len(k_small) == min(8, len(full))
    want = np.sort(full.get_field("scores"))[::-1][:len(k_small)]
    np.testing.assert_allclose(np.sort(k_small.get_field("scores"))[::-1],
                               want, rtol=1e-6)
