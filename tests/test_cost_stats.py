"""Worst-case eval-cost observability (VERDICT r3 #9; the reference's own
unfinished roadmap item "Keep worst case eval. cost",
/root/reference/NOTES.md:70): per-scan worst eval_cost tracking, per-stage
survivor histograms, and their Meter surface."""

import numpy as np

import waldboost_tpu as wb
from waldboost_tpu.profiling import Meter

from test_model import make_model


def test_worst_eval_cost_tracks_max_scan():
    rng = np.random.RandomState(3)
    model = make_model()
    # two images with different reject behavior: noise (cheap) and a
    # constant frame (gradients vanish -> different survivor pattern)
    img_a = rng.randint(0, 256, (64, 80)).astype(np.uint8)
    img_b = np.full((64, 80), 128, np.uint8)
    model.detect(img_a)
    cost_a = model.eval_cost
    stats_a = model.cost_stats()
    assert stats_a["n_images"] == 1
    assert stats_a["worst_eval_cost"] == cost_a > 0

    model.detect(img_b)
    stats = model.cost_stats()
    assert stats["n_images"] == 2
    # the worst-case is the max per-scan average, never below the running
    # average, and monotone under more scans
    assert stats["worst_eval_cost"] >= stats["eval_cost"] > 0
    assert stats["worst_eval_cost"] >= stats_a["worst_eval_cost"] or \
        np.isclose(stats["worst_eval_cost"], stats_a["worst_eval_cost"])

    model.reset()
    z = model.cost_stats()
    assert z["n_images"] == 0 and z["worst_eval_cost"] == 0


def test_survivor_histogram_matches_counters():
    rng = np.random.RandomState(5)
    model = make_model()
    img = rng.randint(0, 256, (64, 80)).astype(np.uint8)

    model.reset()
    counts = model.survivor_histogram(img)
    assert counts.shape == (len(model),)
    # survivors are monotonically non-increasing with depth and start at
    # the full scanned-window count
    assert (np.diff(counts) <= 0).all()
    assert counts[0] == model.n_loc
    # every counted evaluation is an alive window at an ACTIVE stage: with
    # all stages active, sum(counts) == n_weak exactly
    assert counts.sum() == model.n_weak
    # the accumulated histogram matches (and doubles after a second image)
    assert (model.cost_stats()["stage_survivors"] == counts).all()
    model.survivor_histogram(img)
    assert (model.cost_stats()["stage_survivors"] == 2 * counts).all()


def test_survivor_histogram_agrees_with_detect_n_weak():
    """The diagnostic XLA pass must count the same weak evaluations the
    serving path reports for the same image."""
    rng = np.random.RandomState(7)
    model = make_model()
    img = rng.randint(0, 256, (64, 80)).astype(np.uint8)
    model.reset()
    model.detect(img)
    serving_weak, serving_loc = model.n_weak, model.n_loc
    model.reset()
    model.survivor_histogram(img)
    assert model.n_weak == serving_weak
    assert model.n_loc == serving_loc


def test_meter_surfaces_model_stats():
    rng = np.random.RandomState(9)
    model = make_model()
    img = rng.randint(0, 256, (64, 80)).astype(np.uint8)
    model.survivor_histogram(img)
    meter = Meter()
    meter.note_model(model, name="det")
    rep = meter.report()
    assert "det.eval_cost" in rep and "det.worst_eval_cost" in rep
    assert meter.counters["det.n_images"] == 1
    assert 0 <= meter.counters["det.depth_1pct"] <= len(model)
