"""Cascade-specialized (static) Pallas kernel: parity with the XLA evaluator.

The static kernel bakes the frozen cascade into the compiled program
(ops/cascade_static.py); rejection is monotone per window, so its tile-level
early exit must reproduce the lockstep evaluator's survivor set, scores, and
n_weak counter exactly — including for batched canvases (batch grid dim).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waldboost_tpu.channels import _normalize_opts
from waldboost_tpu.model import (_channel_canvas_fast, _packed_plan_cached,
                                 Model)
from waldboost_tpu.ops.cascade import cascade_response_grid
from waldboost_tpu.ops.cascade_static import (cascade_response_grid_static,
                                              static_cascade_from_model)


def _make_model(seed=0, n_stages=20, shape=(8, 8, 4)):
    from __graft_entry__ import _flagship_model
    model = _flagship_model(seed=seed, n_stages=n_stages, shape=shape,
                            calibrated=False)
    # hand-set some thetas so rejection actually fires
    rng = np.random.RandomState(seed + 1)
    for t in range(3, n_stages, 2):
        model.theta[t] = float(rng.uniform(-0.5, 0.5))
    model._version += 1
    return model


@pytest.fixture(scope="module")
def setup():
    model = _make_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    h, w = 96, 128
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (3, h, w)).astype(np.uint8)
    cvs = jnp.stack([
        _channel_canvas_fast(jnp.asarray(im), shrink, smooth, cf,
                             packed).astype(jnp.float32) for im in imgs])
    return model, cvs, valid, (m, n)


def test_static_matches_xla_single(setup):
    model, cvs, valid, window = setup
    casc, meta = model._get_cascade()
    sc = static_cascade_from_model(model)
    hs0, al0, nw0 = cascade_response_grid(cvs[0], casc, window, meta,
                                          init_alive=valid)
    hs1, al1, nw1 = cascade_response_grid_static(cvs[0], sc, valid, window,
                                                 tile=(64, 128),
                                                 interpret=True)
    al0, al1 = np.asarray(al0), np.asarray(al1)
    assert np.array_equal(al0, al1)
    assert np.array_equal(np.asarray(hs0)[al0], np.asarray(hs1)[al1])
    assert int(nw0) == int(nw1)


def test_static_matches_xla_batched(setup):
    model, cvs, valid, window = setup
    casc, meta = model._get_cascade()
    sc = static_cascade_from_model(model)
    hs1, al1, nw1 = cascade_response_grid_static(cvs, sc, valid, window,
                                                 tile=(64, 128),
                                                 interpret=True)
    assert hs1.shape[0] == cvs.shape[0]
    for b in range(cvs.shape[0]):
        hs0, al0, nw0 = cascade_response_grid(cvs[b], casc, window, meta,
                                              init_alive=valid)
        al0 = np.asarray(al0)
        assert np.array_equal(al0, np.asarray(al1[b]))
        assert np.array_equal(np.asarray(hs0)[al0], np.asarray(hs1[b])[al0])
        assert int(nw0) == int(nw1[b])


def test_static_stage_cap_matches_slice(setup):
    model, cvs, valid, window = setup
    from waldboost_tpu.ops.cascade import slice_cascade
    casc, meta = model._get_cascade()
    sc = static_cascade_from_model(model)
    k1 = 7
    pre = slice_cascade(casc, 0, k1)
    hs0, al0, nw0 = cascade_response_grid(cvs[1], pre, window, meta,
                                          init_alive=valid)
    hs1, al1, nw1 = cascade_response_grid_static(cvs[1], sc, valid, window,
                                                 tile=(64, 128),
                                                 interpret=True,
                                                 n_stages_cap=k1)
    al0 = np.asarray(al0)
    assert np.array_equal(al0, np.asarray(al1))
    assert np.array_equal(np.asarray(hs0)[al0], np.asarray(hs1)[al0])
    # the padded slice has inert stages beyond k1; n_weak counts only live
    # evaluations of active stages — identical by construction
    assert int(nw0) == int(nw1)


def test_model_detect_uses_static_backend(setup):
    """Model.detect through the serving dispatch equals the XLA backend."""
    from waldboost_tpu import model as M
    model, _, _, _ = setup
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (96, 128)).astype(np.uint8)
    old = M._CASCADE_BACKEND
    try:
        M.set_cascade_backend("xla")
        bx = model.detect(img)
        M.set_cascade_backend("static")
        bs = model.detect(img)
    finally:
        M._CASCADE_BACKEND = old
    assert len(bx) == len(bs)
    # same survivor set (order may differ only if extraction differs; both
    # use np.nonzero row-major or top-k — compare as sorted sets)
    a = np.concatenate([bx.get(), bx.get_field("scores")[:, None]], axis=1)
    b = np.concatenate([bs.get(), bs.get_field("scores")[:, None]], axis=1)
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    assert np.array_equal(a, b)


def test_masked_kernel_matches_static(setup):
    """cascade_masked_grid_static == where(alive, hs, -inf) uncropped, with
    exact in-kernel n_weak and survivor counts."""
    from waldboost_tpu.ops.cascade_static import (cascade_grid,
                                                  cascade_masked_grid_static)
    model, cvs, valid, window = setup
    sc = static_cascade_from_model(model)
    hs, al, nw = cascade_response_grid_static(cvs, sc, valid, window,
                                              tile=(64, 128), interpret=True)
    masked, nw2, count = cascade_masked_grid_static(cvs, sc, valid, window,
                                                    tile=(64, 128),
                                                    interpret=True)
    U, V = cvs.shape[-2], cvs.shape[-1]
    m, n = window
    gu, gv = U - m, V - n
    TU, TV, gi, gj, _, _ = cascade_grid((U, V), window, tile=(64, 128))
    assert masked.shape == (cvs.shape[0], gi * TU, gj * TV)
    al, hs = np.asarray(al), np.asarray(hs)
    mk = np.asarray(masked)
    # content: hs where alive else -inf
    assert np.array_equal(mk[:, :gu, :gv],
                          np.where(al, hs, -np.inf))
    # padding: all dead
    assert np.all(np.isneginf(mk[:, gu:, :])) and \
        np.all(np.isneginf(mk[:, :, gv:]))
    assert np.array_equal(np.asarray(nw), np.asarray(nw2))
    assert np.array_equal(np.asarray(count),
                          al.reshape(al.shape[0], -1).sum(1))


def test_masked_kernel_serving_variants(setup):
    """The serving configurations (-inf latch encoding without n_weak,
    eager/lazy preshift, min-uses thresholds) emit the same masked map and
    survivor counts as the reference masked form."""
    from waldboost_tpu.ops.cascade_static import cascade_masked_grid_static
    model, cvs, valid, window = setup
    sc = static_cascade_from_model(model)
    ref, _, count0 = cascade_masked_grid_static(cvs, sc, valid, window,
                                                tile=(64, 128),
                                                interpret=True)
    ref = np.asarray(ref)
    for ps, lazy, mu, me, at in [
            (False, False, 2, False, False), (True, False, 2, False, False),
            (True, True, 2, False, False), (True, True, 4, False, False),
            (True, True, 1, False, False),  # serving default
            (True, False, 1000, False, False),
            (False, False, 2, True, False), (True, False, 2, True, False),
            (True, True, 2, True, False),
            # deferred AND-tree rejection encoding (WB_CASC_ENC=andtree)
            (False, False, 2, False, True), (True, True, 1, False, True)]:
        mk, _, count = cascade_masked_grid_static(
            cvs, sc, valid, window, tile=(64, 128), interpret=True,
            with_n_weak=False, preshift=ps, preshift_lazy=lazy,
            preshift_min_uses=mu, block=4, margin_enc=me, and_tree=at)
        assert np.array_equal(np.asarray(mk), ref), (ps, lazy, mu, me, at)
        assert np.array_equal(np.asarray(count), np.asarray(count0)), \
            (ps, lazy, mu, me, at)


def test_masked_kernel_deep_cascade_auto_latch():
    """Cascades deeper than 128 stages silently switch the masked kernel
    to the single-carry -inf latch (the AND-tree's per-block compare lists
    blow Mosaic's scoped-VMEM stack at depth — scripts/exp_r12_deep.py);
    outputs must still equal the XLA lockstep evaluator exactly."""
    from waldboost_tpu.ops.cascade_static import cascade_masked_grid_static

    model = _make_model(seed=3, n_stages=140)
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(48, 64, shrink, n_per_oct, (m, n),
                                 halo=cf.halo)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    cvs = _channel_canvas_fast(jnp.asarray(img), shrink, smooth, cf,
                               packed).astype(jnp.float32)

    casc, meta = model._get_cascade()
    hs, alive, nw = cascade_response_grid(cvs, casc, (m, n), meta,
                                          init_alive=valid)
    sc = static_cascade_from_model(model)
    masked, _, count = cascade_masked_grid_static(
        cvs, sc, valid, (m, n), interpret=True, with_n_weak=False,
        preshift=True, preshift_lazy=True, preshift_min_uses=1,
        block=16, and_tree=True)  # auto-switches to the latch internally
    gu, gv = hs.shape
    mk = np.asarray(masked)[:gu, :gv]
    np.testing.assert_array_equal(np.isfinite(mk), np.asarray(alive))
    np.testing.assert_array_equal(mk[np.asarray(alive)],
                                  np.asarray(hs)[np.asarray(alive)])
    assert int(count) == int(np.asarray(alive).sum())
