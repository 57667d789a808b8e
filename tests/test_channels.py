import numpy as np
import pytest

import oracle
from waldboost_tpu import channels as ch


def rand_u8(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


def test_grad_mag_matches_oracle():
    img = rand_u8((32, 40))
    out = np.asarray(ch.grad_mag(img.astype(np.float32)))  # CHW
    ref = np.transpose(oracle.grad_mag(img), (2, 0, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_grad_hist_matches_oracle():
    img = rand_u8((32, 40), seed=1)
    out = np.asarray(ch.grad_hist(img.astype(np.float32)))
    ref = np.transpose(oracle.grad_hist(img), (2, 0, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)


def test_pyramid_plan_geometry():
    plan = ch.pyramid_plan(256, 256, shrink=2, n_per_oct=8)
    # 256 -> 128 -> 64 -> 32 -> 16 -> 8: 6 octaves
    assert plan[-1].octave == 5
    assert len(plan) == 48
    # level sizing formula parity with the oracle generator
    opts = dict(shrink=2, n_per_oct=8, smooth=0, channels=oracle.grad_mag)
    img = rand_u8((256, 256), seed=2)
    sizes = [(c.shape[0], c.shape[1], s) for c, s in oracle.channel_pyramid(img, opts)]
    for lv, (h, w, s) in zip(plan, sizes):
        assert lv.out_height == h and lv.out_width == w
        assert abs(lv.scale - s) < 1e-9


@pytest.mark.parametrize("smooth", [0, 1])
@pytest.mark.parametrize("shrink", [1, 2])
def test_channel_pyramid_matches_oracle(shrink, smooth):
    img = rand_u8((64, 80), seed=3)
    opts = dict(shrink=shrink, n_per_oct=3, smooth=smooth, channels=ch.grad_hist)
    oracle_opts = dict(shrink=shrink, n_per_oct=3, smooth=smooth,
                       channels=oracle.grad_hist)
    got = list(ch.channel_pyramid(img, opts))
    want = list(oracle.channel_pyramid(img, oracle_opts))
    assert len(got) == len(want)
    for (gc, gs), (wc, ws) in zip(got, want):
        assert gc.shape == wc.shape
        assert abs(gs - ws) < 1e-9
        # With the exact-arithmetic trunc convention (see
        # ops.image.resize_bilinear) the device pyramid matches the f64
        # oracle to float tolerance.  Allow a tiny fraction of residual
        # trunc flips (amplified by the gradient kernel to at most
        # 4*sqrt(2)) for pathological scale ratios.
        diff = np.abs(gc.astype("f8") - wc.astype("f8"))
        assert (diff > 0.05).mean() < 0.005
        assert diff.max() <= 6.0


def test_registry_resolves_reference_names():
    cf = ch.resolve_channel_function("waldboost.channels.grad_hist")
    assert cf is ch.grad_hist
    cf = ch.resolve_channel_function("waldboost.channels.grad_mag")
    assert cf is ch.grad_mag
    with pytest.raises(KeyError):
        ch.resolve_channel_function("nope.nope")


def test_channel_pyramid_validates_ndim():
    opts = dict(ch.default_channel_opts)
    with pytest.raises(ValueError):
        list(ch.channel_pyramid(np.zeros((4, 4, 3), np.uint8), opts))
