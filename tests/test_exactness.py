"""Exhaustive verification of the exact-arithmetic numerics (ops.exact).

These tests pin the two exactness mechanisms the north-star parity contract
rests on (PARITY.md §1):

* the 4-corner resize combine == true rational arithmetic (Fraction oracle)
  across all static implementation variants (identity / single-axis / i32 /
  split), including the frac==1 edge-clamp taps and 4K-scale denominators;
* the grad_hist projection plans == the reference's NumPy-2 semantics
  ``f32(f64(gx*c - gy*s))`` for EVERY integer gradient pair — brute force
  over the full (2*1020+1)^2 lattice — except the documented
  exact-cancellation lines where both sides are < 2^-40.
"""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from waldboost_tpu.ops.exact import (
    _eval_terms_jnp,
    _eval_terms_np,
    axis_taps_exact,
    combine4_exact,
    combine_kind,
    floordiv_exact,
    projection_plan,
    resize_exact_matmul,
)


def _fraction_floor(g00, g01, g10, g11, fnr, dr, fnc, dc):
    fr = Fraction(int(fnr), dr)
    fc = Fraction(int(fnc), dc)
    v = (1 - fr) * (1 - fc) * int(g00) + (1 - fr) * fc * int(g01) \
        + fr * (1 - fc) * int(g10) + fr * fc * int(g11)
    return v.numerator // v.denominator


@pytest.mark.parametrize("axes", [
    (480, 440, 640, 586),    # generic pyramid level (i32)
    (17, 16, 9, 8),          # octave-ish ratios
    (2160, 1981, 3840, 3522),  # 4K level (i32, large)
    (2160, 2158, 4096, 4094),  # near-identity large (gcd barely reduces)
    (8, 8, 10, 9),           # identity rows (den 1) x resize cols
    (12, 9, 16, 16),         # resize rows x identity cols
    (1, 1, 7, 5),            # single-row source
    (96, 96, 128, 128),      # full identity (frac==1 clamp at the edge)
])
def test_combine4_exact_vs_fraction(axes):
    n_in_r, n_out_r, n_in_c, n_out_c = axes
    i0r, fnr, dr = axis_taps_exact(n_in_r, n_out_r)
    i0c, fnc, dc = axis_taps_exact(n_in_c, n_out_c)
    # den == 1 must mean identity weights (all numerators zero)
    assert (dr > 1 or (fnr == 0).all()) and (dc > 1 or (fnc == 0).all())
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (n_in_r, n_in_c)).astype(np.int64)
    ks = rng.randint(0, n_out_r, 128)
    ls = rng.randint(0, n_out_c, 128)
    # include the edge taps (frac==1 clamp normalization lives there)
    ks[:2] = [0, n_out_r - 1]
    ls[:2] = [0, n_out_c - 1]
    i1r = np.minimum(i0r + 1, n_in_r - 1)
    i1c = np.minimum(i0c + 1, n_in_c - 1)
    g00 = img[i0r[ks], i0c[ls]]
    g01 = img[i0r[ks], i1c[ls]]
    g10 = img[i1r[ks], i0c[ls]]
    g11 = img[i1r[ks], i1c[ls]]
    want = np.array([
        _fraction_floor(g00[t], g01[t], g10[t], g11[t],
                        fnr[ks[t]], dr, fnc[ls[t]], dc)
        for t in range(len(ks))], np.float32)
    got = np.asarray(combine4_exact(
        jnp.asarray(g00, jnp.float32), jnp.asarray(g01, jnp.float32),
        jnp.asarray(g10, jnp.float32), jnp.asarray(g11, jnp.float32),
        jnp.asarray(fnr[ks], jnp.float32), jnp.asarray(fnc[ls], jnp.float32),
        dr, dc))
    assert np.array_equal(got, want), combine_kind(dr, dc)


def test_combine4_split_path_vs_i32():
    """The large-denominator split path agrees with the i32 path (and the
    Fraction oracle) on the same taps — exercised by forcing vmax high so
    combine_kind picks 'split' for moderate dens."""
    i0r, fnr, dr = axis_taps_exact(480, 441)
    i0c, fnc, dc = axis_taps_exact(640, 587)
    assert combine_kind(dr, dc, vmax=255) == "i32"
    assert combine_kind(dr, dc, vmax=1 << 14) == "split"
    rng = np.random.RandomState(3)
    ks = rng.randint(0, 441, 256)
    ls = rng.randint(0, 587, 256)
    g = [jnp.asarray(rng.randint(0, 256, 256), jnp.float32)
         for _ in range(4)]
    frn = jnp.asarray(fnr[ks], jnp.float32)
    fcn = jnp.asarray(fnc[ls], jnp.float32)
    a = np.asarray(combine4_exact(*g, frn, fcn, dr, dc, vmax=255))
    b = np.asarray(combine4_exact(*g, frn, fcn, dr, dc, vmax=1 << 14))
    assert np.array_equal(a, b)


def test_floordiv_exact_edges():
    for den in (1, 2, 7, 960, 1280, 8640, 32768):
        a = np.arange(0, 256 * den, max(den // 3, 1), dtype=np.int64)
        a = a[a < (1 << 23)]
        got = np.asarray(floordiv_exact(jnp.asarray(a, jnp.float32), den))
        assert np.array_equal(got, a // den), den


def test_resize_exact_matmul_vs_gather():
    """The MXU-matmul exact resize (canvas path) == the elementwise exact
    gather resize (ops.image) == exact integer arithmetic."""
    from waldboost_tpu.ops.image import resize_bilinear

    rng = np.random.RandomState(1)
    for (h, w, nh, nw) in [(96, 128, 88, 117), (33, 47, 32, 44),
                           (64, 64, 64, 64), (40, 56, 36, 50)]:
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        a = np.asarray(resize_bilinear(jnp.asarray(img), nh, nw))
        b = np.asarray(resize_exact_matmul(
            jnp.asarray(img, jnp.float32),
            axis_taps_exact(h, nh), axis_taps_exact(w, nw)))
        assert np.array_equal(a.astype(np.float32), b), (h, w, nh, nw)
        # independent exact oracle in python ints
        i0r, fnr, dr = axis_taps_exact(h, nh)
        i0c, fnc, dc = axis_taps_exact(w, nw)
        x = img.astype(object)
        for t in range(0, nh, max(nh // 7, 1)):
            for u in range(0, nw, max(nw // 7, 1)):
                want = _fraction_floor(
                    x[i0r[t], i0c[u]], x[i0r[t], min(i0c[u] + 1, w - 1)],
                    x[min(i0r[t] + 1, h - 1), i0c[u]],
                    x[min(i0r[t] + 1, h - 1), min(i0c[u] + 1, w - 1)],
                    fnr[t], dr, fnc[u], dc)
                assert a[t, u] == want


def test_projection_plan_exhaustive():
    """Full-lattice brute force: the plan's f32 chain == the reference's
    NumPy-2 f64-promoted store for every integer (gx, gy) pair; mismatches
    only on exact-cancellation lines with both sides < 2^-40."""
    plan = projection_plan(4, False, gmax=1020)
    assert plan is not None
    max_theta = np.pi
    theta = np.linspace(0, max_theta, 4 + 1)[:-1]
    cs, sn = np.cos(theta), np.sin(theta)
    g = np.arange(-1020, 1021, dtype=np.float64)
    gx64, gy64 = g[:, None], g[None, :]
    gx32 = gx64.astype(np.float32)
    gy32 = gy64.astype(np.float32)
    for k in range(4):
        ref = (gx64 * cs[k] - gy64 * sn[k]).astype(np.float32)
        mode, terms = plan.bins[k]
        got = _eval_terms_np(terms, gx32, gy32, mode)
        neq = ref != got
        assert int(neq.sum()) == plan.exceptions[k]
        if neq.any():
            tiny = plan.tiny_bound
            assert (np.abs(ref[neq]) < tiny).all()
            assert (np.abs(got[neq]) < tiny).all()


def test_projection_jnp_matches_np_sim():
    """The device (jnp) chain == the NumPy f32 simulation the exhaustive
    verification ran against (IEEE f32 ops on both sides)."""
    plan = projection_plan(4, False, gmax=1020)
    rng = np.random.RandomState(2)
    gx = rng.randint(-1020, 1021, (64, 64)).astype(np.float32)
    gy = rng.randint(-1020, 1021, (64, 64)).astype(np.float32)
    # include the cancellation lines
    gx[0] = gy[0]
    gx[1] = -gy[1]
    for k in range(4):
        mode, terms = plan.bins[k]
        a = _eval_terms_np(terms, gx, gy, mode)
        b = np.asarray(_eval_terms_jnp(terms, jnp.asarray(gx),
                                       jnp.asarray(gy), mode))
        assert np.array_equal(a, b), k
