"""Double-float (ops.dd) arithmetic: bitwise parity with f64 chains.

The float-image exact path (resize lerp, [1,2,1] prefilter accumulation,
projection store) rides these primitives; each must reproduce
``f32(f64 expression)`` bitwise on random data (the structured midpoint
ties that CAN diverge are a measured 0.09% corpus phenomenon — see the
float golden and PARITY.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waldboost_tpu.ops.dd import (dd_add, dd_const, dd_mul, dd_mul_f32,
                                  dd_round, lerp_dd, proj_dd, two_prod,
                                  two_sum)

N = 200_000


def test_two_sum_exact():
    rng = np.random.RandomState(0)
    a = (rng.randn(N) * 100).astype(np.float32)
    b = (rng.randn(N) * 0.01).astype(np.float32)
    s, e = jax.jit(two_sum)(a, b)
    s, e = np.asarray(s), np.asarray(e)
    np.testing.assert_array_equal(
        s.astype(np.float64) + e,
        a.astype(np.float64) + b.astype(np.float64))


def test_two_prod_exact():
    rng = np.random.RandomState(1)
    a = (rng.randn(N) * 300).astype(np.float32)
    b = rng.rand(N).astype(np.float32)
    p, e = jax.jit(two_prod)(a, b)
    p, e = np.asarray(p), np.asarray(e)
    np.testing.assert_array_equal(
        p.astype(np.float64) + e,
        a.astype(np.float64) * b.astype(np.float64))


def test_proj_dd_matches_f64_store():
    rng = np.random.RandomState(2)
    gx = (rng.randn(N) * 400).astype(np.float32)
    gy = (rng.randn(N) * 400).astype(np.float32)
    for th in np.linspace(0, np.pi, 5)[1:-1]:
        c, s = np.cos(th), np.sin(th)
        ref = (gx.astype(np.float64) * c
               - gy.astype(np.float64) * s).astype(np.float32)
        got = np.asarray(jax.jit(lambda a, b: proj_dd(a, b, c, s))(gx, gy))
        np.testing.assert_array_equal(got, ref)


def test_lerp_dd_two_pass_matches_f64():
    """Row pass feeding the col pass UNROUNDED — the resize structure."""
    rng = np.random.RandomState(3)
    top = (rng.rand(N) * 255).astype(np.float32)
    bot = (rng.rand(N) * 255).astype(np.float32)
    fr = rng.rand(N)
    fc = rng.rand(N)

    a64 = top.astype(np.float64) * (1 - fr) + bot.astype(np.float64) * fr
    b64 = bot.astype(np.float64) * (1 - fr) + top.astype(np.float64) * fr
    ref = (a64 * (1 - fc) + b64 * fc).astype(np.float32)

    def cs(v):
        hi = v.astype(np.float32)
        return hi, (v - hi).astype(np.float32)

    frh, frl = cs(fr)
    omh, oml = cs(1.0 - fr)
    fch, fcl = cs(fc)
    pch, pcl = cs(1.0 - fc)

    def run(t, b):
        z = jnp.zeros_like(t)
        A = lerp_dd((t, z), (b, z), frh, frl, omh, oml)
        B = lerp_dd((b, z), (t, z), frh, frl, omh, oml)
        return dd_round(lerp_dd(A, B, fch, fcl, pch, pcl))

    got = np.asarray(jax.jit(run)(top, bot))
    np.testing.assert_array_equal(got, ref)


def test_conv121_dd_matches_scipy_semantics():
    """scipy.ndimage accumulates [1,2,1] in f64 and stores f32 once."""
    from waldboost_tpu.ops.image import _conv121_dd

    rng = np.random.RandomState(4)
    x = (rng.rand(64, 512) * 255).astype(np.float32)
    ref = (x[:, :-2].astype(np.float64) + 2.0 * x[:, 1:-1]
           + x[:, 2:]).astype(np.float32)
    got = np.asarray(jax.jit(lambda v: _conv121_dd(v, axis=-1))(x))
    np.testing.assert_array_equal(got, ref)
