"""fit_rejection_threshold_device vs the host scan on adversarial inputs.

The host scan is the reference-parity implementation
(/root/reference/waldboost/training.py:191-220); the device version must
match it on duplicates, ties at the minimum, non-overlap, degenerate pools,
and heavy padding (VERDICT r1 weak #5).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from waldboost_tpu.training import (fit_rejection_threshold,
                                    fit_rejection_threshold_device)


def _device(H0, H1, P0, P1, alpha, v0=None, v1=None):
    return float(fit_rejection_threshold_device(
        jnp.asarray(np.asarray(H0, np.float32)),
        jnp.asarray(np.asarray(H1, np.float32)),
        jnp.float32(P0), jnp.float32(P1), jnp.float32(alpha),
        v0=None if v0 is None else jnp.asarray(v0),
        v1=None if v1 is None else jnp.asarray(v1)))


def _host(H0, H1, P0, P1, alpha):
    return fit_rejection_threshold(np.asarray(H0, np.float32), P0,
                                   np.asarray(H1, np.float32), P1, alpha)


CASES = [
    # random overlapping
    (np.random.RandomState(0).randn(200) - 0.3,
     np.random.RandomState(1).randn(200) + 0.8),
    # heavy duplicates
    (np.repeat([-1.0, -0.5, 0.0, 0.5], 50),
     np.repeat([-0.5, 0.0, 0.5, 1.0], 50)),
    # ties at the global minimum
    (np.concatenate([np.full(30, -2.0), np.random.RandomState(2).randn(100)]),
     np.concatenate([np.full(10, -2.0),
                     np.random.RandomState(3).randn(100) + 1.0])),
    # non-overlapping classes -> min(H1)
    (np.random.RandomState(4).rand(64) - 2.0,
     np.random.RandomState(5).rand(64) + 2.0),
    # two unique values only -> -inf
    (np.full(16, 0.0), np.full(16, 1.0)),
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("alpha", [0.05, 0.2])
def test_device_matches_host(case, alpha):
    H0, H1 = CASES[case]
    P0, P1 = 0.6, 0.4
    want = _host(H0, H1, P0, P1, alpha)
    got = _device(H0, H1, P0, P1, alpha)
    assert got == pytest.approx(want, rel=1e-6, abs=1e-6), (case, want, got)


@pytest.mark.parametrize("alpha", [0.05, 0.2])
def test_device_matches_host_with_padding(alpha):
    rng = np.random.RandomState(7)
    H0 = (rng.randn(300) - 0.2).astype(np.float32)
    H1 = (rng.randn(300) + 0.7).astype(np.float32)
    want = _host(H0[:111], H1[:53], 0.55, 0.45, alpha)
    v0 = np.zeros(300, bool)
    v0[:111] = True
    v1 = np.zeros(300, bool)
    v1[:53] = True
    # padded entries carry adversarial garbage values
    H0p = H0.copy()
    H0p[111:] = -100.0
    H1p = H1.copy()
    H1p[53:] = np.inf
    got = _device(H0p, H1p, 0.55, 0.45, alpha, v0=v0, v1=v1)
    assert got == pytest.approx(want, rel=1e-6, abs=1e-6)


def test_device_empty_class_padding():
    """All-padded class: the host returns -inf for an empty class."""
    rng = np.random.RandomState(8)
    H0 = rng.randn(64).astype(np.float32)
    H1 = rng.randn(64).astype(np.float32)
    v1 = np.zeros(64, bool)
    got = _device(H0, H1, 0.5, 0.5, 0.2, v1=v1)
    assert got == -np.inf
