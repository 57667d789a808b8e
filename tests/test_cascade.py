"""Parity of the masked-lockstep cascade vs the reference's
survivor-compaction semantics (oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from waldboost_tpu.ops import cascade as cop


def random_stage(rng, window, n_channels, kind="depth2"):
    m, n = window
    def feat():
        return [rng.randint(m), rng.randint(n), rng.randint(n_channels)]
    if kind == "stump":
        return dict(feature=np.array([feat(), [0, 0, 0], [0, 0, 0]]),
                    threshold=np.array([rng.randn(), 0, 0], "f"),
                    left=np.array([1, -1, -1]), right=np.array([2, -1, -1]),
                    prediction=rng.randn(3).astype("f"))
    # full depth-2 tree, sklearn-style numbering
    return dict(
        feature=np.array([feat(), feat(), [0, 0, 0], [0, 0, 0], feat(),
                          [0, 0, 0], [0, 0, 0]]),
        threshold=rng.randn(7).astype("f"),
        left=np.array([1, 2, -1, -1, 5, -1, -1]),
        right=np.array([4, 3, -1, -1, 6, -1, -1]),
        prediction=rng.randn(7).astype("f"),
    )


@pytest.mark.parametrize("kind", ["stump", "depth2"])
@pytest.mark.parametrize("with_theta", [False, True])
def test_grid_eval_matches_oracle(kind, with_theta):
    rng = np.random.RandomState(0)
    window = (8, 8)
    C = 3
    X = rng.randn(30, 26, C).astype("f")
    stages = [random_stage(rng, window, C, kind) for _ in range(12)]
    if with_theta:
        thetas = [(-np.inf if t % 3 else rng.randn() * 0.5 - 0.5)
                  for t in range(12)]
    else:
        thetas = [-np.inf] * 12

    rs, cs, hs, n_weak_ref = oracle.predict_on_image(
        stages, thetas, X, window)

    casc, depth = cop.cascade_from_stages(stages, thetas)
    chw = jnp.transpose(jnp.asarray(X), (2, 0, 1))
    hmap, alive, n_weak = cop.cascade_response_grid(chw, casc, window, depth)
    grs, gcs = np.nonzero(np.asarray(alive))
    ghs = np.asarray(hmap)[grs, gcs]

    # identical survivor sets
    got = set(zip(grs.tolist(), gcs.tolist()))
    want = set(zip(rs.tolist(), cs.tolist()))
    assert got == want
    # identical scores (same accumulation order per window)
    want_scores = {(r, c): h for r, c, h in zip(rs, cs, hs)}
    for r, c, h in zip(grs, gcs, ghs):
        np.testing.assert_allclose(h, want_scores[(r, c)], rtol=1e-5, atol=1e-5)
    assert int(n_weak) == n_weak_ref


def test_grid_eval_stage_padding_is_inert():
    rng = np.random.RandomState(1)
    window = (6, 6)
    X = rng.randn(20, 22, 2).astype("f")
    stages = [random_stage(rng, window, 2) for _ in range(5)]
    thetas = [-np.inf, 0.1, -np.inf, -0.2, -np.inf]
    chw = jnp.transpose(jnp.asarray(X), (2, 0, 1))
    a, depth = cop.cascade_from_stages(stages, thetas)
    b, _ = cop.cascade_from_stages(stages, thetas, n_stages=16)
    ha, alive_a, _ = cop.cascade_response_grid(chw, a, window, depth)
    hb, alive_b, _ = cop.cascade_response_grid(chw, b, window, depth)
    np.testing.assert_array_equal(np.asarray(alive_a), np.asarray(alive_b))
    np.testing.assert_allclose(np.asarray(ha)[np.asarray(alive_a)],
                               np.asarray(hb)[np.asarray(alive_b)], rtol=1e-6)


def test_predict_samples_matches_oracle():
    rng = np.random.RandomState(2)
    window = (7, 5)
    C = 4
    X = rng.randn(50, window[0], window[1], C).astype("f")
    stages = [random_stage(rng, window, C) for _ in range(10)]
    thetas = [(-np.inf if t % 2 else rng.randn() * 0.3 - 0.3) for t in range(10)]
    H_ref, mask_ref = oracle.predict_samples(stages, thetas, X)
    casc, depth = cop.cascade_from_stages(stages, thetas)
    H, mask = cop.cascade_predict_samples(jnp.asarray(X), casc, depth)
    np.testing.assert_array_equal(np.asarray(mask), mask_ref)
    np.testing.assert_allclose(np.asarray(H)[mask_ref], H_ref[mask_ref],
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(H)[~mask_ref] == -np.inf)


def test_init_alive_prekills():
    rng = np.random.RandomState(3)
    window = (6, 6)
    X = rng.randn(20, 20, 2).astype("f")
    stages = [random_stage(rng, window, 2) for _ in range(3)]
    casc, depth = cop.cascade_from_stages(stages, [-np.inf] * 3)
    chw = jnp.transpose(jnp.asarray(X), (2, 0, 1))
    init = jnp.zeros((14, 14), bool).at[2:5, 3:7].set(True)
    hs, alive, n_weak = cop.cascade_response_grid(chw, casc, window, depth,
                                                  init_alive=init)
    alive = np.asarray(alive)
    assert alive[2:5, 3:7].all()
    outside = np.ones((14, 14), bool)
    outside[2:5, 3:7] = False
    assert not alive[outside].any()
    assert int(n_weak) == 3 * 3 * 4
