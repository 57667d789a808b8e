"""Fully on-device, mesh-shardable WaldBoost training step.

One boosting stage — exp-loss weights, histogram tree fit, score update, SPRT
threshold, stage statistics — as a single jitted program over fixed-capacity
(padded + masked) sample pools.  Under a mesh, the pools are sharded over the
data axis and XLA inserts the collectives: the only cross-chip reductions a
WaldBoost stage needs are the global per-feature min/max, the weighted
node/class histograms, the leaf weight sums, and the threshold statistics
(SURVEY.md §2/§5 parallel-inventory: psum over ICI replaces the absent NCCL
layer of the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fit import TreeFitResult, fit_tree_complete
from ..training import fit_rejection_threshold_device
from .mesh import data_sharding, replicated

__all__ = ["StageResult", "make_train_step", "tree_predict_device"]


class StageResult(NamedTuple):
    tree: TreeFitResult
    theta: jax.Array   # ()
    H0: jax.Array      # updated scores (padded)
    H1: jax.Array
    p0: jax.Array      # ()
    p1: jax.Array      # ()
    loss: jax.Array    # ()
    v0: jax.Array = None  # post-stage validity masks (SPRT-pruned pools)
    v1: jax.Array = None


def tree_predict_device(tree: TreeFitResult, xf: jax.Array, max_depth: int) -> jax.Array:
    """Evaluate a heap-layout tree on flattened samples (N, F) -> (N,)."""
    N = xf.shape[0]
    node = jnp.zeros(N, jnp.int32)
    for _ in range(max_depth):
        f = jnp.take(tree.feature, node)
        leaf = f < 0
        fv = jnp.take_along_axis(xf, jnp.maximum(f, 0)[:, None], axis=1)[:, 0]
        go_right = fv > jnp.take(tree.threshold, node)
        child = 2 * node + 1 + go_right.astype(jnp.int32)
        node = jnp.where(leaf, node, child)
    return jnp.take(tree.pred, node)


def _stage_body(x0, H0, v0, x1, H1, v1, P0, P1, theta_in, use_sprt,
                alpha, max_depth, n_bins, min_samples_leaf):
    """x0/x1: (N?, F) flattened padded pools; H: scores; v: valid masks.
    ``theta_in``/``use_sprt``: rejection-schedule override (use_sprt=True ->
    estimate theta from data)."""
    n0 = jnp.maximum(jnp.sum(v0), 1).astype(jnp.float32)
    n1 = jnp.maximum(jnp.sum(v1), 1).astype(jnp.float32)
    # exp-loss weights (/root/reference/waldboost/training.py:14-15,159-161)
    W0 = jnp.where(v0, jnp.exp(H0), 0.0) / n0 / 2
    W1 = jnp.where(v1, jnp.exp(-H1), 0.0) / n1 / 2

    xf = jnp.concatenate([x0, x1], axis=0)
    y = jnp.concatenate([jnp.zeros(x0.shape[0], jnp.int32),
                         jnp.ones(x1.shape[0], jnp.int32)])
    w = jnp.concatenate([W0, W1])
    valid = jnp.concatenate([v0, v1])
    # class-balanced split weights (each class sums to 0.5)
    s0 = jnp.maximum(jnp.sum(W0), 1e-30)
    s1 = jnp.maximum(jnp.sum(W1), 1e-30)
    wb = jnp.concatenate([W0 / (s0 * 2), W1 / (s1 * 2)])

    tree = fit_tree_complete(xf, y, wb, w, valid, max_depth=max_depth,
                             n_bins=n_bins, min_samples_leaf=min_samples_leaf)

    H0n = H0 + tree_predict_device(tree, x0, max_depth)
    H1n = H1 + tree_predict_device(tree, x1, max_depth)

    theta_est = fit_rejection_threshold_device(H0n, H1n, P0, P1, alpha,
                                               v0=v0, v1=v1)
    theta = jnp.where(use_sprt, theta_est, theta_in)

    p0 = jnp.sum(jnp.logical_and(H0n >= theta, v0)) / n0
    p1 = jnp.sum(jnp.logical_and(H1n >= theta, v1)) / n1
    loss = (jnp.sum(jnp.where(v0, jnp.exp(H0n), 0.0)) / n0
            + jnp.sum(jnp.where(v1, jnp.exp(-H1n), 0.0)) / n1) / 2
    # SPRT pruning: rejected samples leave the pool (the reference rescores
    # then drops -inf samples, /root/reference/waldboost/samples.py:287-299)
    v0n = jnp.logical_and(v0, H0n >= theta)
    v1n = jnp.logical_and(v1, H1n >= theta)
    return StageResult(tree=tree, theta=theta, H0=H0n, H1=H1n, p0=p0, p1=p1,
                       loss=loss, v0=v0n, v1=v1n)


def make_train_step(alpha: float = 0.1, max_depth: int = 2, n_bins: int = 256,
                    min_samples_leaf: int = 1, mesh=None):
    """Build the jitted stage-training step.

    Signature of the returned function:
        step(x0, H0, v0, x1, H1, v1, P0, P1, theta_in, use_sprt) -> StageResult

    With ``mesh``, sample pools (x*, H*, v*) are sharded over the data axis
    and the result is replicated — XLA turns the histogram/threshold
    reductions into psum/all-gather collectives over ICI.
    """
    body = functools.partial(_stage_body, alpha=alpha, max_depth=max_depth,
                             n_bins=n_bins, min_samples_leaf=min_samples_leaf)
    if mesh is None:
        return jax.jit(body)
    sh1 = lambda ndim: data_sharding(mesh, ndim)
    rep = replicated(mesh)
    in_sh = (sh1(2), sh1(1), sh1(1), sh1(2), sh1(1), sh1(1), rep, rep, rep, rep)
    out_sh = StageResult(
        tree=TreeFitResult(feature=rep, threshold=rep, left=rep, right=rep,
                           pred=rep),
        theta=rep, H0=sh1(1), H1=sh1(1), p0=rep, p1=rep, loss=rep,
        v0=sh1(1), v1=sh1(1))
    return jax.jit(body, in_shardings=in_sh, out_shardings=out_sh)
