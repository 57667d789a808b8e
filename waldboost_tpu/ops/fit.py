"""On-device decision-tree fitting via weighted histograms.

TPU-native replacement for both of the reference's tree trainers:

* the sklearn CART wrapper (/root/reference/waldboost/training.py:34-50), and
* the FPGA scratch trainer's weighted-histogram information-gain split
  (/root/reference/waldboost/fpga/training.py:15-57), which SURVEY.md §7
  identifies as the cleaner, already-quantized spec to follow.

The tree is grown as a *complete* heap-ordered tree of static depth
``max_depth`` (node k's children are 2k+1 / 2k+2), with per-node early
leaf-termination (``min_samples_leaf``) recorded in the left/right arrays.
Every quantity is a fixed-shape array op: per-(node, class, feature) weighted
histograms via segment-sum, cumulative sums along the bin axis, entropy gain,
and a flat argmax — no data-dependent shapes anywhere, so the whole fit jits
and shards (the histograms are the only cross-sample reduction, which makes
multi-chip training a single ``psum`` — see waldboost_tpu.parallel).

Numerical notes:
* Binning is selectable; the default is per-feature QUANTILE edges
  (outlier-robust; AUC == sklearn CART within noise, BASELINE.md
  "Training-quality parity") with thresholds that are actual data values,
  ``bin(x) =`` count of edges ``< x`` so ``x <= threshold <=> bin(x) <= b``
  exactly.  ``binning="uniform"`` keeps the global grid
  ``fmin + (b+1)*width`` with ``bin(x) = clip(ceil((x-fmin)/width)-1, 0,
  B-1)`` — the same exact fit/inference consistency, and exact splits for
  integer-valued channels with range <= B.
* Entropy uses a 0*log(0)=0 convention (the reference's raw ``p*log2(p)`` can
  produce NaN on pure nodes; this is a deliberate robustness improvement).
* Class balancing matches the FPGA trainer (each class's split-weights sum to
  0.5, /root/reference/waldboost/fpga/training.py:105-107); leaf predictions
  use the *raw* weights with +1e-3 smoothing
  (/root/reference/waldboost/fpga/training.py:158-162).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_tree_complete", "TreeFitResult", "prune_heap_tree"]


class TreeFitResult(NamedTuple):
    feature: jax.Array    # (n_nodes,) int32 flat feature index, -1 for leaf
    threshold: jax.Array  # (n_nodes,) float32
    left: jax.Array       # (n_nodes,) int32 (-1 leaf)
    right: jax.Array      # (n_nodes,) int32
    pred: jax.Array       # (n_nodes,) float32 log-odds


def _entropy2(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Binary entropy of unnormalized masses, with 0*log(0) = 0."""
    tot = p0 + p1
    tot = jnp.where(tot > 0, tot, 1.0)
    q0 = p0 / tot
    q1 = p1 / tot
    h0 = jnp.where(q0 > 0, -q0 * jnp.log2(jnp.where(q0 > 0, q0, 1.0)), 0.0)
    h1 = jnp.where(q1 > 0, -q1 * jnp.log2(jnp.where(q1 > 0, q1, 1.0)), 0.0)
    return h0 + h1


def hist_mode_from_env() -> str:
    """Resolve the histogram implementation OUTSIDE any jit: "einsum_bf16"
    (MXU indicator contraction, bf16 operands — the TPU default),
    "einsum_f32", or "scatter" (the legacy vmapped segment-sum).  Callers
    resolve this per call and pass it as the STATIC ``hist_mode`` argument;
    reading the env inside the traced function would bake the first
    value into the jit cache and silently ignore later toggles."""
    if os.environ.get("WB_HIST_EINSUM", "1") != "1":
        return "scatter"
    bf16 = os.environ.get("WB_HIST_BF16", "tpu")
    if bf16 == "1" or (bf16 == "tpu" and jax.default_backend() == "tpu"):
        return "einsum_bf16"
    return "einsum_f32"


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "n_bins", "min_samples_leaf", "binning",
                     "hist_mode"),
)
def fit_tree_complete(
    xf: jax.Array,            # (N, F) float32 flattened sample features
    y: jax.Array,             # (N,) int32 class labels {0, 1}
    w_split: jax.Array,       # (N,) float32 class-balanced split weights
    w_pred: jax.Array,        # (N,) float32 raw weights for leaf predictions
    valid: jax.Array,         # (N,) bool padding mask
    max_depth: int = 2,
    n_bins: int = 256,
    min_samples_leaf: int = 1,
    feature_mask: Optional[jax.Array] = None,  # (max_depth, F) bool allowed per depth
    binning: str = "quantile",
    hist_mode: str = "auto",  # see hist_mode_from_env (static)
) -> TreeFitResult:
    N, F = xf.shape
    B = int(n_bins)
    D = int(max_depth)
    n_nodes = 2 ** (D + 1) - 1
    if hist_mode == "auto":
        # trace-time fallback for direct callers; the package's own call
        # sites resolve outside the jit so env toggles take effect
        hist_mode = hist_mode_from_env()
    # the einsum path materializes an (N, F, B-1) indicator operand; at
    # large pool capacities that can exceed sensible HBM budgets where the
    # scatter path ran in O(N*F) — bound it (static decision from shapes)
    ind_bytes = N * F * max(B - 1, 1) * (2 if hist_mode == "einsum_bf16"
                                         else 4)
    if hist_mode != "scatter" and ind_bytes > 2 * 1024 ** 3:
        hist_mode = "scatter"
    use_einsum_hist = hist_mode != "scatter"

    xf = xf.astype(jnp.float32)
    w_split = jnp.where(valid, w_split, 0.0).astype(jnp.float32)
    w_pred = jnp.where(valid, w_pred, 0.0).astype(jnp.float32)

    if binning == "quantile":
        # -- per-feature QUANTILE grid (LightGBM-style): outlier features
        # stretch a uniform [fmin, fmax] grid until most mass shares a few
        # bins (the measured round-2 training-quality gap); quantile edges
        # put ~equal sample counts in every bin at any B.  bin(x) = count
        # of edges < x, so ``x <= edges[b]  <=>  bin(x) <= b`` exactly
        # (fit/inference consistency, duplicate edges included).
        # Edges come from a deterministic strided SUBSAMPLE of <=2048
        # rows: the (N, F) axis-0 device sort is the cost of this binning
        # (scripts/exp_r9_qcost.py: 237 ms/stage full vs 44 uniform) and
        # edge ESTIMATES from a quarter of the pool bin identically for
        # boosting purposes (LightGBM subsamples the same way).  Stride
        # keeps the choice independent of the mesh (same rows at any
        # device count).
        stride = max(1, -(-N // 2048))
        xsub = xf[::stride]
        vsub = valid[::stride]
        Ns = xsub.shape[0]
        xs = jnp.sort(jnp.where(vsub[:, None], xsub, jnp.inf), axis=0)
        nv = jnp.sum(vsub).astype(jnp.float32)
        ranks = jnp.arange(1, B, dtype=jnp.float32) * (nv / B)
        idx = jnp.clip(jnp.ceil(ranks).astype(jnp.int32) - 1, 0, Ns - 1)
        edges = xs[idx, :]                      # (B-1, F) nondecreasing
        edges = jnp.where(jnp.isfinite(edges), edges, jnp.float32(3e38))
        # bin(x) = count of edges < x (== searchsorted side='left'), as a
        # fused broadcast compare+reduce: searchsorted's scan method is 8
        # serial GATHER rounds over 2.4M elements on TPU and measured
        # ~190 ms/stage of the quantile path's cost (exp_r9_qcost)
        bins = jnp.sum(edges[None, :, :] < xf[:, None, :], axis=1,
                       dtype=jnp.int32)
        edges_cmp = edges  # (B-1, F): bins <= b  <=>  x <= edges[b]

        def thr_of(best_f, best_b):
            return edges[jnp.clip(best_b, 0, B - 2), best_f]
    else:
        # -- global per-feature uniform quantization grid -------------------
        fmin = jnp.min(jnp.where(valid[:, None], xf, jnp.inf), axis=0)
        fmax = jnp.max(jnp.where(valid[:, None], xf, -jnp.inf), axis=0)
        fmin = jnp.where(jnp.isfinite(fmin), fmin, 0.0)
        fmax = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
        width = jnp.maximum((fmax - fmin) / B, 1e-12)
        bins = jnp.clip(jnp.ceil((xf - fmin[None, :]) / width[None, :]) - 1,
                        0, B - 1)
        bins = bins.astype(jnp.int32)  # (N, F)
        # einsum-histogram comparison edges, matching thr_of's expression
        # (the direct x <= edge comparison is self-consistent with the
        # thresholds inference applies)
        edges_cmp = fmin[None, :] + jnp.arange(
            1, B, dtype=jnp.float32)[:, None] * width[None, :]

        def thr_of(best_f, best_b):
            return fmin[best_f] + (best_b + 1).astype(jnp.float32) * width[best_f]

    # -- outputs ------------------------------------------------------------
    feature = jnp.full(n_nodes, -1, jnp.int32)
    threshold = jnp.zeros(n_nodes, jnp.float32)
    left = jnp.full(n_nodes, -1, jnp.int32)
    right = jnp.full(n_nodes, -1, jnp.int32)
    w0_acc = jnp.zeros(n_nodes, jnp.float32)
    w1_acc = jnp.zeros(n_nodes, jnp.float32)

    node = jnp.zeros(N, jnp.int32)  # heap node id per sample

    def accumulate_pred(w0_acc, w1_acc, node, d):
        """Add per-node class masses for nodes at heap level d."""
        base = 2 ** d - 1
        at_level = jnp.logical_and(node >= base, valid)
        seg = jnp.where(at_level, node, n_nodes)
        w0_acc = w0_acc + jax.ops.segment_sum(
            w_pred * (y == 0) * at_level, seg, num_segments=n_nodes + 1)[:n_nodes]
        w1_acc = w1_acc + jax.ops.segment_sum(
            w_pred * (y == 1) * at_level, seg, num_segments=n_nodes + 1)[:n_nodes]
        return w0_acc, w1_acc

    for d in range(D):
        n_level = 2 ** d
        base = n_level - 1
        w0_acc, w1_acc = accumulate_pred(w0_acc, w1_acc, node, d)

        at_level = jnp.logical_and(node >= base, valid)
        local = jnp.where(at_level, node - base, n_level)  # trash slot n_level

        # -- histograms: (F, n_level, B) cumulative class masses ------------
        if use_einsum_hist:
            # MXU path: l[c, f, b] = sum_n wc[c, n] * [x_nf <= edge_bf] as
            # ONE (C, N) @ (N, F*(B-1)) indicator contraction.  The vmapped
            # per-feature segment-sum alternative lowers to F serial
            # scatters and measured 38 of the stage program's 40.6 ms on
            # TPU (scripts/exp_r10_steptrace.py).  The indicator is exact
            # {0, 1}; the TPU's default bf16 matmul pass rounds only the
            # weights' mantissa (2^-9 relative), which can perturb split
            # RANKING near exact ties only — leaf predictions and stage
            # statistics flow through the exact f32 segment-sums around
            # this.  WB_HIST_EINSUM=0 restores the scatter path.
            C2 = n_level * 2
            cls = jnp.where(at_level, local * 2 + y, C2)
            wc = jnp.where(cls[None, :] == jnp.arange(C2)[:, None],
                           w_split[None, :], 0.0)            # (C2, N) f32
            ind = xf[:, :, None] <= edges_cmp.T[None, :, :]  # (N, F, B-1)
            # bf16 operands (default on TPU) halve the indicator's HBM
            # traffic — {0,1} is bf16-exact, the accumulator stays f32,
            # and the TPU's DEFAULT f32 matmul pass rounds operands to
            # bf16 anyway (so numerics are identical on TPU and only the
            # traffic differs: 12.1 -> 6.5 ms/step, exp_r10_stepcost.py).
            # CPU keeps true-f32 operands (bf16 there is emulated AND
            # would change numerics, since CPU matmuls are real f32).
            if hist_mode == "einsum_bf16":
                l_part = jnp.einsum("cn,nfb->cfb",
                                    wc.astype(jnp.bfloat16),
                                    ind.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            else:
                l_part = jnp.einsum("cn,nfb->cfb", wc,
                                    ind.astype(jnp.float32))
            tot_c = jnp.sum(wc, axis=1)                      # exact totals
            l_all = jnp.concatenate(
                [l_part, jnp.broadcast_to(tot_c[:, None, None],
                                          (C2, F, 1))], axis=-1)
            l_all = l_all.reshape(n_level, 2, F, B)
            l0 = jnp.transpose(l_all[:, 0], (1, 0, 2))       # (F, n_level, B)
            l1 = jnp.transpose(l_all[:, 1], (1, 0, 2))
        else:
            seg_nc = local * 2 + y  # (N,)
            segid = seg_nc[:, None] * B + bins  # (N, F)
            n_seg = (n_level + 1) * 2 * B

            def per_feature(seg_col):
                return jax.ops.segment_sum(w_split, seg_col,
                                           num_segments=n_seg)

            hist = jax.vmap(per_feature, in_axes=1)(segid)  # (F, n_seg)
            hist = hist.reshape(F, n_level + 1, 2, B)[:, :n_level]

            l0 = jnp.cumsum(hist[:, :, 0, :], axis=-1)  # (F, n_level, B)
            l1 = jnp.cumsum(hist[:, :, 1, :], axis=-1)
        l0_tot = l0[..., -1:]
        l1_tot = l1[..., -1:]
        r0 = l0_tot - l0
        r1 = l1_tot - l1
        tot = l0_tot + l1_tot
        tot_safe = jnp.where(tot > 0, tot, 1.0)
        left_w = (l0 + l1) / tot_safe
        right_w = (r0 + r1) / tot_safe
        gain = _entropy2(l0_tot, l1_tot) - (
            left_w * _entropy2(l0 + 1e-4, l1 + 1e-4)
            + right_w * _entropy2(r0 + 1e-4, r1 + 1e-4)
        )  # (F, n_level, B)
        # last bin = empty right side; exclude as a split candidate
        gain = gain.at[..., B - 1].set(-jnp.inf)
        if feature_mask is not None:
            gain = jnp.where(feature_mask[d][:, None, None], gain, -jnp.inf)

        flat = gain.transpose(1, 0, 2).reshape(n_level, F * B)
        best = jnp.argmax(flat, axis=1)              # (n_level,)
        best_f = (best // B).astype(jnp.int32)
        best_b = (best % B).astype(jnp.int32)
        best_thr = thr_of(best_f, best_b)

        # -- leaf decision ---------------------------------------------------
        cnt = jax.ops.segment_sum(
            at_level.astype(jnp.float32), jnp.where(at_level, local, n_level),
            num_segments=n_level + 1)[:n_level]
        # a node needs at least 2 samples to split (sklearn min_samples_split)
        make_leaf = cnt < float(max(min_samples_leaf, 2))

        ids = base + jnp.arange(n_level, dtype=jnp.int32)
        feature = feature.at[ids].set(jnp.where(make_leaf, -1, best_f))
        threshold = threshold.at[ids].set(jnp.where(make_leaf, 0.0, best_thr))
        left = left.at[ids].set(jnp.where(make_leaf, -1, 2 * ids + 1))
        right = right.at[ids].set(jnp.where(make_leaf, -1, 2 * ids + 2))

        # -- route samples ----------------------------------------------------
        node_f = best_f[jnp.clip(local, 0, n_level - 1)]
        node_t = best_thr[jnp.clip(local, 0, n_level - 1)]
        node_leaf = make_leaf[jnp.clip(local, 0, n_level - 1)]
        xv = jnp.take_along_axis(xf, node_f[:, None], axis=1)[:, 0]
        go_right = xv > node_t
        child = 2 * node + 1 + go_right.astype(jnp.int32)
        node = jnp.where(jnp.logical_and(at_level, jnp.logical_not(node_leaf)),
                         child, node)

    w0_acc, w1_acc = accumulate_pred(w0_acc, w1_acc, node, D)
    pred = jnp.log((w1_acc + 1e-3) / (w0_acc + 1e-3)) / 2.0
    return TreeFitResult(feature=feature, threshold=threshold, left=left,
                         right=right, pred=pred.astype(jnp.float32))


def prune_heap_tree(feature: np.ndarray, threshold: np.ndarray,
                    left: np.ndarray, right: np.ndarray, pred: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Drop unreachable heap nodes (children of early leaves) and renumber in
    BFS order.  Host-side post-processing of :func:`fit_tree_complete`."""
    feature = np.asarray(feature)
    order = []
    remap = {}
    queue = [0]
    while queue:
        k = queue.pop(0)
        remap[k] = len(order)
        order.append(k)
        if left[k] >= 0:
            queue.append(int(left[k]))
            queue.append(int(right[k]))
    idx = np.array(order, int)
    new_left = np.array([remap[int(l)] if l >= 0 else -1 for l in left[idx]], np.int32)
    new_right = np.array([remap[int(r)] if r >= 0 else -1 for r in right[idx]], np.int32)
    return (feature[idx].astype(np.int32), threshold[idx].astype(np.float32),
            new_left, new_right, pred[idx].astype(np.float32))
