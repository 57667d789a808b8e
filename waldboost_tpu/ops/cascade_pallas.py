"""Pallas TPU kernel: fused soft-cascade evaluation with tile-level SPRT exit.

The XLA lockstep evaluator (ops.cascade.cascade_response_grid) re-reads the
channel canvas from HBM for every stage's node slices and cannot stop early.
This kernel holds a canvas tile (+window halo) in VMEM, runs the *entire*
cascade over that tile's window origins in one pass, and exits the stage loop
as soon as every window in the tile is rejected — the tile-granular version
of the reference's survivor-compaction early exit
(/root/reference/waldboost/model.py:249-258).  Because SPRT rejection is
monotone per window, tile-level exit preserves the exact survivor set and
scores.

HBM traffic: one read of the canvas (plus halo overlap) and one write of the
score/alive maps — independent of cascade length.  Compute scales with the
cascade's *eval cost* (stages with any live window in the tile), not its
length.

Node tables (T, NN) live in SMEM; per-stage node tests are dynamic slices of
the VMEM tile (sublane/lane shifts by the in-window feature offset).  The
canvas tile (overlapping halos between neighbouring tiles) is fetched with an
explicit async DMA because BlockSpec blocks cannot overlap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cascade import Cascade, CascadeMeta

__all__ = ["cascade_response_grid_pallas"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(T, NN, n_internal, depth, TU, TV, HU, HV, C, m, n, complete):
    def kernel(fr_ref, fc_ref, fch_ref, thr_ref, left_ref, right_ref,
               pred_ref, theta_ref, active_ref,
               mask_ref, canvas_hbm,
               hs_ref, alive_ref, nweak_ref,
               tile_ref, dma_sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        copy = pltpu.make_async_copy(
            canvas_hbm.at[:, pl.ds(i * TU, TU + HU), pl.ds(j * TV, TV + HV)],
            tile_ref,
            dma_sem,
        )
        copy.start()
        copy.wait()

        # alive carried as f32 {0,1}: Mosaic's i1 vector relayouts are
        # fragile inside while_loop carries, and u8 vector compares are
        # unsupported — the mask arrives as f32 already
        alive0 = mask_ref[...]

        def stage_body(carry):
            t, hs, alive, n_weak = carry

            bins = []
            for jj in range(NN):
                if jj < n_internal:
                    # Mosaic requires 8/128-aligned dynamic slice offsets on
                    # the tiled dims, and its dynamic rotates miscompile on
                    # multi-register shapes (measured on v5e).  The feature
                    # offsets are bounded by the window (m x n, static), so
                    # branch to the matching static slice with lax.switch —
                    # one executed slice per axis.
                    plane = tile_ref[fch_ref[t, jj]]
                    rowed = jax.lax.switch(
                        fr_ref[t, jj],
                        [lambda p=plane, r=r: p[r:r + TU, :] for r in range(m)])
                    patch = jax.lax.switch(
                        fc_ref[t, jj],
                        [lambda a=rowed, c=c: a[:, c:c + TV] for c in range(n)])
                    bins.append(patch <= thr_ref[t, jj])
                else:
                    bins.append(None)

            if complete:
                # canonical complete heap tree: balanced select tree
                def rec(h, d):
                    if d == depth:
                        return jnp.full((TU, TV), pred_ref[t, h])
                    return jnp.where(bins[h], rec(2 * h + 1, d + 1),
                                     rec(2 * h + 2, d + 1))
                resp = rec(0, 0)
            else:
                node = jnp.zeros((TU, TV), jnp.int32)
                for _ in range(depth):
                    new_node = node
                    for jj in range(NN):
                        lft = left_ref[t, jj]
                        rgt = right_ref[t, jj]
                        if bins[jj] is not None:
                            tgt = jnp.where(bins[jj], lft, rgt)
                            tgt = jnp.where(lft < 0, jj, tgt)
                            new_node = jnp.where(node == jj, tgt, new_node)
                        # leaves route to themselves: node already == jj
                    node = new_node
                resp = jnp.zeros((TU, TV), jnp.float32)
                for jj in range(NN):
                    resp = jnp.where(node == jj, pred_ref[t, jj], resp)

            n_weak = n_weak + (jnp.sum(alive).astype(jnp.int32)
                               * active_ref[t, 0].astype(jnp.int32))
            hs = hs + alive * resp
            alive = alive * (hs >= theta_ref[t, 0]).astype(jnp.float32)
            return t + 1, hs, alive, n_weak

        def stage_cond(carry):
            t, hs, alive, n_weak = carry
            return jnp.logical_and(t < T, jnp.sum(alive) > 0.0)

        init = (jnp.zeros((), jnp.int32),
                jnp.zeros((TU, TV), jnp.float32),
                alive0,
                jnp.zeros((), jnp.int32))
        _, hs, alive, n_weak = jax.lax.while_loop(stage_cond, stage_body, init)

        hs_ref[...] = hs
        alive_ref[...] = alive  # f32 {0,1}; Mosaic lacks f32->u8 casts
        # place the scalar at [0,0] of the (8,128) stat tile (no scatter on TPU)
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        nweak_ref[...] = jnp.where((rid == 0) & (cid == 0), n_weak, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("window", "meta", "tile", "interpret"),
)
def cascade_response_grid_pallas(
    canvas: jax.Array, casc: Cascade, valid_mask: jax.Array,
    window: Tuple[int, int], meta: CascadeMeta,
    tile: Tuple[int, int] = (256, 256), interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in equivalent of ops.cascade.cascade_response_grid(init_alive=...)
    as a fused Pallas kernel.  Returns (hs, alive, n_weak) on the
    (U-m, V-n) window-origin grid."""
    C, U, V = canvas.shape
    m, n = window
    gu, gv = max(U - m, 0), max(V - n, 0)
    TU, TV = tile
    TU = min(TU, _round_up(max(gu, 8), 8))
    TV = min(TV, _round_up(max(gv, 128), 128))
    depth = max(meta.depth, 1)
    n_internal = min(max(meta.n_internal, 1), casc.n_nodes)
    complete = getattr(meta, "complete", False)
    T, NN = casc.n_stages, casc.n_nodes

    gi = max(-(-gu // TU), 1)
    gj = max(-(-gv // TV), 1)
    # halo rounded up so DMA'd tile shapes are (8, 128)-aligned
    HU = _round_up(m, 8)
    HV = _round_up(n, 128)
    # pad canvas so every tile's halo load is in bounds
    U_pad = gi * TU + HU
    V_pad = gj * TV + HV
    canvas_p = jnp.pad(canvas.astype(jnp.float32),
                       ((0, 0), (0, U_pad - U), (0, V_pad - V)))
    mask_p = jnp.pad(valid_mask.astype(jnp.float32),
                     ((0, gi * TU - gu), (0, gj * TV - gv)))

    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    kernel = _make_kernel(T, NN, n_internal, depth, TU, TV, HU, HV, C, m, n, complete)

    hs, alive, nweak = pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[
            smem_spec((T, NN)),  # fr
            smem_spec((T, NN)),  # fc
            smem_spec((T, NN)),  # fch
            smem_spec((T, NN)),  # thr
            smem_spec((T, NN)),  # left
            smem_spec((T, NN)),  # right
            smem_spec((T, NN)),  # pred
            smem_spec((T, 1)),   # theta
            smem_spec((T, 1)),   # active
            pl.BlockSpec((TU, TV), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),   # valid mask tile
            pl.BlockSpec(memory_space=pl.ANY),    # canvas (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((TU, TV), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TU, TV), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gi * TU, gj * TV), jnp.float32),
            jax.ShapeDtypeStruct((gi * TU, gj * TV), jnp.float32),
            jax.ShapeDtypeStruct((gi * 8, gj * 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, TU + HU, TV + HV), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(casc.fr, casc.fc, casc.fch, casc.thr, casc.left, casc.right,
      casc.pred, casc.theta.reshape(T, 1), casc.active.reshape(T, 1),
      mask_p, canvas_p)

    return hs[:gu, :gv], alive[:gu, :gv] > 0, jnp.sum(nweak)
