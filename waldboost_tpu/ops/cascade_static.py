"""Cascade-specialized Pallas TPU kernel: the cascade IS the program.

A WaldBoost cascade is frozen at serving time, so instead of routing node
tables through SMEM and branching over dynamic feature offsets (the generic
kernel in :mod:`.cascade_pallas`), this kernel *bakes the whole cascade into
the compiled program*: every stage is unrolled, every node test is a static
VMEM slice at the node's (row, col, channel) offset compared against an
immediate constant, and every response is a constant-leaf select tree.  The
per-stage cost drops to pure vector work — no SMEM loads, no switch chains,
no routing loops.

Early exit stays tile-granular (monotone SPRT rejection makes it exact):
stages are grouped into blocks of ``BLOCK`` and each block is wrapped in a
``lax.cond`` on "any window in this tile still alive".  Stages whose theta is
-inf statically skip the rejection compare.

The batch is a leading grid dimension — one kernel launch evaluates the whole
image batch (vs. the generic kernel's per-image launches).

Reference semantics anchor: /root/reference/waldboost/model.py:216-259 (dense
grid scan with per-stage SPRT rejection); the survivor set and scores are
identical because rejection is monotone per window.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["StaticCascade", "static_cascade_from_model",
           "cascade_response_grid_static"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: stages per early-exit block (each block is one lax.cond region)
BLOCK = 8


class StaticCascade:
    """Host-side (hashable) cascade description for kernel specialization.

    Node tables are plain numpy; ``key`` is a content digest used as the jit
    cache key, so two models with identical cascades share one compiled
    kernel.
    """

    def __init__(self, fr, fc, fch, thr, left, right, pred, theta):
        self.fr = np.asarray(fr, np.int32)
        self.fc = np.asarray(fc, np.int32)
        self.fch = np.asarray(fch, np.int32)
        self.thr = np.asarray(thr, np.float32)
        self.left = np.asarray(left, np.int32)
        self.right = np.asarray(right, np.int32)
        self.pred = np.asarray(pred, np.float32)
        self.theta = np.asarray(theta, np.float32)
        import hashlib
        h = hashlib.sha256()
        for a in (self.fr, self.fc, self.fch, self.thr, self.left,
                  self.right, self.pred, self.theta):
            h.update(a.tobytes())
            h.update(str(a.shape).encode())
        self.key = h.hexdigest()

    @property
    def n_stages(self) -> int:
        return self.fr.shape[0]

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, StaticCascade) and self.key == other.key


def static_cascade_from_model(model) -> StaticCascade:
    """Build a :class:`StaticCascade` from a Model's weak-classifier list
    (unpadded — the static kernel needs no stage padding)."""
    stages = [w.to_stage_dict() for w in model.classifier]
    nn = max((len(s["threshold"]) for s in stages), default=1)
    T = len(stages)
    fr = np.zeros((T, nn), np.int32)
    fc = np.zeros((T, nn), np.int32)
    fch = np.zeros((T, nn), np.int32)
    thr = np.zeros((T, nn), np.float32)
    left = np.full((T, nn), -1, np.int32)
    right = np.full((T, nn), -1, np.int32)
    pred = np.zeros((T, nn), np.float32)
    for t, s in enumerate(stages):
        k = len(s["threshold"])
        ftr = np.maximum(np.asarray(s["feature"], np.int32).reshape(k, 3), 0)
        fr[t, :k] = ftr[:, 0]
        fc[t, :k] = ftr[:, 1]
        fch[t, :k] = ftr[:, 2]
        thr[t, :k] = np.asarray(s["threshold"], np.float32)
        left[t, :k] = np.asarray(s["left"], np.int32)
        right[t, :k] = np.asarray(s["right"], np.int32)
        pred[t, :k] = np.asarray(s["prediction"], np.float32)
    theta = np.asarray(model.theta, np.float32) if T else np.zeros(0, np.float32)
    return StaticCascade(fr, fc, fch, thr, left, right, pred, theta)


def _make_static_kernel(sc: StaticCascade, TU, TV, HU, HV, C, m, n,
                        n_stages_cap=None, block=BLOCK, bands=1,
                        masked_out=False, with_nweak=True,
                        preshift_min_uses=2, preshift_lazy=False,
                        margin_enc=False, and_tree=False, fast=False,
                        fast_scores="bf16"):
    """Generate the specialized kernel body: unrolled stages, static slices,
    immediate-constant thresholds/predictions, blockwise tile early exit.

    ``bands`` splits the tile's window rows into independent horizontal
    bands, each with its own stage loop and early-exit conds over the shared
    VMEM tile — finer-grained SPRT exit (a single long-lived window only
    keeps its own band alive, not the whole tile).

    ``masked_out`` switches the output contract to the serving-extraction
    form: ONE (TU, TV) f32 output holding ``hs`` where alive else -inf (the
    exact input lax.approx_max_k wants — no separate alive map, no post-hoc
    jnp.where pass over an unaligned cropped map), plus a stats tile with
    n_weak at (0, 0) and the tile survivor count at (0, 1)."""
    T = sc.n_stages if n_stages_cap is None else min(sc.n_stages, n_stages_cap)

    # distinct (channel, column-offset) pairs across the cascade: with
    # ``preshift`` the kernel materializes one lane-aligned copy of the tile
    # per pair ONCE, so every node's operand load needs only a (cheap)
    # static sublane offset instead of a cross-lane shift per stage.
    # Pairs used only once don't amortize the copy — they stay direct reads.
    from collections import Counter
    pair_uses = Counter((int(sc.fch[t, nd]), int(sc.fc[t, nd]))
                        for t in range(T)
                        for nd in range(sc.fr.shape[1])
                        if sc.left[t, nd] >= 0)
    pairs = sorted(p for p, cnt in pair_uses.items()
                   if cnt >= preshift_min_uses)
    pair_idx = {p: q for q, p in enumerate(pairs)}
    # lazy materialization: each early-exit block shift-copies only the
    # pairs FIRST used in it (blocks run as a prefix chain, so a pair is
    # always materialized before use); a tile that dies after block k never
    # pays the copies for later blocks' pairs
    first_block = {}
    if preshift_lazy:
        if isinstance(block, int):
            blk_of = lambda t: t // block
        else:
            bounds, s0_, bi_ = [], 0, 0
            while s0_ < T:
                s0_ += block[min(bi_, len(block) - 1)]
                bounds.append(s0_)
                bi_ += 1
            blk_of = lambda t: next(i for i, b in enumerate(bounds) if t < b)
        for t in range(T):
            for nd in range(sc.fr.shape[1]):
                if sc.left[t, nd] >= 0:
                    p = (int(sc.fch[t, nd]), int(sc.fc[t, nd]))
                    if p in pair_idx:
                        first_block.setdefault(p, blk_of(t))

    # -inf-latch encoding (serving form without the n_weak counter): the
    # alive mask lives INSIDE hs — dead windows are exactly -inf, and the
    # SPRT rejection is hs = where(hs >= theta, hs, -inf).  One fewer
    # vector op per stage than the alive-multiply (cmp+select vs
    # cmp+astype+mul), half the early-exit cond carry, and the output IS
    # the carry (no final where pass).  Survivors and scores are identical:
    # -inf + resp stays -inf, so the latch is permanent.
    # deferred-AND encoding: carry (hs, alive) with UNMASKED sequential
    # adds (bit-exact scores), collect each stage's theta compare, and fold
    # them into `alive` with one balanced multiply TREE per early-exit
    # block.  The -inf latch's per-stage add->cmp->select is one serial
    # 3-op dependency chain; here the hs chain is adds only (1 serial
    # op/stage) and the compares/AND-tree schedule freely around it.
    # Survivor set identical (SPRT rejection is "some prefix compare
    # failed"; AND of {0,1} floats is exact and associative).
    at_enc = masked_out and not with_nweak and not margin_enc and and_tree
    inf_enc = masked_out and not with_nweak and not margin_enc \
        and not and_tree
    # fast serving mode (WB_SERVING_MODE=fast): the canvas/tiles are bf16
    # (half the channel-kernel write + cascade DMA traffic; values are the
    # fast channel kernel's bf16 roundings — NOT bit-exact), but the stage
    # chain itself stays f32: Mosaic (v5e, jax 0.9) legalizes NO packed
    # 16-bit vector compares — neither bf16 arith.cmpf nor i16 arith.cmpi
    # on bitcast operands (scripts/probe_mosaic_bf16.py / _bf16b.py probe
    # records) — so the hoped-for 2x-packed compare/select chain cannot
    # compile; operand reads upcast once at the preshift slab copy.
    assert not fast or (at_enc or inf_enc), \
        "fast mode requires the serving (masked, no-counter) encodings"
    del fast_scores  # routing/score dtypes are pinned f32 (see above)
    cdt = jnp.float32
    sdt = jnp.float32
    # margin encoding: instead of latching hs to -inf on rejection, carry the
    # running margin  mg = min_t (hs_t - theta_t)  alongside the UNLATCHED
    # prefix sum hs.  A window survives iff mg >= 0 (same set as the latch:
    # rejection is "some prefix fell below its theta"), and survivors'
    # scores are the plain prefix sum, untouched by masking.  Same vector-op
    # count per stage (add+sub+min vs add+cmp+select) but the add chain and
    # the min chain are INDEPENDENT — the latch's add->cmp->select is one
    # serial 3-op dependency chain per stage, which stalls the VPU.
    mg_enc = masked_out and not with_nweak and margin_enc

    def kernel_masked(mask_ref, canvas_hbm, out_ref, stats_ref,
                      tile_ref, dma_sem, pre_ref=None):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        gi_n = pl.num_programs(1)
        gj_n = pl.num_programs(2)
        total = pl.num_programs(0) * gi_n * gj_n
        s = (b * gi_n + i) * gj_n + j
        slot = jax.lax.rem(s, 2)

        def tile_dma(sl, bb, ii, jj):
            # each tile's halo fetch is prefetched by its PREDECESSOR grid
            # step (double buffering: the DMA rides under the previous
            # tile's cascade compute); every started DMA is waited exactly
            # once — dead tiles wait too, then ignore the data
            src = canvas_hbm.at[bb, :, pl.ds(ii * TU, TU + HU),
                                pl.ds(jj * TV, TV + HV)]
            return pltpu.make_async_copy(src, tile_ref.at[sl],
                                         dma_sem.at[sl])

        @pl.when(s == 0)
        def _first():
            tile_dma(slot, b, i, j).start()

        @pl.when(s + 1 < total)
        def _prefetch_next():
            s1 = s + 1
            b1 = s1 // (gi_n * gj_n)
            r1 = jax.lax.rem(s1, gi_n * gj_n)
            tile_dma(jax.lax.rem(s1, 2), b1, r1 // gj_n,
                     jax.lax.rem(r1, gj_n)).start()

        tile_dma(slot, b, i, j).wait()

        BH = TU // bands

        def make_block(ts, b0, bh, blk_i=None):
            def block_fn(carry):
                oks = []
                if mg_enc:
                    hs, mg = carry
                    alive = None
                elif inf_enc:
                    (hs,) = carry
                    alive = None
                elif with_nweak:
                    hs, alive, nweak_acc = carry
                else:
                    hs, alive = carry
                if preshift_lazy and pre_ref is not None and blk_i is not None:
                    for p2, fb in first_block.items():
                        if fb == blk_i:
                            ch2, c2 = p2
                            # slabs are f32; bf16 tiles (fast mode) upcast
                            # here, once per pair
                            pre_ref[pair_idx[p2]] = \
                                tile_ref[slot, ch2, :, c2:c2 + TV] \
                                .astype(jnp.float32)
                for t in ts:
                    def resp_of(node):
                        if sc.left[t, node] < 0:
                            return float(sc.pred[t, node])
                        r = int(sc.fr[t, node]) + b0
                        c = int(sc.fc[t, node])
                        ch = int(sc.fch[t, node])
                        if pre_ref is not None and (ch, c) in pair_idx:
                            q = pair_idx[(ch, c)]
                            opnd = pre_ref[q, r:r + bh, :]
                        else:
                            opnd = tile_ref[slot, ch, r:r + bh,
                                            c:c + TV].astype(jnp.float32)
                        bin_ = opnd <= float(sc.thr[t, node])
                        lo = resp_of(int(sc.left[t, node]))
                        hi = resp_of(int(sc.right[t, node]))
                        if isinstance(lo, float) and isinstance(hi, float) \
                                and lo == hi:
                            return lo
                        if isinstance(lo, float):
                            lo = jnp.asarray(lo, cdt)
                        if isinstance(hi, float):
                            hi = jnp.asarray(hi, cdt)
                        return jnp.where(bin_, lo, hi)
                    resp = resp_of(0)
                    if not isinstance(resp, float) and resp.dtype != sdt:
                        resp = resp.astype(sdt)
                    if with_nweak:
                        nweak_acc = nweak_acc + alive
                    # hs accumulates UNMASKED (no alive*resp multiply): a
                    # dead window's hs is garbage but is encoded -inf in the
                    # output, and `alive` itself latches at 0 through the
                    # rejection multiply, so survivors — alive at every
                    # stage — carry exactly the masked path's score
                    hs = hs + resp
                    th = float(sc.theta[t])
                    if np.isfinite(th):
                        if mg_enc:
                            mg = jnp.minimum(mg, hs - th)
                        elif inf_enc:
                            hs = jnp.where(hs >= th, hs, -jnp.inf)
                        elif at_enc:
                            # off the hs critical path: folded below
                            oks.append((hs >= th).astype(cdt))
                        else:
                            alive = alive * (hs >= th).astype(jnp.float32)
                if mg_enc:
                    return (hs, mg)
                if inf_enc:
                    return (hs,)
                if at_enc:
                    # balanced multiply tree over the block's compares
                    # ({0,1} floats: exact, associative).  The tree folds in
                    # the compare dtype (bf16 in fast mode — the throughput
                    # win); `alive` itself stays f32 — scalar bf16 cmpf /
                    # reductions fail to legalize in Mosaic (v5e), and the
                    # per-block convert is one op
                    while len(oks) > 1:
                        oks = [a * b for a, b in zip(oks[::2], oks[1::2])] \
                            + ([oks[-1]] if len(oks) % 2 else [])
                    if oks:
                        alive = alive * oks[0].astype(jnp.float32)
                    return (hs, alive)
                return (hs, alive, nweak_acc) if with_nweak else (hs, alive)
            return block_fn

        mask = mask_ref[...]
        any_valid = jnp.sum(mask) > 0.0

        @pl.when(any_valid)
        def _live_tile():
            # gap/padding tiles (no valid window origin) skip the pre-shift
            # pass and the whole cascade
            if pre_ref is not None and not preshift_lazy:
                for q, (ch, c) in enumerate(pairs):
                    pre_ref[q] = tile_ref[slot, ch, :,
                                          c:c + TV].astype(jnp.float32)

            count = None
            nweak = None
            for band in range(bands):
                b0 = band * BH
                bh = BH if band < bands - 1 else TU - b0
                if mg_enc:
                    carry = (jnp.zeros((bh, TV), jnp.float32),
                             jnp.where(mask[b0:b0 + bh, :] > 0.0,
                                       jnp.inf, -jnp.inf))
                elif inf_enc:
                    carry = (jnp.where(mask[b0:b0 + bh, :] > 0.0,
                                       jnp.zeros((bh, TV), sdt),
                                       jnp.asarray(-jnp.inf, sdt)),)
                else:
                    carry = (jnp.zeros((bh, TV), sdt),
                             mask[b0:b0 + bh, :])
                    if with_nweak:
                        carry = carry + (jnp.zeros((bh, TV), jnp.float32),)
                # int block -> uniform schedule; tuple -> explicit per-block
                # stage counts (coarse early / fine late: exits only fire in
                # the tail), last entry repeating to cover all stages
                if isinstance(block, int):
                    starts = list(range(0, T, block))
                    sizes = [block] * len(starts)
                else:
                    starts, sizes, s0_ = [], [], 0
                    bi = 0
                    while s0_ < T:
                        sz = block[min(bi, len(block) - 1)]
                        starts.append(s0_)
                        sizes.append(sz)
                        s0_ += sz
                        bi += 1
                for blk_i, (s0, sz) in enumerate(zip(starts, sizes)):
                    ts = range(s0, min(s0 + sz, T))
                    if mg_enc:
                        pred = jnp.max(carry[1]) >= 0.0
                    elif inf_enc:
                        # scalar compare in f32: Mosaic (v5e) cannot
                        # legalize scalar bf16 arith.cmpf
                        pred = jnp.max(carry[0]).astype(jnp.float32) \
                            > -jnp.inf
                    else:
                        pred = jnp.sum(carry[1]) > 0.0
                    carry = jax.lax.cond(pred,
                                         make_block(ts, b0, bh, blk_i),
                                         lambda c: c, carry)
                if mg_enc:
                    hs, mg = carry
                    ok = mg >= 0.0
                    out_ref[b0:b0 + bh, :] = jnp.where(ok, hs, -jnp.inf)
                    cnt_b = jnp.sum(ok.astype(jnp.float32)).astype(jnp.int32)
                elif inf_enc:
                    hs = carry[0]
                    out_ref[b0:b0 + bh, :] = hs.astype(jnp.float32)
                    alive_f = (hs > -jnp.inf).astype(jnp.float32)
                    cnt_b = jnp.sum(alive_f).astype(jnp.int32)
                else:
                    hs = carry[0].astype(jnp.float32)
                    # f32 for the count sum: a bf16 accumulator saturates at
                    # 256 (8 mantissa bits), and count feeds the extraction
                    # completeness check
                    alive = carry[1].astype(jnp.float32)
                    out_ref[b0:b0 + bh, :] = jnp.where(alive > 0.0, hs,
                                                       -jnp.inf)
                    cnt_b = jnp.sum(alive).astype(jnp.int32)
                count = cnt_b if count is None else count + cnt_b
                if with_nweak:
                    nw_b = jnp.sum(carry[2]).astype(jnp.int32)
                    nweak = nw_b if nweak is None else nweak + nw_b
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            if not with_nweak:
                nweak = jnp.zeros((), jnp.int32)
            stats_ref[...] = jnp.where(
                (rid == 0) & (cid == 0), nweak,
                jnp.where((rid == 0) & (cid == 1), count, 0))

        @pl.when(jnp.logical_not(any_valid))
        def _dead_tile():
            out_ref[...] = jnp.full((TU, TV), -jnp.inf, jnp.float32)
            stats_ref[...] = jnp.zeros((8, 128), jnp.int32)

    if masked_out:
        return kernel_masked

    def kernel(mask_ref, canvas_hbm, hs_ref, alive_ref, nweak_ref,
               tile_ref, dma_sem):
        if canvas_hbm.ndim == 4:
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            src = canvas_hbm.at[b, :, pl.ds(i * TU, TU + HU),
                                pl.ds(j * TV, TV + HV)]
        else:
            i = pl.program_id(0)
            j = pl.program_id(1)
            src = canvas_hbm.at[:, pl.ds(i * TU, TU + HU),
                                pl.ds(j * TV, TV + HV)]
        copy = pltpu.make_async_copy(src, tile_ref, dma_sem)
        copy.start()
        copy.wait()

        # alive carried as f32 {0,1}: Mosaic's i1 vector relayouts are
        # fragile in cond/while carries (see cascade_pallas.py)
        BH = TU // bands  # band height (window-origin rows)

        def make_block(ts, b0, bh):
            def block_fn(carry):
                hs, alive, nweak_acc = carry
                for t in ts:
                    # static recursive select tree over the actual node
                    # structure; each internal node is one static VMEM slice
                    # against an immediate constant
                    def resp_of(node):
                        if sc.left[t, node] < 0:
                            return float(sc.pred[t, node])
                        r = int(sc.fr[t, node]) + b0
                        c = int(sc.fc[t, node])
                        ch = int(sc.fch[t, node])
                        bin_ = (tile_ref[ch, r:r + bh, c:c + TV]
                                <= float(sc.thr[t, node]))
                        lo = resp_of(int(sc.left[t, node]))
                        hi = resp_of(int(sc.right[t, node]))
                        if isinstance(lo, float) and isinstance(hi, float) \
                                and lo == hi:
                            return lo
                        return jnp.where(bin_, lo, hi)
                    resp = resp_of(0)
                    nweak_acc = nweak_acc + alive
                    hs = hs + alive * resp
                    th = float(sc.theta[t])
                    if np.isfinite(th):
                        alive = alive * (hs >= th).astype(jnp.float32)
                return hs, alive, nweak_acc
            return block_fn

        for band in range(bands):
            b0 = band * BH
            bh = BH if band < bands - 1 else TU - b0
            carry = (jnp.zeros((bh, TV), jnp.float32),
                     mask_ref[b0:b0 + bh, :],
                     jnp.zeros((bh, TV), jnp.float32))
            for s0 in range(0, T, block):
                ts = range(s0, min(s0 + block, T))
                # every block is conditional (incl. the first): bands that
                # are entirely gap/padding skip the whole cascade
                carry = jax.lax.cond(jnp.sum(carry[1]) > 0.0,
                                     make_block(ts, b0, bh),
                                     lambda c: c, carry)
            hs_b, alive_b, nweak_b = carry
            if bands == 1:
                hs, alive, nweak_acc = hs_b, alive_b, nweak_b
            else:
                hs_ref[b0:b0 + bh, :] = hs_b
                alive_ref[b0:b0 + bh, :] = alive_b
                if band == 0:
                    nweak_acc = jnp.sum(nweak_b)
                else:
                    nweak_acc = nweak_acc + jnp.sum(nweak_b)

        if bands > 1:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            nweak = nweak_acc.astype(jnp.int32)
            nweak_ref[...] = jnp.where((rid == 0) & (cid == 0), nweak, 0)
            return

        hs_ref[...] = hs
        alive_ref[...] = alive  # f32 {0,1}; Mosaic lacks f32->u8 casts
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        nweak = jnp.sum(nweak_acc).astype(jnp.int32)
        nweak_ref[...] = jnp.where((rid == 0) & (cid == 0), nweak, 0)

    return kernel


def cascade_grid(content_hw: Tuple[int, int], window: Tuple[int, int],
                 tile: Tuple[int, int] = (128, 256)):
    """(TU, TV, gi, gj, HU, HV) tiling + minimum canvas allocation
    (gi*TU+HU, gj*TV+HV) of the static cascade kernel for a canvas with
    ``content_hw`` content and an (m, n) window."""
    U, V = content_hw
    m, n = window
    gu, gv = max(U - m, 0), max(V - n, 0)
    TU, TV = tile
    TU = min(TU, _round_up(max(gu, 8), 8))
    TV = min(TV, _round_up(max(gv, 128), 128))
    gi = max(-(-gu // TU), 1)
    gj = max(-(-gv // TV), 1)
    HU = _round_up(m, 8)
    HV = _round_up(n, 128)
    return TU, TV, gi, gj, HU, HV


@functools.partial(
    jax.jit,
    static_argnames=("sc", "window", "tile", "interpret", "n_stages_cap",
                     "content_hw", "block", "bands"),
)
def cascade_response_grid_static(
    canvas: jax.Array, sc: StaticCascade, valid_mask: jax.Array,
    window: Tuple[int, int], tile: Tuple[int, int] = (128, 256),
    interpret: bool = False, n_stages_cap=None,
    content_hw: Optional[Tuple[int, int]] = None, block: int = BLOCK,
    bands: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Evaluate a frozen cascade on every window origin of a channel canvas.

    ``canvas``: (C, U, V) single image or (B, C, U, V) batch.  Returns
    ``(hs, alive, n_weak)`` on the (U-m, V-n) window-origin grid (leading B
    for batched input; ``n_weak`` is per-image for batches).  Drop-in
    equivalent of ops.cascade.cascade_response_grid(init_alive=...) — same
    survivor set and scores (monotone SPRT rejection; tile exit is exact).

    With ``content_hw`` given, the canvas is treated as (U, V) content inside
    a larger allocation that already covers the kernel's halo fetch
    (cascade_grid) — no pad copy; the extra area must be dead in
    ``valid_mask`` (it is: window origins beyond content are invalid).
    """
    batched = canvas.ndim == 4
    if not batched:
        canvas = canvas[None]
    B, C = canvas.shape[0], canvas.shape[1]
    if content_hw is not None:
        U, V = content_hw
    else:
        U, V = canvas.shape[2], canvas.shape[3]
    m, n = window
    gu, gv = max(U - m, 0), max(V - n, 0)
    TU, TV, gi, gj, HU, HV = cascade_grid((U, V), window, tile)
    U_pad = gi * TU + HU
    V_pad = gj * TV + HV
    if content_hw is not None:
        assert canvas.shape[2] >= U_pad and canvas.shape[3] >= V_pad, \
            (canvas.shape, U_pad, V_pad)
        canvas_p = canvas.astype(jnp.float32)
    else:
        canvas_p = jnp.pad(canvas.astype(jnp.float32),
                           ((0, 0), (0, 0), (0, U_pad - U), (0, V_pad - V)))
    mask_p = jnp.pad(valid_mask.astype(jnp.float32),
                     ((0, gi * TU - gu), (0, gj * TV - gv)))

    kernel = _make_static_kernel(sc, TU, TV, HU, HV, C, m, n,
                                 n_stages_cap=n_stages_cap, block=block,
                                 bands=bands)

    grid = (B, gi, gj)
    mask_spec = pl.BlockSpec((TU, TV), lambda b, i, j: (i, j),
                             memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, TU, TV), lambda b, i, j: (b, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TU, TV), lambda b, i, j: (b, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j),
                     memory_space=pltpu.VMEM),
    ]

    def kernel3(mask_ref, canvas_hbm, hs_ref, alive_ref, nweak_ref,
                tile_ref, dma_sem):
        # outputs carry a leading length-1 batch block dim
        kernel(mask_ref, canvas_hbm, hs_ref.at[0], alive_ref.at[0],
               nweak_ref.at[0], tile_ref, dma_sem)

    hs, alive, nweak = pl.pallas_call(
        kernel3,
        grid=grid,
        in_specs=[
            mask_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # canvas (manual DMA)
        ],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, gi * TU, gj * TV), jnp.float32),
            jax.ShapeDtypeStruct((B, gi * TU, gj * TV), jnp.float32),
            jax.ShapeDtypeStruct((B, gi * 8, gj * 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, TU + HU, TV + HV), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mask_p, canvas_p)

    hs = hs[:, :gu, :gv]
    alive = alive[:, :gu, :gv] > 0
    nweak = jnp.sum(nweak.reshape(B, -1), axis=1)
    if not batched:
        return hs[0], alive[0], nweak[0]
    return hs, alive, nweak


@functools.partial(
    jax.jit,
    static_argnames=("sc", "window", "tile", "interpret", "n_stages_cap",
                     "content_hw", "block", "with_n_weak", "preshift",
                     "bands", "preshift_min_uses", "preshift_lazy",
                     "margin_enc", "and_tree", "fast", "fast_scores"),
)
def cascade_masked_grid_static(
    canvas: jax.Array, sc: StaticCascade, valid_mask: jax.Array,
    window: Tuple[int, int], tile: Tuple[int, int] = (128, 256),
    interpret: bool = False, n_stages_cap=None,
    content_hw: Optional[Tuple[int, int]] = None, block: int = BLOCK,
    with_n_weak: bool = True, preshift: bool = False, bands: int = 1,
    preshift_min_uses: int = 2, preshift_lazy: bool = False,
    margin_enc: bool = False, and_tree: bool = False, fast: bool = False,
    fast_scores: str = "bf16",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Serving-extraction form of :func:`cascade_response_grid_static`.

    Returns ``(masked, n_weak, count)`` where ``masked`` is the UNCROPPED
    (B, GI*TU, GJ*TV) f32 map holding the cascade response where the window
    survived and -inf elsewhere (grid padding is dead in ``valid_mask``, so
    it is -inf too), ``n_weak``/``count`` are per-image totals.  The aligned
    uncropped map feeds lax.approx_max_k directly: no alive-map write, no
    post-hoc jnp.where, and no unaligned-crop relayout — those three passes
    cost more than the extraction itself at VGA canvas size.  The survivor
    SET (finite entries) and scores are exactly those of
    cascade_response_grid_static; only dead-window encoding differs.

    ``with_n_weak=False`` drops the per-stage evaluation counter from the
    kernel (one fewer vector accumulate per stage and a smaller early-exit
    carry); ``n_weak`` is then all zeros.  The reference's ``detect`` returns
    boxes/scores only (/root/reference/waldboost/model.py:129-151) — the
    counter is an eval_cost diagnostic, not a serving output.

    ``fast=True`` (WB_SERVING_MODE=fast): bf16 tiles + bf16 stage chain —
    NOT bit-exact (see _make_static_kernel); requires the no-counter
    encodings, so it is ignored when ``with_n_weak`` or ``margin_enc``.
    """
    fast = bool(fast) and not with_n_weak and not margin_enc
    T_eff = sc.n_stages if n_stages_cap is None \
        else min(sc.n_stages, n_stages_cap)
    if and_tree and T_eff > 128:
        # deep cascades: the AND-tree encoding's per-block compare lists
        # push Mosaic's scoped-VMEM stack over 16 MB (measured 30.07M at
        # 256 trained stages, VGA; scripts/exp_r12_deep.py compile
        # matrix — the single-carry -inf latch compiles and runs fine
        # and is bitwise-identical in outputs), so fall back silently
        and_tree = False
    batched = canvas.ndim == 4
    if not batched:
        canvas = canvas[None]
    B, C = canvas.shape[0], canvas.shape[1]
    if content_hw is not None:
        U, V = content_hw
    else:
        U, V = canvas.shape[2], canvas.shape[3]
    m, n = window
    gu, gv = max(U - m, 0), max(V - n, 0)
    TU, TV, gi, gj, HU, HV = cascade_grid((U, V), window, tile)
    U_pad = gi * TU + HU
    V_pad = gj * TV + HV
    tdt = jnp.bfloat16 if fast else jnp.float32
    if content_hw is not None:
        assert canvas.shape[2] >= U_pad and canvas.shape[3] >= V_pad, \
            (canvas.shape, U_pad, V_pad)
        canvas_p = canvas.astype(tdt)
    else:
        canvas_p = jnp.pad(canvas.astype(tdt),
                           ((0, 0), (0, 0), (0, U_pad - U), (0, V_pad - V)))
    mask_p = jnp.pad(valid_mask.astype(jnp.float32),
                     ((0, gi * TU - gu), (0, gj * TV - gv)))

    kernel = _make_static_kernel(sc, TU, TV, HU, HV, C, m, n,
                                 n_stages_cap=n_stages_cap, block=block,
                                 masked_out=True, with_nweak=with_n_weak,
                                 bands=bands,
                                 preshift_min_uses=preshift_min_uses,
                                 preshift_lazy=preshift_lazy,
                                 margin_enc=margin_enc, and_tree=and_tree,
                                 fast=fast, fast_scores=fast_scores)

    grid = (B, gi, gj)
    mask_spec = pl.BlockSpec((TU, TV), lambda b, i, j: (i, j),
                             memory_space=pltpu.VMEM)

    isz = 2 if fast else 4
    scratch = [
        pltpu.VMEM((2, C, TU + HU, TV + HV), tdt),  # double-buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if preshift:
        from collections import Counter
        T = sc.n_stages if n_stages_cap is None \
            else min(sc.n_stages, n_stages_cap)
        uses = Counter((int(sc.fch[t, nd]), int(sc.fc[t, nd]))
                       for t in range(T)
                       for nd in range(sc.fr.shape[1])
                       if sc.left[t, nd] >= 0)
        n_pairs = sum(1 for cnt in uses.values()
                      if cnt >= preshift_min_uses)
        # scoped VMEM is 16 MB (measured: 17.5 MB allocation rejected);
        # auto-disable the pre-shift scratch when it can't fit alongside
        # the double-buffered tiles, output/mask blocks, and live carries
        # (~4 MB at the default tile; scale the slack with the tile area —
        # a (256,512) tile OOM'd at the flat 11 MB bound)
        pre_bytes = max(n_pairs, 1) * (TU + HU) * TV * 4  # slabs stay f32
        tile_bytes = 2 * C * (TU + HU) * (TV + HV) * isz
        live_bytes = 6 * TU * TV * 4  # out + mask + hs/alive carries
        if pre_bytes + tile_bytes + live_bytes > 14 * 2 ** 20:
            preshift = False
    if preshift:
        scratch.append(pltpu.VMEM((max(n_pairs, 1), TU + HU, TV),
                                  jnp.float32))

        def kernel3(mask_ref, canvas_hbm, out_ref, stats_ref, tile_ref,
                    dma_sem, pre_ref):
            kernel(mask_ref, canvas_hbm, out_ref.at[0], stats_ref.at[0],
                   tile_ref, dma_sem, pre_ref=pre_ref)
    else:
        def kernel3(mask_ref, canvas_hbm, out_ref, stats_ref, tile_ref,
                    dma_sem):
            kernel(mask_ref, canvas_hbm, out_ref.at[0], stats_ref.at[0],
                   tile_ref, dma_sem)

    masked, stats = pl.pallas_call(
        kernel3,
        grid=grid,
        in_specs=[
            mask_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # canvas (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((1, TU, TV), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, gi * TU, gj * TV), jnp.float32),
            jax.ShapeDtypeStruct((B, gi * 8, gj * 128), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(mask_p, canvas_p)

    st = stats.reshape(B, gi, 8, gj, 128)
    nweak = jnp.sum(st[:, :, 0, :, 0], axis=(1, 2))
    count = jnp.sum(st[:, :, 0, :, 1], axis=(1, 2))
    if not batched:
        return masked[0], nweak[0], count[0]
    return masked, nweak, count
