"""Fused polyphase pass-2 + lerp + shelf assembly as Pallas TPU kernels.

The serving plane build is a long XLA tail: per-level pass-2 selector
einsums materialize 4-corner G tensors in HBM (~4x the plane canvas in
bf16, written AND re-read), the f32 lerp combine re-reads them, and the
shelf assembly (pad / concatenate / dynamic-update-slice passes) copies the
canvas several more times.  Measured on VGA batch serving this tail is
~95-100 us/image of almost pure HBM traffic.

This kernel collapses pass-2 for a whole SHELF (one horizontal band of the
packed plane canvas) into one fused pass per image:

  cols (pass-1 product, HBM)  --piece-window DMA-->  VMEM (double
  buffered) --MXU dots per (piece, colblock)--> f32 corner blocks
  --VPU lerp+floor--> bf16 --static-offset stores--> shelf band scratch
  --one DMA--> the shelf's rows of the plane canvas.

HBM traffic becomes: one read of cols + one write of the canvas — the G
corners never exist in HBM and the assembly passes disappear entirely
(gap columns come from the band scratch zero-fill; all-zero selector
rowblocks — inter-level gap rows — are simply skipped from the piece
list).

``cols`` are the RAW per-block pass-1 einsum outputs — each 128-col
selector block's (B, oh, 4*128) bf16 product, lanes (x, q, c)-flattened
so the einsum's row-major lane order IS the kernel's corner-slab order —
passed straight into the kernel with NO assembly pass between the einsum
and the DMAs (an XLA interleave-concat into per-octave (B, oh, 4C)
arrays cost ~28 us/img of dynamic-update-slice traffic).  The corner
dims MUST live in the lane axis: slicing a size-2 dim to 1 on a bf16 HBM
memref breaks its (2,1) packed tiling (Mosaic rejects it), whereas
corner i of a block is the 128-aligned lane window [i*128, +128).

Slab staging is PER PIECE, not per level: a piece (one 64-target-row
block of one level) reads only its own source-row window [k0, k0+kwp)
— kwp stays small (<= ~250 rows at any image size, it scales with the
per-octave resize ratio, never with the image) — so the staging scratch
is a 2-slot ring of (nblk, kwp, 512) windows, double buffered across the
piece sequence (piece t+1's fetch rides under piece t's dots).  VMEM use
is therefore RESOLUTION-INDEPENDENT: 1080p's 540-row octaves fuse in the
same few MB as VGA's, where whole-level slabs needed 19 MB and fell back
to the XLA path.  One DMA per (piece, 128-col block) moves all 4 corner
slabs at once (they are adjacent lane windows of the same block rows).
Piece row windows are 8-aligned (banded k0 rounds down to 8, widths are
8-mult) and the row dim is padded to a multiple of 8 (zero rows; exact
zeros for any tap window that overruns the true row count).

Bit-exactness: the corner dots consume the same bf16 corner values as the
XLA mats path with f32 accumulation (one-hot selectors: the dot is an
exact gather), and the lerp/floor runs the same f32 expression as the XLA
combine step (polyphase._combine_block / ops.exact.combine4_exact), so
the canvas is bitwise identical to the XLA path at
the pinned test sizes (tests/test_polyphase.py).  At FHD scale a ~1e-6
fraction of values (19 of 19.7M measured) flip by exactly one uint8
quantum: lerp results landing within one float-rounding of an integer
boundary resolve differently under the two op graphs' fusion choices —
the same floor-tie deviation class PARITY.md documents for the resize
itself (the f64 reference is the arbiter there, and BOTH device paths
deviate from it only at such ties).

Reference anchor: /root/reference/waldboost/channels.py:111-132 (per-level
bilinear resize feeding the channel pyramid); the packed-canvas polyphase
formulation is this framework's own design (see model._poly_planes).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["shelf_pass2_call", "shelf_vmem_bytes", "ShelfPlan", "LevelPlan",
           "multi_shelf_pass2_call", "multi_shelf_vmem_bytes"]


class LevelPlan:
    """Static per-level kernel plan (hashable, host-side)."""

    def __init__(self, blks, oh, cwpad, wq, xc, fh0, fw0, pieces,
                 den_h=None, den_w=None, row_weighted=False):
        # cols ref index (local to this shelf's call) of each 128-col
        # block of the level's slab, in slab lane order
        self.blks = tuple(int(b) for b in blks)
        self.oh = int(oh)             # cols rows (source rows, 8-padded)
        self.cwpad = int(cwpad)       # 128-mult slab width (>= wq)
        self.wq = int(wq)             # true level width (store width)
        self.xc = int(xc)             # canvas col of the level's first col
        self.fh0 = int(fh0)           # row offset into the FH array
        self.fw0 = int(fw0)           # row-block offset into the FW array
        # exact-resize denominators: FH/FW arrays hold integer frac
        # NUMERATORS over these (ops.exact.axis_taps_exact)
        self.den_h = int(den_h) if den_h is not None else 0
        self.den_w = int(den_w) if den_w is not None else 0
        # row weights folded into the (halved) lhs matmul (den_h <= 256:
        # bf16-exact integer weights, exact f32-accumulated products)
        self.row_weighted = bool(row_weighted)
        # pieces: tuple of (row_off, rb, r0, k0, kwp) — lhs stack row
        # offset, rowblock height, band row start, source-row window
        self.pieces = tuple(tuple(int(x) for x in p) for p in pieces)

    def key(self):
        return (self.blks, self.oh, self.cwpad, self.wq, self.xc,
                self.fh0, self.fw0, self.den_h, self.den_w,
                self.row_weighted, self.pieces)


class ShelfPlan:
    """Static per-shelf kernel plan (hashable, host-side)."""

    def __init__(self, ys, pitch, ohS, cwmax, levels: Sequence[LevelPlan]):
        self.ys = int(ys)             # canvas row of the band start (8-mult)
        self.pitch = int(pitch)       # band height (8-mult)
        self.ohS = int(ohS)           # max level source rows (8-mult)
        self.cwmax = int(cwmax)       # max level slab lanes (128-mult)
        self.levels = tuple(levels)

    @property
    def kwpS(self) -> int:
        """Staging rows: the widest piece source-row window."""
        return max((p[4] for lv in self.levels for p in lv.pieces),
                   default=8)

    @property
    def nblkS(self) -> int:
        """Staging blocks: the widest level's 128-col block count."""
        return max((len(lv.blks) for lv in self.levels), default=1)

    def key(self):
        return (self.ys, self.pitch, self.ohS, self.cwmax,
                tuple(lv.key() for lv in self.levels))

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, ShelfPlan) and self.key() == other.key()


#: row-stripe height of the band ring (== model._poly_fused_impl's RB
#: row-block: pieces never cross stripe boundaries by construction)
STRIPE = 64


def shelf_vmem_bytes(plan: ShelfPlan, PW: int,
                     lhs_size: int, fh_size: int, fw_size: int) -> int:
    """Kernel VMEM footprint: 2-slot piece staging ring + 2-slot row-stripe
    band ring + the resident lhs/weight arrays.  Neither term scales with
    the shelf pitch or the image height, so the fused path fits the VMEM
    budget at any resolution (only PW — the canvas width — enters)."""
    sh = min(STRIPE, plan.pitch)
    return (2 * plan.nblkS * plan.kwpS * 512 * 2
            + 2 * 4 * sh * PW * 2
            + lhs_size * 2 + fh_size * 4 + fw_size * 4)


def _piece_compute(lhs_ref, fh_ref, fw_ref, rhs_ref, band_ref, sl, bsl,
                   lv: LevelPlan, piece, pitch: int):
    """One piece's corner dots + exact 4-corner combine + bf16 stores into
    the band scratch (shared by the per-shelf and merged kernels;
    bit-exactness vs the XLA mats path pinned by tests/test_polyphase.py).
    FH/FW hold integer frac numerators over the level's static
    denominators; ops.exact.combine4_exact floors with no float ties."""
    from .exact import combine4_exact, floor_colstage

    row_off, rb, r0, k0, kwp = piece
    nrow = (2 if lv.row_weighted else 4) * rb
    lhs = lhs_ref[row_off:row_off + nrow, 0:kwp]
    ncb = -(-lv.wq // 128)
    for ci in range(ncb):
        cs = ci * 128
        w = min(128, lv.wq - cs)
        fwq = [fw_ref[(lv.fw0 + q) * 8:(lv.fw0 + q) * 8 + 1,
                      cs:cs + 128] for q in (0, 1)]
        outs = [
            jax.lax.dot_general(
                lhs,
                rhs_ref[sl, ci, 0:kwp, i * 128:(i + 1) * 128],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for i in range(4)
        ]
        for p in (0, 1):
            for q in (0, 1):
                if lv.row_weighted:
                    # rows are p-grouped exact row NUMERATORS (weights rode
                    # the bf16 lhs): only the column floor-combine remains
                    a = outs[0 * 2 + q][p * rb:(p + 1) * rb, :]
                    b = outs[1 * 2 + q][p * rb:(p + 1) * rb, :]
                    blk = floor_colstage(a, b, fwq[q], lv.den_h, lv.den_w)
                else:
                    fh = fh_ref[lv.fh0 + p * pitch + r0:
                                lv.fh0 + p * pitch + r0 + rb, 0:1]

                    # outs[x*2+q] rows are (a*2+p)-grouped: slice the
                    # (h-corner a, w-corner x) blocks
                    def gco(a, x, q=q, p=p):
                        o = outs[x * 2 + q]
                        return o[(a * 2 + p) * rb:(a * 2 + p + 1) * rb, :]
                    g00, g10 = gco(0, 0), gco(1, 0)
                    g01, g11 = gco(0, 1), gco(1, 1)
                    blk = combine4_exact(g00, g01, g10, g11, fh, fwq[q],
                                         lv.den_h, lv.den_w)
                blk = blk.astype(jnp.bfloat16)
                # stripe-local rows at the piece's static in-stripe offset
                # (stacked levels start mid-stripe on 8-aligned rows; pieces
                # never cross stripe boundaries by construction)
                off = r0 % min(STRIPE, pitch)
                band_ref[bsl, p, q, off:off + rb,
                         lv.xc + cs:lv.xc + cs + w] = \
                    blk[:, :w] if w < 128 else blk


def _make_shelf_kernel(plan: ShelfPlan, n_cols: int, has_carry: bool):
    pitch = plan.pitch
    SH = min(STRIPE, pitch)
    stripes = list(range(0, pitch, SH))
    # flat static piece sequence in STRIPE-major order (all levels' pieces
    # for band rows [sr0, sr0+SH) run together, then the stripe is
    # out-copied while the next stripe computes); the staging ring
    # alternates slots along the flat order
    work = []
    for s_idx, sr0 in enumerate(stripes):
        for li, lv in enumerate(plan.levels):
            for piece in lv.pieces:
                if sr0 <= piece[2] < sr0 + SH:
                    assert piece[2] + piece[1] <= sr0 + min(SH, pitch - sr0), \
                        (piece, sr0, pitch)
                    work.append((s_idx, li, lv, piece))
    assert len(work) == sum(len(lv.pieces) for lv in plan.levels), \
        "piece row-block grid must match the stripe grid"

    def kernel(*refs):
        lhs_ref, fh_ref, fw_ref = refs[0:3]
        cols_refs = refs[3:3 + n_cols]
        if has_carry:
            out_ref = refs[3 + n_cols + 1]
        else:
            out_ref = refs[3 + n_cols]
        rhs_ref, band_ref, sem, osem = refs[-4:]

        b = pl.program_id(0)

        def piece_dmas(t):
            # one copy per 128-col block: block rows [k0, k0+kwp) carry
            # ALL 4 corner slabs as adjacent 128-lane windows
            sl = t % 2
            _si, _li, lv, (_ro, _rb, _r0, k0, kwp) = work[t]
            return [
                pltpu.make_async_copy(
                    cols_refs[ref_i].at[b, pl.ds(k0, kwp), :],
                    rhs_ref.at[sl, j, 0:kwp, :],
                    sem.at[sl, j])
                for j, ref_i in enumerate(lv.blks)
            ]

        def stripe_copy(s_idx):
            sr0 = stripes[s_idx]
            sh = min(SH, pitch - sr0)
            return pltpu.make_async_copy(
                band_ref.at[s_idx % 2, :, :, 0:sh, :],
                out_ref.at[b, :, :, pl.ds(plan.ys + sr0, sh), :],
                osem.at[s_idx % 2])

        if work:
            for cp in piece_dmas(0):
                cp.start()

        t = 0
        for s_idx, sr0 in enumerate(stripes):
            bsl = s_idx % 2
            if s_idx >= 2:
                # this slot's copy from two stripes ago must land before
                # the zero-fill below overwrites the scratch
                stripe_copy(s_idx - 2).wait()
            # gap rows/columns come from the zero fill; level strips
            # overwrite
            band_ref[bsl] = jnp.zeros(band_ref.shape[1:], band_ref.dtype)

            while t < len(work) and work[t][0] == s_idx:
                sl = t % 2
                _si, li, lv, piece = work[t]
                if t + 1 < len(work):
                    # prefetch the next piece's windows into the other
                    # slot; the transfer rides under this piece's dots
                    for cp in piece_dmas(t + 1):
                        cp.start()
                for cp in piece_dmas(t):
                    cp.wait()
                _piece_compute(lhs_ref, fh_ref, fw_ref, rhs_ref, band_ref,
                               sl, bsl, lv, piece, pitch)
                t += 1
            # the stripe write rides under the next stripe's compute
            stripe_copy(s_idx).start()

        stripe_copy(len(stripes) - 1).wait()
        if len(stripes) >= 2:
            stripe_copy(len(stripes) - 2).wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("plan", "PH", "PW", "interpret"))
def shelf_pass2_call(lhs: jax.Array, fh: jax.Array, fw: jax.Array,
                     cols: Tuple[jax.Array, ...], carry,
                     plan: ShelfPlan, PH: int, PW: int,
                     interpret: bool = False) -> jax.Array:
    """Run one shelf's fused pass-2 over the batch.

    ``cols``: this shelf's per-block pass-1 products, each (B, oh8,
    4*128) bf16 — the (x, q) corner dims flattened into the lane axis —
    with rows padded to a multiple of 8 (zeros); levels reference them
    by local index via ``LevelPlan.blks``.
    ``carry``: the canvas written so far (aliased through; None for the
    first shelf — its other rows stay uninitialized until later shelves
    write them, and every row is covered once all shelves have run).
    Returns the canvas (B, 2, 2, PH, PW) bf16.
    """
    B = cols[0].shape[0]
    n_cols = len(cols)
    kernel = _make_shelf_kernel(plan, n_cols, carry is not None)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # lhs
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fh
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fw
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_cols
    args = [lhs, fh, fw, *cols]
    io_aliases = {}
    if carry is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(carry)
        io_aliases = {3 + n_cols: 0}

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, 2, 2, PH, PW), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, plan.nblkS, plan.kwpS, 512), jnp.bfloat16),
            pltpu.VMEM((2, 2, 2, min(STRIPE, plan.pitch), PW),
                       jnp.bfloat16),  # 2-slot row-stripe band ring
            pltpu.SemaphoreType.DMA((2, plan.nblkS)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)


def multi_shelf_vmem_bytes(plans: Sequence[ShelfPlan], PW: int,
                           arr_bytes: int) -> int:
    """Merged-kernel VMEM footprint: ALL shelves' lhs/fh/fw stay resident
    (``arr_bytes``), the staging/band rings are sized at the per-shelf
    maxima.  The per-shelf rings don't sum — the merged kernel reuses one
    ring across the whole flat work list."""
    kwpS = max(p.kwpS for p in plans)
    nblkS = max(p.nblkS for p in plans)
    SHmax = max(min(STRIPE, p.pitch) for p in plans)
    return (2 * nblkS * kwpS * 512 * 2
            + 2 * 4 * SHmax * PW * 2
            + arr_bytes)


def _make_multi_shelf_kernel(plans: Tuple[ShelfPlan, ...], n_cols: int):
    """All shelves in ONE kernel: a flat (shelf, stripe, piece) work list
    sharing one staging ring and one band ring.  Kills the per-shelf call
    overhead (8 pipeline drains per image at the VGA pyramid: the first
    piece DMA and the last stripe write of every call ran unoverlapped)
    and lets shelf k+1's first fetch ride under shelf k's tail compute.
    LevelPlan.blks index the GLOBAL cols tuple here."""
    stripe_list = []  # (shelf idx, sr0, sh)
    work = []         # (global stripe idx, lv, piece)
    for si, plan in enumerate(plans):
        SH = min(STRIPE, plan.pitch)
        for sr0 in range(0, plan.pitch, SH):
            gs = len(stripe_list)
            stripe_list.append((si, sr0, min(SH, plan.pitch - sr0)))
            for lv in plan.levels:
                for piece in lv.pieces:
                    if sr0 <= piece[2] < sr0 + SH:
                        assert piece[2] + piece[1] <= \
                            sr0 + min(SH, plan.pitch - sr0), \
                            (piece, sr0, plan.pitch)
                        work.append((gs, si, lv, piece))
    assert len(work) == sum(len(lv.pieces) for p in plans
                            for lv in p.levels), \
        "piece row-block grid must match the stripe grid"

    def kernel(*refs):
        shelf_refs = refs[:3 * len(plans)]  # lhs/fh/fw per shelf
        cols_refs = refs[3 * len(plans):3 * len(plans) + n_cols]
        out_ref = refs[3 * len(plans) + n_cols]
        rhs_ref, band_ref, sem, osem = refs[-4:]

        b = pl.program_id(0)

        def piece_dmas(t):
            sl = t % 2
            _gs, _si, lv, (_ro, _rb, _r0, k0, kwp) = work[t]
            return [
                pltpu.make_async_copy(
                    cols_refs[ref_i].at[b, pl.ds(k0, kwp), :],
                    rhs_ref.at[sl, j, 0:kwp, :],
                    sem.at[sl, j])
                for j, ref_i in enumerate(lv.blks)
            ]

        def stripe_copy(gs):
            si, sr0, sh = stripe_list[gs]
            return pltpu.make_async_copy(
                band_ref.at[gs % 2, :, :, 0:sh, :],
                out_ref.at[b, :, :, pl.ds(plans[si].ys + sr0, sh), :],
                osem.at[gs % 2])

        if work:
            for cp in piece_dmas(0):
                cp.start()

        t = 0
        for gs, (si, _sr0, _sh) in enumerate(stripe_list):
            bsl = gs % 2
            if gs >= 2:
                # this slot's copy from two stripes ago must land before
                # the zero-fill below overwrites the scratch
                stripe_copy(gs - 2).wait()
            band_ref[bsl] = jnp.zeros(band_ref.shape[1:], band_ref.dtype)

            while t < len(work) and work[t][0] == gs:
                sl = t % 2
                _gs, tsi, lv, piece = work[t]
                if t + 1 < len(work):
                    for cp in piece_dmas(t + 1):
                        cp.start()
                for cp in piece_dmas(t):
                    cp.wait()
                _piece_compute(shelf_refs[3 * tsi], shelf_refs[3 * tsi + 1],
                               shelf_refs[3 * tsi + 2], rhs_ref, band_ref,
                               sl, bsl, lv, piece, plans[tsi].pitch)
                t += 1
            # the stripe write rides under the next stripe's compute
            stripe_copy(gs).start()

        stripe_copy(len(stripe_list) - 1).wait()
        if len(stripe_list) >= 2:
            stripe_copy(len(stripe_list) - 2).wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("plans", "PH", "PW", "interpret"))
def multi_shelf_pass2_call(shelf_arrays: Tuple[jax.Array, ...],
                           cols: Tuple[jax.Array, ...],
                           plans: Tuple[ShelfPlan, ...], PH: int, PW: int,
                           interpret: bool = False) -> jax.Array:
    """Run EVERY shelf's fused pass-2 in one kernel launch.

    ``shelf_arrays``: (lhs, fh, fw) per shelf, flattened shelf-major.
    ``cols``: the union of all shelves' pass-1 block products;
    ``LevelPlan.blks`` index this tuple directly.  Shelf bands tile
    [0, PH) disjointly, so no carry aliasing is needed — one call writes
    the whole canvas.  Bitwise-identical to chaining
    :func:`shelf_pass2_call` per shelf (same pieces, same dots, same lerp;
    only the launch structure differs)."""
    assert len(shelf_arrays) == 3 * len(plans)
    B = cols[0].shape[0]
    n_cols = len(cols)
    kernel = _make_multi_shelf_kernel(plans, n_cols)
    kwpS = max(p.kwpS for p in plans)
    nblkS = max(p.nblkS for p in plans)
    SHmax = max(min(STRIPE, p.pitch) for p in plans)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shelf_arrays)
                + [pl.BlockSpec(memory_space=pl.ANY)] * n_cols)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, 2, 2, PH, PW), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, nblkS, kwpS, 512), jnp.bfloat16),
            pltpu.VMEM((2, 2, 2, SHmax, PW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, nblkS)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*shelf_arrays, *cols)
