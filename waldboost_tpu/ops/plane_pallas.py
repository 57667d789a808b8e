"""Fused polyphase pass-2 + lerp + shelf assembly as Pallas TPU kernels.

The serving plane build is a long XLA tail: per-level pass-2 selector
einsums materialize 4-corner G tensors in HBM (~4x the plane canvas in
bf16, written AND re-read), the f32 lerp combine re-reads them, and the
shelf assembly (pad / concatenate / dynamic-update-slice passes) copies the
canvas several more times.  Measured on VGA batch serving this tail is
~95-100 us/image of almost pure HBM traffic.

This kernel collapses pass-2 for a whole SHELF (one horizontal band of the
packed plane canvas) into one fused pass per image:

  cols (pass-1 product, HBM)  --DMA-->  VMEM slabs (per level, 4 corner
  x phase combos) --MXU dots per (rowblock, colblock)--> f32 corner blocks
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
and the slab DMAs (an XLA interleave-concat into per-octave (B, oh, 4C)
arrays cost ~28 us/img of dynamic-update-slice traffic).  The corner
dims MUST live in the lane axis: slicing a size-2 dim to 1 on a bf16 HBM
memref breaks its (2,1) packed tiling (Mosaic rejects it), whereas
corner i of a block is the 128-aligned lane window [i*128, +128).  A
level's slab spans whole blocks (every level's selector columns are
128-padded), so slab i of level L is one DMA per block in ``blks``.
The row dim is padded to a multiple of 8 (zero rows; keeps every slab
DMA 8-aligned and feeds exact zeros to any tap window that overruns the
true row count).

Bit-exactness: the corner dots consume bf16-exact integer values (uint8
image content) with f32 accumulation, and the lerp/floor runs the same f32
expression as model._lerp_block, so the canvas is bitwise identical to the
XLA path (tests/test_polyphase.py pins this).

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

__all__ = ["shelf_pass2_call", "ShelfPlan", "LevelPlan"]


class LevelPlan:
    """Static per-level kernel plan (hashable, host-side)."""

    def __init__(self, blks, oh, cwpad, wq, xc, fh0, fw0, pieces):
        # cols ref index (local to this shelf's call) of each 128-col
        # block of the level's slab, in slab lane order
        self.blks = tuple(int(b) for b in blks)
        self.oh = int(oh)             # cols rows (source rows, 8-padded)
        self.cwpad = int(cwpad)       # 128-mult slab width (>= wq)
        self.wq = int(wq)             # true level width (store width)
        self.xc = int(xc)             # canvas col of the level's first col
        self.fh0 = int(fh0)           # row offset into the FH array
        self.fw0 = int(fw0)           # row-block offset into the FW array
        # pieces: tuple of (row_off, rb, r0, k0, kwp) — lhs stack row
        # offset, rowblock height, band row start, source-row window
        self.pieces = tuple(tuple(int(x) for x in p) for p in pieces)

    def key(self):
        return (self.blks, self.oh, self.cwpad, self.wq, self.xc,
                self.fh0, self.fw0, self.pieces)


class ShelfPlan:
    """Static per-shelf kernel plan (hashable, host-side)."""

    def __init__(self, ys, pitch, ohS, cwmax, levels: Sequence[LevelPlan]):
        self.ys = int(ys)             # canvas row of the band start (8-mult)
        self.pitch = int(pitch)       # band height (8-mult)
        self.ohS = int(ohS)           # rhs scratch rows (>= max k0+kwp)
        self.cwmax = int(cwmax)       # rhs scratch lanes (128-mult)
        self.levels = tuple(levels)

    def key(self):
        return (self.ys, self.pitch, self.ohS, self.cwmax,
                tuple(lv.key() for lv in self.levels))

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, ShelfPlan) and self.key() == other.key()


def _make_shelf_kernel(plan: ShelfPlan, n_cols: int, has_carry: bool):
    pitch = plan.pitch

    def kernel(*refs):
        lhs_ref, fh_ref, fw_ref = refs[0:3]
        cols_refs = refs[3:3 + n_cols]
        if has_carry:
            out_ref = refs[3 + n_cols + 1]
        else:
            out_ref = refs[3 + n_cols]
        rhs_ref, band_ref, sem, osem = refs[-4:]

        b = pl.program_id(0)

        def slab_dmas(li, lv, i):
            # one copy per 128-col block of the slab; all ride one
            # (li, i) semaphore and are waited once each
            return [
                pltpu.make_async_copy(
                    cols_refs[ref_i].at[b, :, pl.ds(i * 128, 128)],
                    rhs_ref.at[li, i, 0:lv.oh,
                               pl.ds(j * 128, 128)],
                    sem.at[li, i])
                for j, ref_i in enumerate(lv.blks)
            ]

        # start every level's slab fetches up front; the first dots then
        # overlap the later levels' transfers
        for li, lv in enumerate(plan.levels):
            for i in range(4):
                for cp in slab_dmas(li, lv, i):
                    cp.start()

        # gap rows/columns come from the zero fill; level strips overwrite
        band_ref[...] = jnp.zeros_like(band_ref)

        for li, lv in enumerate(plan.levels):
            for i in range(4):
                for cp in slab_dmas(li, lv, i):
                    cp.wait()
            ncb = -(-lv.wq // 128)
            for ci in range(ncb):
                cs = ci * 128
                w = min(128, lv.wq - cs)
                fwq = [fw_ref[(lv.fw0 + q) * 8:(lv.fw0 + q) * 8 + 1,
                              cs:cs + 128] for q in (0, 1)]
                for row_off, rb, r0, k0, kwp in lv.pieces:
                    lhs = lhs_ref[row_off:row_off + 4 * rb, 0:kwp]
                    outs = [
                        jax.lax.dot_general(
                            lhs,
                            rhs_ref[li, i, k0:k0 + kwp, cs:cs + 128],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for i in range(4)
                    ]
                    for p in (0, 1):
                        fh = fh_ref[lv.fh0 + p * pitch + r0:
                                    lv.fh0 + p * pitch + r0 + rb, 0:1]
                        for q in (0, 1):
                            # outs[x*2+q] rows are (a*2+p)-grouped: slice
                            # the (h-corner a, w-corner x) blocks and run
                            # model._lerp_block's exact f32 association
                            def gco(a, x, q=q, p=p):
                                o = outs[x * 2 + q]
                                return o[(a * 2 + p) * rb:
                                         (a * 2 + p + 1) * rb, :]
                            g00, g10 = gco(0, 0), gco(1, 0)
                            g01, g11 = gco(0, 1), gco(1, 1)
                            ta = g00 * (1.0 - fh) + g10 * fh
                            tb = g01 * (1.0 - fh) + g11 * fh
                            blk = ta * (1.0 - fwq[q]) + tb * fwq[q]
                            blk = jnp.floor(blk + 1e-4).astype(jnp.bfloat16)
                            band_ref[p, q, r0:r0 + rb,
                                     lv.xc + cs:lv.xc + cs + w] = \
                                blk[:, :w] if w < 128 else blk

        ocopy = pltpu.make_async_copy(
            band_ref, out_ref.at[b, :, :, pl.ds(plan.ys, pitch), :], osem)
        ocopy.start()
        ocopy.wait()

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

    nlev = len(plan.levels)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # lhs
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fh
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fw
    ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_cols
    args = [lhs, fh, fw, *cols]
    io_aliases = {}
    if carry is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(carry)
        io_aliases = {3 + n_cols: 0}

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, 2, 2, PH, PW), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nlev, 4, plan.ohS, plan.cwmax), jnp.bfloat16),
            pltpu.VMEM((2, 2, plan.pitch, PW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nlev, 4)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*args)
