"""Fused Pallas TPU kernel: polyphase grad_hist channels + pool + smooth.

One pass over the 2x2-polyphase image canvas produces the pooled (and
optionally smoothed + interior-masked) channel canvas: gradients, oriented
projections, the 2x2 average pool (elementwise in polyphase form), and the
3x3 binomial smooth all happen in VMEM.  The XLA version of this chain
(channels._grad_hist_poly_fn + image.smooth_3x3) materializes every
intermediate plane in HBM (~0.5 ms/VGA image); this kernel reads the canvas
once and writes the channels once (~10x less HBM traffic).

Bit-exactness: every expression replicates the XLA path's term order
(integer-valued gradients are exact in f32 anyway; the projection multiply,
pool association ((v00+v10)+(v01+v11))*0.25, and smooth association match
term for term), so outputs are identical to channels._grad_hist_poly_fn —
pinned by tests/test_polyphase.py.

Reference semantics: /root/reference/waldboost/channels.py:16-52 (gradients,
grad_hist), :55-64 (avg pool), :78-90 (3x3/16 smooth, zero borders).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grad_hist_poly_pallas", "fpga_poly_pallas", "TILE", "PAD_R",
           "PAD_C", "plane_pad_geometry"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: default channel-space tile and the fetch halo padding the kernel needs
#: ((128, 512) measured 12% faster than (128, 256) at VGA canvas — fewer
#: halo refetches; (256, 512) exceeds the 16 MB scoped-VMEM limit)
TILE = (128, 512)
PAD_R = 8
PAD_C = 128


def channel_grid(Hc: int, Wc: int, tile: Tuple[int, int] = TILE,
                 out_grid: Optional[Tuple[int, int]] = None):
    """(TU, TV, gi, gj) tiling of the channel kernel for content (Hc, Wc);
    ``out_grid`` enlarges the grid (extra tiles emit dead padding — used to
    size the output for the cascade kernel's halo fetch, removing the
    inter-kernel pad copy)."""
    TU, TV = tile
    TU = min(TU, _round_up(max(Hc, 8), 8))
    TV = min(TV, _round_up(max(Wc, 128), 128))
    gi = max(-(-Hc // TU), 1)
    gj = max(-(-Wc // TV), 1)
    if out_grid is not None:
        gi = max(gi, out_grid[0])
        gj = max(gj, out_grid[1])
    return TU, TV, gi, gj


def plane_pad_geometry(Hc: int, Wc: int, tile: Tuple[int, int] = TILE):
    """(pr, pc, PH, PW): content offset + padded plane dims such that every
    CONTENT tile's halo DMA is in bounds with aligned offsets.  Producers
    that allocate planes at (PH, PW) with content at (pr, pc) let the kernel
    skip its runtime jnp.pad (an ~11 MB copy per VGA canvas).  An enlarged
    output grid (``out_grid`` of :func:`grad_hist_poly_pallas`) needs NO
    extra plane rows: pad tiles skip their DMA entirely, so the planes stay
    content-grid sized."""
    TU, TV, gi, gj = channel_grid(Hc, Wc, tile)
    return PAD_R, PAD_C, gi * TU + 2 * PAD_R, gj * TV + 2 * PAD_C


def _db_fetch(srcs, TU, TV, content_grid):
    """Grid-sequential double-buffered tile fetch — the proven scaffold
    (ONE copy shared by every channel kernel; extracted per ADVICE r1).

    ``srcs``: list of ``(hbm_ref, scratch_ref, sem_ref, batched, HR, HC)``;
    each source's tile ``(.., TU + 2*HR, TV + 2*HC)`` at grid cell (i, j)
    is DMAd into ``scratch_ref[slot]``.  Double buffering across grid
    steps: every CONTENT tile's DMAs are started by the predecessor step
    (pad steps still prefetch for their successor) and waited exactly once
    by their own step.  Returns ``(slot, ic_cur)``.
    """
    bb = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gi_n = pl.num_programs(1)
    gj_n = pl.num_programs(2)
    total = pl.num_programs(0) * gi_n * gj_n
    step = (bb * gi_n + i) * gj_n + j
    slot = jax.lax.rem(step, 2)

    def is_content(ii, jj):
        if content_grid is None:
            return True
        return jnp.logical_and(ii < content_grid[0], jj < content_grid[1])

    def tile_dmas(sl, b2, ii, jj):
        # pad tiles (enlarged out_grid) never form this access — their
        # source rows/cols lie outside the content-grid-sized planes
        out = []
        for hbm, scratch, sem, batched, HR, HC in srcs:
            src = hbm.at[b2] if batched else hbm
            src = src.at[..., pl.ds(ii * TU, TU + 2 * HR),
                         pl.ds(jj * TV, TV + 2 * HC)]
            out.append(pltpu.make_async_copy(src, scratch.at[sl],
                                             sem.at[sl]))
        return out

    ic_cur = is_content(i, j)

    @pl.when(jnp.logical_and(step == 0, ic_cur)
             if content_grid is not None else step == 0)
    def _first():
        for cp in tile_dmas(slot, bb, i, j):
            cp.start()

    s1 = step + 1
    b1 = s1 // (gi_n * gj_n)
    r1 = jax.lax.rem(s1, gi_n * gj_n)
    i1 = r1 // gj_n
    j1 = jax.lax.rem(r1, gj_n)
    nxt = s1 < total
    if content_grid is not None:
        nxt = jnp.logical_and(nxt, is_content(i1, j1))

    @pl.when(nxt)
    def _prefetch_next():
        for cp in tile_dmas(jax.lax.rem(s1, 2),
                            jnp.minimum(b1, pl.num_programs(0) - 1),
                            i1, j1):
            cp.start()

    @pl.when(ic_cur if content_grid is not None else step >= 0)
    def _wait_own():
        for cp in tile_dmas(slot, bb, i, j):
            cp.wait()

    return slot, ic_cur


def _make_kernel(TU, TV, smooth, n_bins, full, bias, with_mask,
                 content_grid=None, exact_plan=None, odt=jnp.float32,
                 float_dd=False, fast=False):
    HR, HC = 8, 128  # fetched halo (alignment); compute uses 2 plane px
    # fast-mode compute dtype: MEASURED DEAD END at bf16 (round 5).  bf16
    # add/mul/select all legalize (probe_mosaic_bf16.py), but running the
    # whole arithmetic chain in bf16 made the trained-flagship headline
    # SLOWER (1196 vs 1245 MP/s for f32-compute fast mode): v5e's VPU
    # executes bf16 elementwise ops at f32 rate (no 2-lane packing win),
    # so the extra converts are pure cost.  Fast mode keeps f32 compute;
    # its gains are the skipped dd-projection chains and the bf16 OUTPUT
    # (half the canvas write + downstream DMA traffic).
    del fast
    cdt = jnp.float32

    def kernel(*refs):
        if with_mask:
            mask_ref, planes_hbm, out_ref, tile_ref, dma_sem = refs
        else:
            planes_hbm, out_ref, tile_ref, dma_sem = refs
            mask_ref = None
        i = pl.program_id(1)
        j = pl.program_id(2)
        slot, _ic = _db_fetch(
            [(planes_hbm, tile_ref, dma_sem, True, HR, HC)],
            TU, TV, content_grid)

        def compute():
            # plane px (I0+dr, J0+dc) lives at tile_ref[slot, a, b,
            # HR+dr, HC+dc]
            s = 2  # compute halo in plane px

            def at1(a, b, dr, dc):
                """(TU+4, TV+4) f32 view of plane (a,b) at offset (dr, dc),
                covering plane px [I0-2+dr, I0+TU+2+dr) x [J0-2+dc, ...)."""
                v = tile_ref[slot, a, b,
                             HR - s + dr:HR - s + dr + TU + 2 * s,
                             HC - s + dc:HC - s + dc + TV + 2 * s]
                return v.astype(cdt)

            # smoothed-gradient prefilters (term order =
            # channels._gradients_poly); float-image content sums the
            # [1,2,1] taps error-free and rounds once (scipy's f64
            # accumulator semantics, ops.dd)
            if float_dd:
                from .dd import two_sum

                def tap3(a, b, c):
                    s1, e1 = two_sum(a, 2.0 * b)
                    s2, e2 = two_sum(s1, c)
                    return s2 + (e1 + e2)
            else:
                def tap3(a, b, c):
                    return a + 2.0 * b + c
            sx = [[tap3(at1(a, 1, 0, -1), at1(a, 0, 0, 0), at1(a, 1, 0, 0)),
                   tap3(at1(a, 0, 0, 0), at1(a, 1, 0, 0), at1(a, 0, 0, 1))]
                  for a in (0, 1)]
            sy = [[tap3(at1(1, b, -1, 0), at1(0, b, 0, 0), at1(1, b, 0, 0))
                   for b in (0, 1)],
                  [tap3(at1(0, b, 0, 0), at1(1, b, 0, 0), at1(0, b, 1, 0))
                   for b in (0, 1)]]

            def sl2(x, dr, dc):
                """(TU+2, TV+2) view of (TU+4, TV+4) at offset (dr, dc)."""
                return x[1 + dr:1 + dr + TU + 2, 1 + dc:1 + dc + TV + 2]

            gy = [[sl2(sx[1][b], -1, 0) - sl2(sx[1][b], 0, 0) for b in (0, 1)],
                  [sl2(sx[0][b], 0, 0) - sl2(sx[0][b], 1, 0) for b in (0, 1)]]
            gx = [[sl2(sy[a][1], 0, -1) - sl2(sy[a][1], 0, 0),
                   sl2(sy[a][0], 0, 0) - sl2(sy[a][0], 0, 1)] for a in (0, 1)]

            max_theta = 2 * np.pi if full else np.pi
            theta = np.linspace(0, max_theta, n_bins + 1)[:-1]
            css64 = np.cos(theta)
            sns64 = np.sin(theta)
            css = css64.astype(np.float32)
            sns = sns64.astype(np.float32)

            if with_mask:
                mask = mask_ref[...]

            def proj(k, a, b):
                if exact_plan is not None:
                    # exhaustively-verified f32 chain == the reference's
                    # f64-promoted NumPy store (ops.exact.projection_plan)
                    from .exact import _eval_terms_jnp
                    mode, terms = exact_plan.bins[k]
                    ch = _eval_terms_jnp(terms, gx[a][b], gy[a][b], mode)
                elif float_dd:
                    # float content: the f64-promoted store in double-float
                    from .dd import proj_dd
                    ch = proj_dd(gx[a][b], gy[a][b],
                                 np.float64(css64[k]), np.float64(sns64[k]))
                else:
                    ch = gx[a][b] * float(css[k]) \
                        - gy[a][b] * float(sns[k])
                v = jnp.maximum(jnp.abs(ch) - bias, 0.0) if bias \
                    else jnp.abs(ch)
                if full:
                    v = jnp.sign(ch) * v
                return v

            for k in range(n_bins):
                vs = [[proj(k, a, b) for b in (0, 1)] for a in (0, 1)]
                # reference f32 pool association ((TL + BL) + TR) + BR
                # (/root/reference/waldboost/channels.py:55-64)
                pooled = (((vs[0][0] + vs[1][0]) + vs[0][1])
                          + vs[1][1]) * 0.25
                if smooth == 1:
                    # the numba stencil's left-to-right 9-term f32 order
                    # (/root/reference/waldboost/channels.py:80-83)
                    def pat(dr, dc):
                        return pooled[1 + dr:1 + dr + TU,
                                      1 + dc:1 + dc + TV]
                    v = pat(-1, -1) + 2.0 * pat(-1, 0) + pat(-1, 1) \
                        + 2.0 * pat(0, -1) + 4.0 * pat(0, 0) \
                        + 2.0 * pat(0, 1) \
                        + pat(1, -1) + 2.0 * pat(1, 0) + pat(1, 1)
                    outk = v * jnp.asarray(1.0 / 16.0, cdt)
                    if with_mask:
                        # select (not multiply): gap planes may hold garbage
                        # (incl. NaN) when assembled without zero-init, and
                        # ring zeros must stay exact zeros
                        outk = jnp.where(mask > 0, outk, 0.0)
                else:
                    outk = pooled[1:TU + 1, 1:TV + 1]
                out_ref[k] = outk.astype(odt)

        # a tile is live when it's inside the content grid AND (with the
        # smooth interior mask) some output survives the mask select — gap
        # tiles between pyramid shelves are all-masked, so they emit zeros
        # and skip both the DMA and the compute
        live = None
        if content_grid is not None:
            live = jnp.logical_and(i < content_grid[0], j < content_grid[1])
        if with_mask:
            any_mask = jnp.sum(mask_ref[...]) > 0.0
            live = any_mask if live is None \
                else jnp.logical_and(live, any_mask)

        if live is None:
            compute()
            return

        @pl.when(live)
        def _live_tile():
            compute()

        @pl.when(jnp.logical_not(live))
        def _dead_tile():
            for k in range(n_bins):
                out_ref[k] = jnp.zeros((TU, TV), odt)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("smooth", "n_bins", "full", "bias", "tile", "interpret",
                     "content_hw", "out_grid", "crop", "alloc_grid", "fast"),
)
def grad_hist_poly_pallas(
    planes: jax.Array, interior_mask: Optional[jax.Array],
    smooth: int, n_bins: int = 4, full: bool = False, bias: float = 0.0,
    tile: Tuple[int, int] = TILE, interpret: bool = False,
    content_hw: Optional[Tuple[int, int]] = None,
    out_grid: Optional[Tuple[int, int]] = None, crop: bool = True,
    alloc_grid: Optional[Tuple[int, int]] = None, fast: bool = False,
) -> jax.Array:
    """Pooled grad_hist channel canvas from polyphase planes, fused.

    ``planes``: (2, 2, Hc, Wc) or (B, 2, 2, Hc, Wc) float32 (halo-reflected).
    ``interior_mask``: (Hc, Wc) bool/float32 smooth interior mask (required
    when ``smooth == 1``).  With ``content_hw`` given, planes are expected
    PRE-PADDED per :func:`plane_pad_geometry` (no runtime pad copy).
    ``out_grid``/``crop=False`` let a downstream consumer (the cascade
    kernel) take the uncropped (GI*TU, GJ*TV) canvas sized for its own halo
    fetch — zero copies between the two kernels.
    Returns (B?, n_bins, Hc, Wc) float32 (or the uncropped canvas).
    """
    batched = planes.ndim == 5
    if not batched:
        planes = planes[None]
    B = planes.shape[0]
    HR, HC = PAD_R, PAD_C
    if content_hw is not None:
        Hc, Wc = content_hw
    else:
        Hc, Wc = planes.shape[-2], planes.shape[-1]
    assert out_grid is None or alloc_grid is None
    TU, TV, gi, gj = channel_grid(Hc, Wc, tile, out_grid)
    gi_p = max(-(-Hc // TU), 1)  # content grid: plane allocation basis
    gj_p = max(-(-Wc // TV), 1)
    if content_hw is not None:
        assert planes.shape[-2:] == (gi_p * TU + 2 * HR,
                                     gj_p * TV + 2 * HC), \
            (planes.shape, gi_p * TU + 2 * HR, gj_p * TV + 2 * HC)
        planes_p = planes
    else:
        planes_p = jnp.pad(planes,
                           ((0, 0), (0, 0), (0, 0),
                            (HR, gi_p * TU + HR - Hc),
                            (HC, gj_p * TV + HC - Wc)))
    # integer-valued planes may arrive bf16 (exact for uint8 content) —
    # the kernel upcasts to f32 at read; f64/other inputs normalize to f32
    if planes_p.dtype not in (jnp.bfloat16, jnp.float32):
        planes_p = planes_p.astype(jnp.float32)
    with_mask = smooth == 1 and interior_mask is not None
    gi_c = max(-(-Hc // TU), 1)
    gj_c = max(-(-Wc // TV), 1)
    content_grid = (gi_c, gj_c) if (gi, gj) != (gi_c, gj_c) else None
    # bf16 planes mark uint8 image content (model._poly_planes): engage the
    # exact projection plan so the kernel matches the reference's f64 store
    # bit for bit (channels._project_hist does the same on the XLA path).
    # fast serving mode (WB_SERVING_MODE=fast) skips the plan — the plain
    # f32 cos/sin projection chain (the dd-projection exactness tax was
    # ~19 us/VGA-img, BASELINE.md "Serving-wall records") — and emits a
    # bf16 canvas (halves the canvas write + the cascade kernel's DMA, and
    # feeds the bf16 cascade stage chain natively).  Deviation quantified
    # in BASELINE.md's fast-mode table.
    exact_plan = None
    if planes_p.dtype == jnp.bfloat16 and not fast:
        from .exact import projection_plan
        exact_plan = projection_plan(n_bins, full)
    # f32 planes mark FLOAT image content: the dd chains replicate the
    # reference's f64 prefilter accumulation + f64-promoted projection
    # store (measured ≤5-ULP parity; PARITY.md float status)
    float_dd = planes_p.dtype == jnp.float32 and not fast
    odt = jnp.bfloat16 if fast else jnp.float32
    kernel = _make_kernel(TU, TV, smooth, n_bins, full, float(bias),
                          with_mask, content_grid=content_grid,
                          exact_plan=exact_plan, odt=odt,
                          float_dd=float_dd, fast=fast)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [planes_p]
    if with_mask:
        mask_p = jnp.pad(interior_mask.astype(jnp.float32),
                         ((0, gi * TU - Hc), (0, gj * TV - Wc)))
        in_specs.insert(0, pl.BlockSpec((TU, TV), lambda b, i, j: (i, j),
                                        memory_space=pltpu.VMEM))
        args.insert(0, mask_p)

    def kernel_b(*refs):
        if with_mask:
            mask_ref, planes_hbm, out_ref, tile_ref, dma_sem = refs
            kernel(mask_ref, planes_hbm, out_ref.at[0], tile_ref, dma_sem)
        else:
            planes_hbm, out_ref, tile_ref, dma_sem = refs
            kernel(planes_hbm, out_ref.at[0], tile_ref, dma_sem)

    # alloc_grid: the output allocation is LARGER than the written tile
    # grid (a downstream consumer's halo fetch region).  The extra area is
    # left uninitialized — it only ever feeds windows that are statically
    # dead in the consumer's valid mask, so zero-filling it (out_grid's pad
    # tiles) would be pure wasted bandwidth.
    agi = max(gi, alloc_grid[0]) if alloc_grid is not None else gi
    agj = max(gj, alloc_grid[1]) if alloc_grid is not None else gj

    out = pl.pallas_call(
        kernel_b,
        grid=(B, gi, gj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_bins, TU, TV),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_bins, agi * TU, agj * TV),
                                       odt),
        scratch_shapes=[
            # leading 2: double-buffer slots (DMA prefetch across grid steps)
            pltpu.VMEM((2, 2, 2, TU + 2 * HR, TV + 2 * HC), planes_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)

    if crop:
        out = out[:, :, :Hc, :Wc]
    return out if batched else out[0]


def _fpga_responses(kind):
    """Static response list builder for the FPGA kinds.  Composite kinds
    ("a+b") concatenate their parts' responses — the fused equivalent of
    channels.compose_channel_functions for the FPGA family."""
    def one(k):
        if k == "grad_mag_u1":
            return [lambda gx, gy: jnp.maximum(jnp.abs(gx), jnp.abs(gy))]
        assert k == "grad_hist_4_u1", k
        # {dx, (dx-dy)/2, dy, (dx+dy)/2}; half-integer orientations
        # truncate toward zero (int32 assignment semantics)
        return [lambda gx, gy: gx,
                lambda gx, gy: jnp.trunc(0.5 * gx - 0.5 * gy),
                lambda gx, gy: gy,
                lambda gx, gy: jnp.trunc(0.5 * gx + 0.5 * gy)]

    fns = []
    for part in kind.split("+"):
        fns += one(part)
    return fns


def _make_fpga_kernel(TU, TV, kind, smooth, content_grid=None):
    """FPGA integer-channel kernel body: polyphase Sobel, fixed-orientation
    responses, ``min(|y|//4, 255)`` quantization, stencil-ring mask select,
    the uint8-wraparound 2x2 pool, and (``smooth == 1``) the 3x3/16 binomial
    smooth with uint8 truncation + interior masking — all in VMEM.
    Term-for-term the same expressions as fpga.channels._sobel_poly /
    _fpga_poly_channels (+ ops.image.smooth_3x3's 9-term order; integer
    values are exact in f32), so outputs are bitwise identical to the XLA
    polyphase chain.  Reference semantics:
    /root/reference/waldboost/fpga/channels.py:5-53 (stencil Sobel, zero
    borders, orientation quantization), /root/reference/waldboost/channels.py
    :55-64 (uint8 avg pool with mod-256 wraparound), :78-90 (3x3/16 smooth,
    zero borders, integer truncation).

    smooth == 0: the ring mask rides the auto-fetched (2,2,TU,TV) BlockSpec
    (no halo needed).  smooth == 1: responses are needed on a (TU+2, TV+2)
    extent, so the ring mask is fetched WITH halo through the same
    double-buffered manual-DMA scaffold as the planes, and the smooth
    interior mask arrives as an extra auto-fetched (TU, TV) block."""
    resp_fns = _fpga_responses(kind)
    n_out = len(resp_fns)
    HR, HC = 8, 128  # fetched halo (alignment); compute uses 1-2 plane px
    s = 2 if smooth == 1 else 1  # Sobel radius + smooth extent, plane px
    E = 2 * (s - 1)              # extra output extent (TU+E, TV+E)

    def kernel(*refs):
        if smooth == 1:
            (interior_ref, planes_hbm, mask_hbm, out_ref,
             tile_ref, dma_sem, mtile_ref, msem) = refs
            mask_ref = None
        else:
            mask_ref, planes_hbm, out_ref, tile_ref, dma_sem = refs
            mask_hbm = mtile_ref = msem = interior_ref = None
        i = pl.program_id(1)
        j = pl.program_id(2)
        srcs = [(planes_hbm, tile_ref, dma_sem, True, HR, HC)]
        if mask_hbm is not None:
            srcs.append((mask_hbm, mtile_ref, msem, False, HR, HC))
        slot, _ic = _db_fetch(srcs, TU, TV, content_grid)

        def compute():
            def at1(a, b, dr, dc):
                v = tile_ref[slot, a, b,
                             HR - s + dr:HR - s + dr + TU + 2 * s,
                             HC - s + dc:HC - s + dc + TV + 2 * s]
                return v.astype(jnp.float32)

            def sl2(x, dr, dc):
                """(TU+E, TV+E) view of a (TU+2s, TV+2s) array."""
                return x[1 + dr:1 + dr + TU + E, 1 + dc:1 + dc + TV + E]

            # vertical [1,2,1] prefilter, then horizontal difference -> dx
            # (term order = fpga.channels._sobel_poly)
            sy = [[at1(1, b, -1, 0) + 2.0 * at1(0, b, 0, 0) + at1(1, b, 0, 0)
                   for b in (0, 1)],
                  [at1(0, b, 0, 0) + 2.0 * at1(1, b, 0, 0) + at1(0, b, 1, 0)
                   for b in (0, 1)]]
            dx = [[sl2(sy[a][1], 0, 0) - sl2(sy[a][1], 0, -1),
                   sl2(sy[a][0], 0, 1) - sl2(sy[a][0], 0, 0)]
                  for a in (0, 1)]
            # horizontal [1,2,1] prefilter, then vertical difference -> dy
            sx = [[at1(a, 1, 0, -1) + 2.0 * at1(a, 0, 0, 0) + at1(a, 1, 0, 0),
                   at1(a, 0, 0, 0) + 2.0 * at1(a, 1, 0, 0) + at1(a, 0, 0, 1)]
                  for a in (0, 1)]
            dy = [[sl2(sx[1][b], 0, 0) - sl2(sx[1][b], -1, 0) for b in (0, 1)],
                  [sl2(sx[0][b], 1, 0) - sl2(sx[0][b], 0, 0) for b in (0, 1)]]

            def ringmask(a, b):
                if smooth != 1:
                    return mask_ref[a, b]
                return mtile_ref[slot, a, b,
                                 HR - 1:HR - 1 + TU + E,
                                 HC - 1:HC - 1 + TV + E].astype(jnp.float32)

            # responses are evaluated INSIDE the k loop (not materialized
            # for all channels upfront): composite kinds (n_out=5) with the
            # smooth halo otherwise hold 20 (TU+2, TV+2) f32 intermediates
            # live at once and blow the 16 MB scoped-VMEM stack at 4K
            for k in range(n_out):
                def q(a, b):
                    v = jnp.minimum(
                        jnp.floor(jnp.abs(resp_fns[k](dx[a][b],
                                                      dy[a][b])) * 0.25),
                        255.0)
                    # select (not multiply): fused-assembly gap planes may
                    # hold garbage (incl. NaN); ring zeros must stay exact
                    return jnp.where(ringmask(a, b) > 0, v, 0.0)

                sk = (q(0, 0) + q(1, 0)) + (q(0, 1) + q(1, 1))
                sk = sk - 256.0 * jnp.floor(sk * (1.0 / 256.0))  # u8 wrap
                pooled = jnp.floor(sk * 0.25)
                if smooth == 1:
                    # the numba stencil's 9-term order + uint8 truncation
                    # (integer sums <= 16*255 are exact in f32)
                    def pat(dr, dc):
                        return pooled[1 + dr:1 + dr + TU,
                                      1 + dc:1 + dc + TV]
                    v = pat(-1, -1) + 2.0 * pat(-1, 0) + pat(-1, 1) \
                        + 2.0 * pat(0, -1) + 4.0 * pat(0, 0) \
                        + 2.0 * pat(0, 1) \
                        + pat(1, -1) + 2.0 * pat(1, 0) + pat(1, 1)
                    v = jnp.floor(v * jnp.float32(1.0 / 16.0))
                    out_ref[k] = jnp.where(interior_ref[...] > 0, v, 0.0)
                else:
                    out_ref[k] = pooled

        if smooth == 1:
            live = jnp.sum(interior_ref[...]) > 0.0
        else:
            live = jnp.sum(mask_ref[...]) > 0.0
        if content_grid is not None:
            live = jnp.logical_and(
                live, jnp.logical_and(i < content_grid[0],
                                      j < content_grid[1]))

        @pl.when(live)
        def _live_tile():
            compute()

        @pl.when(jnp.logical_not(live))
        def _dead_tile():
            for k in range(n_out):
                out_ref[k] = jnp.zeros((TU, TV), jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kind", "smooth", "tile", "interpret", "content_hw",
                     "out_grid", "crop", "alloc_grid"),
)
def fpga_poly_pallas(
    planes: jax.Array, border_mask_poly: jax.Array, kind: str,
    smooth: int = 0, interior_mask=None,
    tile: Tuple[int, int] = TILE, interpret: bool = False,
    content_hw: Optional[Tuple[int, int]] = None,
    out_grid: Optional[Tuple[int, int]] = None, crop: bool = True,
    alloc_grid: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Pooled (and optionally smoothed) FPGA integer channel canvas from
    polyphase planes, fused.

    ``planes``: (2, 2, Hc, Wc) or (B, 2, 2, Hc, Wc) bf16/f32 polyphase image
    canvas.  ``border_mask_poly``: (2, 2, Hc, Wc) stencil ring mask (the
    numba-stencil zero-border convention of the reference, applied to the
    quantized responses BEFORE the pool — model._poly_channels builds it).
    ``kind``: "grad_hist_4_u1" (4 channels), "grad_mag_u1" (1), or a
    "+"-composite ("grad_hist_4_u1+grad_mag_u1", 5 — BASELINE config 5's
    multi-channel pipeline).  ``smooth == 1`` additionally applies the
    3x3/16 binomial smooth with integer truncation and zeroes outside
    ``interior_mask`` (Hc, Wc).  The content_hw / out_grid / crop /
    alloc_grid contract matches :func:`grad_hist_poly_pallas`.  Output
    values are integers in [0, 255] as f32, bitwise equal to the XLA chain
    (fpga.channels._grad_hist_4_u1_poly_fn et al. + model._poly_channels'
    smooth tail).
    """
    n_out = len(_fpga_responses(kind))
    batched = planes.ndim == 5
    if not batched:
        planes = planes[None]
    B = planes.shape[0]
    HR, HC = PAD_R, PAD_C
    if content_hw is not None:
        Hc, Wc = content_hw
    else:
        Hc, Wc = planes.shape[-2], planes.shape[-1]
    assert out_grid is None or alloc_grid is None
    TU, TV, gi, gj = channel_grid(Hc, Wc, tile, out_grid)
    gi_p = max(-(-Hc // TU), 1)
    gj_p = max(-(-Wc // TV), 1)
    if content_hw is not None:
        assert planes.shape[-2:] == (gi_p * TU + 2 * HR,
                                     gj_p * TV + 2 * HC), \
            (planes.shape, gi_p * TU + 2 * HR, gj_p * TV + 2 * HC)
        planes_p = planes
    else:
        planes_p = jnp.pad(planes,
                           ((0, 0), (0, 0), (0, 0),
                            (HR, gi_p * TU + HR - Hc),
                            (HC, gj_p * TV + HC - Wc)))
    if planes_p.dtype not in (jnp.bfloat16, jnp.float32):
        planes_p = planes_p.astype(jnp.float32)
    gi_c = max(-(-Hc // TU), 1)
    gj_c = max(-(-Wc // TV), 1)
    content_grid = (gi_c, gj_c) if (gi, gj) != (gi_c, gj_c) else None
    kernel = _make_fpga_kernel(TU, TV, kind, smooth,
                               content_grid=content_grid)

    agi = max(gi, alloc_grid[0]) if alloc_grid is not None else gi
    agj = max(gj, alloc_grid[1]) if alloc_grid is not None else gj

    scratch = [
        pltpu.VMEM((2, 2, 2, TU + 2 * HR, TV + 2 * HC), planes_p.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if smooth == 1:
        assert interior_mask is not None, "smooth==1 needs interior_mask"
        # ring mask fetched WITH halo (responses live on a (TU+2, TV+2)
        # extent): bf16 0/1 values are exact, same padded geometry as planes
        mask_ext = jnp.pad(border_mask_poly.astype(jnp.bfloat16),
                           ((0, 0), (0, 0),
                            (HR, gi_p * TU + HR - Hc),
                            (HC, gj_p * TV + HC - Wc)))
        interior_p = jnp.pad(interior_mask.astype(jnp.float32),
                             ((0, gi * TU - Hc), (0, gj * TV - Wc)))
        in_specs = [
            pl.BlockSpec((TU, TV), lambda b, i, j: (i, j),
                         memory_space=pltpu.VMEM),     # interior mask
            pl.BlockSpec(memory_space=pl.ANY),      # planes (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),      # ring mask (manual)
        ]
        args = [interior_p, planes_p, mask_ext]
        scratch += [
            pltpu.VMEM((2, 2, 2, TU + 2 * HR, TV + 2 * HC), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]

        def kernel_b(interior_ref, planes_hbm, mask_hbm, out_ref,
                     tile_ref, dma_sem, mtile_ref, msem):
            kernel(interior_ref, planes_hbm, mask_hbm, out_ref.at[0],
                   tile_ref, dma_sem, mtile_ref, msem)
    else:
        mask_p = jnp.pad(border_mask_poly.astype(jnp.float32),
                         ((0, 0), (0, 0), (0, gi * TU - Hc),
                          (0, gj * TV - Wc)))
        in_specs = [
            pl.BlockSpec((2, 2, TU, TV), lambda b, i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # planes (manual DMA)
        ]
        args = [mask_p, planes_p]

        def kernel_b(mask_ref, planes_hbm, out_ref, tile_ref, dma_sem):
            kernel(mask_ref, planes_hbm, out_ref.at[0], tile_ref, dma_sem)

    out = pl.pallas_call(
        kernel_b,
        grid=(B, gi, gj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_out, TU, TV),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out, agi * TU, agj * TV),
                                       jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    if crop:
        out = out[:, :, :Hc, :Wc]
    return out if batched else out[0]
