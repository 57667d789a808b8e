"""Polyphase-resize channel-canvas assembly (XLA path + shared geometry).

The pyramid's uint8 levels are produced by 4-corner *selector* resize
matrices (uint8 content is bf16-exact, so one bf16 matmul pass per axis is
bitwise equal to HIGHEST-precision f32 — see PARITY.md) and every level's
channels are computed ONCE over the packed canvas.  This module holds the
host-side tap/matrix builders, the XLA plane/channel pipelines, and the
per-level fallback; the fused Pallas plane kernel lives in
:mod:`waldboost_tpu.polyphase_fused`, the packing planner in
:mod:`waldboost_tpu.packing`.

Exactness contract: resize floors are computed in exact rational
arithmetic and the float pool/smooth keep the reference's f32 association
ORDER (see ops/exact.py and CLAUDE.md round-7 notes) — outputs are
bit-equal to /root/reference/waldboost/channels.py:111-146 on uint8 input.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .channels import compute_pyramid
from .packing import PackedPyramidPlan, _band_rows, _round_up


def _use_channel_kernel() -> bool:
    # the backend toggle (and its test monkeypatch surface) lives in
    # model.py; resolved lazily to avoid a circular import
    from . import model
    return model._use_channel_kernel()

def _channel_canvas_fast(image, shrink, smooth, cf, packed: PackedPyramidPlan):
    """Canvas-first channel pipeline (the fast path).

    Every level is resized from its octave image into ONE image-space canvas
    (matmul resize on the MXU), level halos are filled with symmetric
    reflections via one static gather, and the channel function / shrink
    pooling / smoothing each run ONCE over the whole canvas.  Per-level
    boundary semantics (scipy reflect for the float channels, numba-stencil
    zero borders for the integer channels, per-level zero-border smoothing)
    are restored by the halo reflection and static masks — outputs inside
    every level rect are identical to the per-level reference pipeline.
    """
    from .channels import CanvasCtx, _compute_octaves
    from .ops.warp import build_resize_matrix, reflect_halos, resize_taps

    if shrink == 2 and cf.canvas_fn_poly is not None:
        return _channel_canvas_poly(image, smooth, cf, packed)

    n_oct = max(pl.level.octave for pl in packed.levels) + 1
    octaves = _compute_octaves(image, n_oct)
    is_int = jnp.issubdtype(image.dtype, jnp.integer)

    Hc_img, Wc_img = packed.image_canvas_shape()
    img_canvas = jnp.zeros((Hc_img, Wc_img), jnp.float32)
    for pl in packed.levels:
        lv = pl.level
        oct_img = octaves[lv.octave].astype(jnp.float32)
        oh, ow = oct_img.shape
        if is_int:
            # exact-arithmetic resize + floor (integer tap numerators, MXU
            # matmuls at HIGHEST precision, one exact final floor) — the
            # truncating uint8 cast of the reference has NO float ties here
            # (PARITY.md §1, ops.exact)
            from .ops.exact import axis_taps_exact, resize_exact_matmul
            im = resize_exact_matmul(oct_img,
                                     axis_taps_exact(oh, lv.height),
                                     axis_taps_exact(ow, lv.width))
        else:
            Rh = build_resize_matrix(*resize_taps(oh, lv.height), oh)
            Rw = build_resize_matrix(*resize_taps(ow, lv.width), ow)
            # HIGHEST precision: the TPU default runs f32 matmuls in bf16,
            # whose ~0.5-unit error is visible in float channels
            im = jnp.einsum("ah,hw,bw->ab", Rh, oct_img, Rw,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        img_canvas = jax.lax.dynamic_update_slice(
            img_canvas, im, (pl.y * shrink, pl.x * shrink))

    if cf.boundary == "reflect" and cf.halo > 0:
        regions = packed.reflect_regions()
        img_canvas = reflect_halos(img_canvas, regions)
        reflect = lambda x: reflect_halos(x, regions)
    else:
        reflect = lambda x: x

    border_mask = None
    if cf.boundary == "stencil_zero":
        border_mask = jnp.asarray(packed.stencil_border_mask())
    ctx = CanvasCtx(reflect=reflect, border_mask=border_mask,
                    exact_int=bool(is_int))
    chns = cf.canvas_fn(img_canvas, ctx)

    if shrink == 2:
        from .ops.image import avg_pool_2
        chns = avg_pool_2(chns)
    if smooth == 1:
        from .ops.image import smooth_3x3
        chns = smooth_3x3(chns)
        interior = jnp.asarray(packed.smooth_interior_mask())
        zero = jnp.zeros((), chns.dtype)
        chns = jnp.where(interior[None], chns, zero)
    return chns


def _poly_pad_geometry(cf, packed: PackedPyramidPlan, smooth: int = 0,
                       dtype=None):
    """Pre-pad geometry for the fused channel kernel (or None for XLA).
    Float content (``dtype`` floating) never uses the kernel — its
    double-float chains blow Mosaic's scoped-VMEM stack at full-frame
    tiles — so it gets unpadded planes for the XLA chain."""
    if dtype is not None and jnp.issubdtype(dtype, jnp.floating):
        return None
    if (cf.poly_kernel is not None and _use_channel_kernel()
            and (smooth == 0 or cf.poly_kernel_smooth)):
        from .ops.channels_pallas import plane_pad_geometry
        return plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    return None


def _channel_canvas_poly(image, smooth, cf, packed: PackedPyramidPlan):
    """Polyphase canvas pipeline (shrink=2 fast path), single image."""
    geom = _poly_pad_geometry(cf, packed, smooth, dtype=image.dtype)
    planes = _poly_planes(image, cf, packed, geom=geom)
    return _poly_channels(planes, smooth, cf, packed, padded=geom is not None)


def _channel_canvas_batch(images, shrink, n_per_oct, smooth, cf,
                          packed: PackedPyramidPlan, mats=None, spec=None):
    """(B, H, W) images -> (B, C, Hc, Wc) channel canvases.

    The polyphase fast path runs the fused channel kernel ONCE over the whole
    batch (batch grid dimension) — a Pallas call cannot be vmapped, so
    batched callers must come through here rather than vmapping the
    single-image canvas."""
    if shrink == 2 and cf.canvas_fn_poly is not None:
        geom = _poly_pad_geometry(cf, packed, smooth, dtype=images.dtype)
        planes = jax.vmap(
            lambda im: _poly_planes(im, cf, packed, geom=geom,
                                    mats=mats, spec=spec))(images)
        return _poly_channels(planes, smooth, cf, packed,
                              padded=geom is not None)
    if cf.canvas_fn is not None:
        return jax.vmap(
            lambda im: _channel_canvas_fast(im, shrink, smooth, cf, packed)
            .astype(jnp.float32))(images)
    return jax.vmap(
        lambda im: _channel_canvas_per_level(im, shrink, n_per_oct, smooth,
                                             cf, packed))(images)


def _poly_planes(image, cf, packed: PackedPyramidPlan, geom=None,
                 mats=None, spec=None, fast=False, fast_bf16=None):
    """Resize every pyramid level into the 2x2-polyphase canvas planes.

    With ``geom = (pr, pc, PH, PW)`` the planes are allocated pre-padded for
    the fused channel kernel (content at offset (pr, pc)), which removes the
    kernel's runtime pad copy.

    The full-resolution image canvas is materialized directly as its 2x2
    polyphase decomposition (2, 2, Hc, Wc): each level's resize matmul emits
    the four (row-phase, col-phase) planes in ONE einsum (the resize matrices'
    rows are just regrouped phase-major).  Downstream, stencils become
    cross-phase shifted adds and the shrink-2 average pool becomes
    elementwise — there is no strided access anywhere.  Level-edge reflect
    halos ride the resize matrices (duplicated boundary rows/cols), identical
    to a post-hoc reflect_halos_poly pass.

    The planes are assembled by shelf-band CONCATENATION: the packer's even
    halo gives every level one plane-space placement shared by all four
    phases, so each shelf of levels becomes one width-axis concat of
    (2, 2, hq, wq) blocks and zero gap strips, and the canvas one height-axis
    concat of shelf bands.  (A dynamic_update_slice per phase-quadrant — 4
    per level, ~190 for a VGA pyramid — was measured latency-bound at
    ~0.22 ms/image; the concat tree is a handful of fused ops.)
    """
    from .channels import _compute_octaves_f32

    n_oct = max((pl.level.octave for pl in packed.levels), default=0) + 1
    octaves = _compute_octaves_f32(image, n_oct)
    is_int = jnp.issubdtype(image.dtype, jnp.integer)

    Hc, Wc = packed.canvas_h, packed.canvas_w
    # Reflect halos ride the resize matrices: a level's reflected halo band
    # is a copy of its own resized boundary rows/cols, so duplicating those
    # rows in R (host-side, _ext_pm in _poly_level_blocks) emits the halo
    # directly from the einsum — zero extra device ops, bit-identical to a
    # post-hoc reflect_halos_poly pass (the separable two-pass corner
    # semantics are exactly the outer product of duplicated rows and cols).
    halo = packed.halo if (cf.boundary == "reflect" and cf.halo > 0) else 0
    assert halo % 2 == 0, "packer guarantees an even baked halo"
    he2 = halo // 2  # halo in plane (channel-space) units

    pr, pc = (geom[0], geom[1]) if geom is not None else (0, 0)
    PH, PW = (geom[2], geom[3]) if geom is not None else (Hc, Wc)
    # prebuilt selector matrices apply only on the int path and only for
    # the geometry they were baked for (shelf pitches ride the Sh rows)
    use_mats = (mats is not None and spec is not None and is_int
                and geom is not None and spec.get("geom") == tuple(geom))
    if fast_bf16 is None:
        # serving builds resolve this at BUILD time and pass it in; the
        # fallback read here happens at trace time (CLAUDE.md landmine:
        # env reads inside a traced fn bake the first value in)
        fast_bf16 = _fast_float_bf16()
    blocks = _poly_level_blocks(octaves, cf, packed, halo, is_int,
                                mats=mats if use_mats else None,
                                spec=spec if use_mats else None,
                                fast=fast, fast_bf16=fast_bf16)
    # integer-valued canvases (uint8 images) are exact in bf16 (<= 255 needs
    # 8 mantissa bits): halving the plane bytes halves both the assembly
    # writes and the channel kernel's fetch traffic, with identical values
    # after the f32 upcast downstream.  Fast serving mode (WB_SERVING_MODE=
    # fast) keeps FLOAT content f32 by default (exact selection, plain
    # lerp — the deviation stays at the uint8 fast level); WB_FAST_FLOAT=
    # bf16 opts into quantizing the input content itself (measured 20.7%
    # scene box flips vs exact-float — BASELINE.md float fast record).
    dtype = jnp.bfloat16 if (is_int or (fast and fast_bf16)) \
        else jnp.float32

    blocks = [b.astype(dtype) for b in blocks]
    xs = [pl.x - he2 + pc for pl in packed.levels]

    def zeros(h, w):
        return jnp.zeros((2, 2, h, w), dtype)

    # Unified band assembly: each band is one width-axis concat of COLUMN
    # blocks and zero gap strips; a column is the union of its (row-disjoint)
    # stacked level blocks — a disjoint-support sum on the mats path (blocks
    # arrive pre-padded to the full band pitch, zero selector rows baked into
    # Sh by _poly_mats_cached) or a height-axis concat on the float path.
    # Legacy single-slot plans degenerate to exactly the historical
    # one-concat-per-shelf structure.
    rows = []
    for ys, pitch, lis in _band_rows(packed, he2, pr, PH):
        cols_of: Dict[int, List[Tuple[int, int]]] = {}
        for li, top, col in lis:
            cols_of.setdefault(col, []).append((li, top))
        items = []
        for col, entries in cols_of.items():
            x0 = min(xs[li] for li, _ in entries)
            wcol = max(xs[li] + blocks[li].shape[3]
                       for li, _ in entries) - x0

            def fit_w(li):
                b = blocks[li]
                dx = xs[li] - x0
                if dx or b.shape[3] < wcol:
                    b = jnp.pad(b, ((0, 0), (0, 0), (0, 0),
                                    (dx, wcol - dx - b.shape[3])))
                return b

            if use_mats:
                blk = fit_w(entries[0][0])
                assert blk.shape[2] == pitch, (blk.shape, pitch)
                for li, _top in entries[1:]:
                    blk = blk + fit_w(li)
            else:
                segs = []
                cur = 0
                for li, top in sorted(entries, key=lambda t: t[1]):
                    b = fit_w(li)
                    assert top >= cur, "stacked slots overlap (packer bug)"
                    if top > cur:
                        segs.append(zeros(top - cur, wcol))
                    segs.append(b)
                    cur = top + b.shape[2]
                assert cur <= pitch, (cur, pitch)
                if cur < pitch:
                    segs.append(zeros(pitch - cur, wcol))
                blk = (jnp.concatenate(segs, axis=-2)
                       if len(segs) > 1 else segs[0])
            items.append((x0, blk))
        items.sort(key=lambda t: t[0])
        cols = []
        cur_c = 0
        for c0, b in items:
            assert c0 >= cur_c, "column blocks overlap (packer gap violated)"
            if c0 > cur_c:
                cols.append(zeros(pitch, c0 - cur_c))
            cols.append(b)
            cur_c = c0 + b.shape[3]
        if cur_c < PW:
            cols.append(zeros(pitch, PW - cur_c))
        rows.append(jnp.concatenate(cols, axis=-1)
                    if len(cols) > 1 else cols[0])
    if not rows:
        return zeros(PH, PW)
    out = jnp.concatenate(rows, axis=-2) if len(rows) > 1 else rows[0]
    assert out.shape[-2:] == (PH, PW), (out.shape, PH, PW)
    return out


def _ext_pm_taps(R, size, halo):
    """Reflect-halo row duplication + phase-major regrouping of a tap
    vector (rows of the resize matrix in 2x2-polyphase emission order)."""
    if halo:
        R = np.concatenate([R[halo - 1::-1], R,
                            R[size - 1:size - halo - 1:-1]])
    return np.concatenate([R[halo % 2::2], R[(1 + halo) % 2::2]])


def _combine_block(G, frn, fcn, den_h, den_w, hq, wq):
    """Exact 4-corner bilinear combine + floor over the bf16-exact corner
    gathers: ``frn``/``fcn`` are integer frac NUMERATORS (phase-major) over
    the static denominators — ops.exact.combine4_exact computes the uint8
    truncation with no float ties (PARITY.md §1)."""
    from .ops.exact import combine4_exact

    FH = jnp.asarray(np.asarray(frn, np.float32)
                     .reshape(2, hq))[:, None, :, None]
    FW = jnp.asarray(np.asarray(fcn, np.float32)
                     .reshape(2, wq))[None, :, None, :]

    def g(a, b2):
        # per-slice upcast fuses into the combine (a full-G astype
        # would materialize an f32 copy)
        return G[a, b2].astype(jnp.float32)

    return combine4_exact(g(0, 0), g(0, 1), g(1, 0), g(1, 1),
                          FH, FW, den_h, den_w)


def _combine_block_dd(G, fr64h, fr64w, hq, wq):
    """Float-image 4-corner combine: the reference's f64 two-pass lerp
    (rows, then cols on the UNROUNDED row result, one f32 rounding at the
    end — tests/refshims/skimage float branch) evaluated in double-float
    pairs (ops.dd).  ``fr64h``/``fr64w`` are the phase-major FLOAT64 frac
    vectors; corners in ``G`` are exact f32 selections."""
    from .ops.dd import dd_round, lerp_dd

    def consts(v, reshape, bcast):
        v = np.asarray(v, np.float64).reshape(reshape)
        om = 1.0 - v
        out = []
        for a in (v, om):
            hi = a.astype(np.float32)
            lo = (a - hi).astype(np.float32)
            out += [jnp.asarray(hi)[bcast], jnp.asarray(lo)[bcast]]
        return out  # [fr_hi, fr_lo, omfr_hi, omfr_lo]

    fh, fl, oh_, ol = consts(fr64h, (2, hq),
                             (slice(None), None, slice(None), None))
    gh, gl, ph, pl_ = consts(fr64w, (2, wq),
                             (None, slice(None), None, slice(None)))

    def f32(a):
        return (a.astype(jnp.float32), jnp.zeros(a.shape, jnp.float32))

    rows = [lerp_dd(f32(G[0, b]), f32(G[1, b]), fh, fl, oh_, ol)
            for b in (0, 1)]
    return dd_round(lerp_dd(rows[0], rows[1], gh, gl, ph, pl_))


def _fast_float_bf16() -> bool:
    """WB_FAST_FLOAT=bf16 (resolved at detector-build/trace time, like
    WB_SERVING_MODE): fast-mode float frames quantize the CONTENT to bf16
    planes (single-pass selection einsums) instead of the default f32
    planes (exact HIGHEST selection).  Cheaper plane build + half the
    kernel fetch, at a much looser deviation bound (measured 20.7% scene
    box flips vs the f32-plane variant's uint8-level rate, BASELINE.md)."""
    import os
    return os.environ.get("WB_FAST_FLOAT", "f32") == "bf16"


def _combine_block_plain(G, fr64h, fr64w, hq, wq, out_dtype):
    """Fast-serving float combine: plain f32 two-pass lerp over the corner
    selections, emitted in the fast plane dtype.  No dd compensation, no
    floor — float content, relaxed contract (WB_SERVING_MODE=fast;
    deviation priced in BASELINE.md)."""
    FH = jnp.asarray(np.asarray(fr64h, np.float32)
                     .reshape(2, hq))[:, None, :, None]
    FW = jnp.asarray(np.asarray(fr64w, np.float32)
                     .reshape(2, wq))[None, :, None, :]

    def f32(a):
        return a.astype(jnp.float32)

    rows = [f32(G[0, b]) + FH * (f32(G[1, b]) - f32(G[0, b]))
            for b in (0, 1)]
    return (rows[0] + FW * (rows[1] - rows[0])).astype(out_dtype)


def _poly_geom_levels(packed: PackedPyramidPlan, halo, image_hw):
    """Static per-level resize geometry for the int 4-corner selector path:
    one dict per packed level with octave shape, phase-major EXACT taps
    (integer frac numerators ``frh``/``frw`` over denominators
    ``den_h``/``den_w``, ops.exact.axis_taps_exact), and the
    contraction-order choice.  Octave o's image shape is the o-fold
    floor-halving of ``image_hw`` (the u8-values octave pool chain)."""
    from .ops.exact import axis_taps_exact

    oct_hw = {}
    n_oct = max((pl.level.octave for pl in packed.levels), default=0) + 1
    h, w = image_hw
    for o in range(n_oct):
        oct_hw[o] = (h, w)
        h, w = h // 2, w // 2
    out = []
    for pl in packed.levels:
        lv = pl.level
        oh, ow = oct_hw[lv.octave]
        th = axis_taps_exact(oh, lv.height)
        tw = axis_taps_exact(ow, lv.width)
        i0h, frh = (_ext_pm_taps(t, lv.height, halo)
                    for t in (th[0], th[1].astype(np.float32)))
        i0w, frw = (_ext_pm_taps(t, lv.width, halo)
                    for t in (tw[0], tw[1].astype(np.float32)))
        hq = (lv.height + 2 * halo) // 2
        wq = (lv.width + 2 * halo) // 2
        row_first = (4 * hq * oh * ow + 16 * hq * wq * ow
                     <= 4 * wq * oh * ow + 16 * hq * wq * oh)
        out.append(dict(oct=lv.octave, oh=oh, ow=ow, i0h=i0h, frh=frh,
                        i0w=i0w, frw=frw, den_h=th[2], den_w=tw[2],
                        hq=hq, wq=wq, row_first=row_first))
    return out


def _poly_mats_cached(packed: PackedPyramidPlan, halo: int,
                      image_hw: Tuple[int, int]):
    banded = os.environ.get("WB_POLY_BANDED", "1") == "1"
    return _poly_mats_impl(packed, halo, image_hw, banded)


@functools.lru_cache(maxsize=16)
def _poly_mats_impl(packed: PackedPyramidPlan, halo: int,
                    image_hw: Tuple[int, int], banded: bool):
    """Device-resident 4-corner selector matrices, built ONCE per
    (plan, halo, image size) and fed to the serving program as jit
    ARGUMENTS.

    With ``banded`` (default), the selector matmuls are K-sliced: bilinear
    taps are monotone, so a 128-col output block of the grouped pass-1 (or
    a 64-row block of a level's pass-2) reads only a narrow aligned window
    of its source — the dense contraction mostly multiplies zeros.  Each
    block becomes its own matmul over [k0, k1); outputs concatenate on
    aligned boundaries.  Identical results (the sliced-away entries are
    exact zeros), ~2x fewer MXU FLOPs on a VGA pyramid.

    Closure-captured device arrays lower as MLIR literals (measured: a 4 MB
    array becomes 8 MB of program text — the compile-relay overflow
    build_resize_matrix exists to avoid), so serving callers must pass
    ``mats`` explicitly through their jit boundary and close only over the
    static ``spec``.

    Col-first levels' Sw selectors are concatenated per octave with each
    block's start 128-lane aligned (zero filler selector rows), making the
    per-level slices of the shared pass-1 product layout-aligned views
    instead of relayout copies.
    """
    from .ops.channels_pallas import plane_pad_geometry
    from .ops.warp import build_resize_matrix

    geom = _poly_geom_levels(packed, halo, image_hw)
    pgeom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    pr, _pc, PH, _PW = pgeom
    # shelf-band pitches: every level's Sh gets zero selector rows padding
    # its block to the FULL band pitch at its row offset (top rim rides the
    # first band; stacked levels carry their in-band offset), so the plane
    # assembly is aligned concatenation plus disjoint-support column sums
    he2 = halo // 2
    band = {}
    for ys, pitch, lis in _band_rows(packed, he2, pr, PH):
        for li, top, _col in lis:
            band[li] = (top, pitch)

    arrays = []
    spec_levels = []
    col_items: Dict[int, list] = {}

    def build(i0, fr, n_in, two_corner_shape):
        z = np.zeros_like(fr)
        A = jnp.stack([
            build_resize_matrix(i0, z, n_in),
            build_resize_matrix(np.minimum(i0 + 1, n_in - 1), z, n_in),
        ]).reshape(two_corner_shape)
        return A

    RB = 64  # pass-2 row-block (multiple of the bf16 sublane tile)

    for li, g in enumerate(geom):
        Sh = build(g["i0h"], g["frh"], g["oh"], (2, 2, g["hq"], g["oh"]))
        top, pitch = band[li]
        bot = pitch - top - g["hq"]
        assert bot >= 0, (li, band[li], g["hq"])
        if top or bot:
            Sh = jnp.pad(Sh, ((0, 0), (0, 0), (top, bot), (0, 0)))
        frh_p = np.pad(np.asarray(g["frh"]).reshape(2, g["hq"]),
                       ((0, 0), (top, bot))).reshape(-1)
        ent = dict(kind="row" if g["row_first"] else "col",
                   oct=g["oct"], frh=frh_p, frw=g["frw"], hq=pitch,
                   wq=g["wq"], den_h=g["den_h"], den_w=g["den_w"])
        if banded and not g["row_first"] and pitch > RB:
            # K-sliced pass-2: row block [r0, r1) of the pitched output
            # reads only source rows [k0, k1) (taps are monotone per
            # phase; zero filler rows constrain nothing)
            i0_pm = np.asarray(g["i0h"]).reshape(2, g["hq"])
            p2 = []
            for r0 in range(0, pitch, RB):
                r1 = min(r0 + RB, pitch)
                lo, hi = None, None
                for p in (0, 1):
                    a0 = max(r0 - top, 0)
                    a1 = min(r1 - top, g["hq"])
                    if a1 > a0:
                        seg = i0_pm[p, a0:a1]
                        lo = int(seg.min()) if lo is None \
                            else min(lo, int(seg.min()))
                        hi = int(seg.max()) if hi is None \
                            else max(hi, int(seg.max()))
                if lo is None:
                    lo, hi = 0, 0  # all-zero filler rows
                k0 = (lo // 8) * 8
                k1 = min(_round_up(hi + 2, 8), g["oh"])
                arrays.append(Sh[:, :, r0:r1, k0:k1])
                p2.append((len(arrays) - 1, r0, r1, k0, k1))
            ent["p2blocks"] = p2
        else:
            arrays.append(Sh)
            ent["sh"] = len(arrays) - 1
        if g["row_first"]:
            Sw = build(g["i0w"], g["frw"], g["ow"],
                       (2, 2, g["wq"], g["ow"]))
            arrays.append(Sw)
            ent["sw"] = len(arrays) - 1
        else:
            col_items.setdefault(g["oct"], []).append((li, ent, g))
        spec_levels.append(ent)

    groups = {}
    for octv, items in sorted(col_items.items()):
        cat_blocks = []
        src_lo: List[int] = []
        src_hi: List[int] = []
        off = 0
        ow = items[0][2]["ow"]
        for _li, ent, g in items:
            ent["off"] = off
            Sw = build(g["i0w"], g["frw"], ow, (2, 2, g["wq"], ow))
            pad = (-g["wq"]) % 128  # 128-lane-align the next block's start
            if pad:
                Sw = jnp.pad(Sw, ((0, 0), (0, 0), (0, pad), (0, 0)))
            cat_blocks.append(Sw)
            i0_pm = np.asarray(g["i0w"]).reshape(2, g["wq"])
            per_col_lo = i0_pm.min(axis=0)
            per_col_hi = i0_pm.max(axis=0)
            src_lo += list(per_col_lo) + [10 ** 9] * pad
            src_hi += list(per_col_hi) + [-1] * pad
            off += g["wq"] + pad
        Sw_cat = jnp.concatenate(cat_blocks, axis=2)
        C = Sw_cat.shape[2]
        if banded:
            blocks = []
            for c0 in range(0, C, 128):
                c1 = min(c0 + 128, C)
                lo = min(src_lo[c0:c1])
                hi = max(src_hi[c0:c1])
                if hi < 0:
                    lo, hi = 0, 0
                k0 = (min(lo, ow - 1) // 128) * 128
                k0 = min(k0, max(ow - 128, 0))
                k1 = min(max(_round_up(hi + 2, 128), k0 + 128), ow)
                arrays.append(Sw_cat[:, :, c0:c1, k0:k1])
                blocks.append((len(arrays) - 1, c0, c1, k0, k1))
            groups[octv] = dict(kind="banded", blocks=blocks)
        else:
            arrays.append(Sw_cat)
            groups[octv] = dict(kind="full", idx=len(arrays) - 1)

    spec = dict(levels=spec_levels, groups=groups, geom=pgeom)
    return tuple(arrays), spec


def _poly_level_blocks_mats(octaves, mats, spec):
    """Serving fast path of :func:`_poly_level_blocks`: consume the prebuilt
    device-resident selector matrices of :func:`_poly_mats_cached`.
    Bit-identical to the in-program build (same per-element dot products and
    lerp association; the group pads are zero selector rows)."""
    def f32(a):
        return a if a.dtype == jnp.float32 else a.astype(jnp.float32)

    blocks = [None] * len(spec["levels"])
    cols_cache = {}
    for octv, grp in spec["groups"].items():
        img = f32(octaves[octv])
        if grp["kind"] == "full":
            cols_cache[octv] = jnp.einsum(
                "hw,bqcw->bhqc", img, mats[grp["idx"]],
                preferred_element_type=jnp.bfloat16)
        else:
            # K-sliced pass-1: aligned source windows, aligned output concat
            parts = [
                jnp.einsum("hw,bqcw->bhqc", img[:, k0:k1], mats[ai],
                           preferred_element_type=jnp.bfloat16)
                for ai, _c0, _c1, k0, k1 in grp["blocks"]
            ]
            cols_cache[octv] = (jnp.concatenate(parts, axis=-1)
                                if len(parts) > 1 else parts[0])
    for li, ent in enumerate(spec["levels"]):
        if ent["kind"] == "row":
            rows = jnp.einsum("aprh,hw->aprw", mats[ent["sh"]],
                              f32(octaves[ent["oct"]]),
                              preferred_element_type=jnp.bfloat16)
            G = jnp.einsum("aprw,bqcw->abpqrc", rows, mats[ent["sw"]],
                           preferred_element_type=jnp.bfloat16)
        else:
            off = ent["off"]
            cols = cols_cache[ent["oct"]][:, :, :, off:off + ent["wq"]]
            if "p2blocks" in ent:
                parts = [
                    jnp.einsum("aprh,bhqc->abpqrc", mats[ai],
                               cols[:, k0:k1],
                               preferred_element_type=jnp.bfloat16)
                    for ai, _r0, _r1, k0, k1 in ent["p2blocks"]
                ]
                G = (jnp.concatenate(parts, axis=4)
                     if len(parts) > 1 else parts[0])
            else:
                G = jnp.einsum("aprh,bhqc->abpqrc", mats[ent["sh"]], cols,
                               preferred_element_type=jnp.bfloat16)
        blocks[li] = _combine_block(G, ent["frh"], ent["frw"],
                                    ent["den_h"], ent["den_w"],
                                    ent["hq"], ent["wq"])
    return blocks


def _poly_level_blocks(octaves, cf, packed: PackedPyramidPlan, halo,
                       is_int, mats=None, spec=None, fast=False,
                       fast_bf16=False):
    """Per-level resized blocks in (2, 2, hq, wq) phase layout, with ``halo``
    (even) reflect rows/cols baked into the resize matrices."""
    from .ops.warp import build_resize_matrix, resize_taps

    def _ext_pm(R, size):
        return _ext_pm_taps(R, size, halo)

    if mats is not None and spec is not None and is_int:
        return _poly_level_blocks_mats(octaves, mats, spec)

    blocks = [None] * len(packed.levels)
    col_groups: Dict[int, list] = {}
    for li, pl in enumerate(packed.levels):
        lv = pl.level
        oct_img = octaves[lv.octave]
        if oct_img.dtype != jnp.float32:
            oct_img = oct_img.astype(jnp.float32)
        oh, ow = oct_img.shape
        # matrices built on device from tiny tap vectors (embedding the
        # dense matrices as HLO constants makes the compile payload
        # O(sum of n_out*n_in) — 100+ MB for 4K pyramids); the _ext_pm
        # row transforms apply to the tap vectors directly
        if is_int:
            # exact integer taps (numerators over static denominators)
            from .ops.exact import axis_taps_exact
            th = axis_taps_exact(oh, lv.height)
            tw = axis_taps_exact(ow, lv.width)
            den_h, den_w = th[2], tw[2]
            i0h, frh = (_ext_pm(t, lv.height)
                        for t in (th[0], th[1].astype(np.float32)))
            i0w, frw = (_ext_pm(t, lv.width)
                        for t in (tw[0], tw[1].astype(np.float32)))
        else:
            from .ops.warp import resize_taps64
            i0h, frh = (
                _ext_pm(t, lv.height) for t in resize_taps64(oh, lv.height))
            i0w, frw = (
                _ext_pm(t, lv.width) for t in resize_taps64(ow, lv.width))
        hq = (lv.height + 2 * halo) // 2
        wq = (lv.width + 2 * halo) // 2
        if is_int:
            # 4-corner selector resize: integer-valued images are bf16-exact,
            # so the four corner gathers ride the MXU as 0/1 selector matmuls
            # at DEFAULT precision (one bf16 pass each, exact: one-hot rows
            # select uint8-exact values); the bilinear weights then apply
            # elementwise in f32 with EXACTLY ops.image._resize_bilinear_f32's
            # lerp association — bit-identical to the spec path, at 6 single
            # passes instead of the 12 bf16 passes of two HIGHEST matmuls.
            z = np.zeros_like(frh)
            zw = np.zeros_like(frw)
            # both selector pairs stacked along a leading free dim: each
            # level stays TWO dot ops (as with the tap matmuls), just
            # single-pass — the 4-corner structure rides free dims
            Sh = jnp.stack([
                build_resize_matrix(i0h, z, oh),
                build_resize_matrix(np.minimum(i0h + 1, oh - 1), z, oh),
            ]).reshape(2, 2, hq, oh)
            Sw = jnp.stack([
                build_resize_matrix(i0w, zw, ow),
                build_resize_matrix(np.minimum(i0w + 1, ow - 1), zw, ow),
            ]).reshape(2, 2, wq, ow)
            # rows are selected uint8-exact values: bf16 storage is exact
            # and halves the intermediate's traffic
            # contraction order picked per level by FLOP count: the second
            # pass contracts over the FIRST pass's source axis, so leading
            # with the larger source axis is cheaper (typically col-first
            # for landscape levels)
            row_first = (4 * hq * oh * ow + 16 * hq * wq * ow
                         <= 4 * wq * oh * ow + 16 * hq * wq * oh)
            if row_first:
                rows = jnp.einsum("aprh,hw->aprw", Sh, oct_img,
                                  preferred_element_type=jnp.bfloat16)
                # G holds selected integer-valued pixels: bf16-exact, half
                # the intermediate traffic; the lerp upcasts per slice
                G = jnp.einsum("aprw,bqcw->abpqrc", rows, Sw,
                               preferred_element_type=jnp.bfloat16)
                blocks[li] = _combine_block(G, frh, frw, den_h, den_w,
                                            hq, wq)
            else:
                # col-first levels of one octave contract the SAME octave
                # image over w: their Sw selectors concatenate along the
                # output-col axis into ONE pass-1 matmul per octave (each
                # output element's dot product is unchanged — bit-identical
                # to the per-level einsum, ~8x fewer MXU dispatches)
                col_groups.setdefault(lv.octave, []).append(
                    (li, Sh, Sw, frh, frw, den_h, den_w, hq, wq))
            continue
        # float images: 4-corner selection at HIGHEST f32 (one-hot rows
        # select exact f32 values; bf16 selection would truncate float
        # content), then the f64 two-pass lerp in double-float — bitwise
        # the reference's resize(...).astype(f32) chain (ops.dd; the
        # round-4 f32 triple-einsum lerp carried the 260-ULP bound).
        # Fast serving mode trades that contract for the uint8 serving
        # pipeline: the HIGHEST-precision selection stays (one-hot rows,
        # exact f32 values) but the lerp is plain f32 — no dd — and the
        # f32 planes feed the fused kernel's plain chains.  WB_FAST_FLOAT=
        # bf16 additionally quantizes the content: single default-
        # precision bf16 selection passes (the in-pass rounding IS the
        # quantization), bf16 planes, the exact uint8 kernel layout.
        z = np.zeros(len(i0h), np.float32)
        zw = np.zeros(len(i0w), np.float32)
        Sh = jnp.stack([
            build_resize_matrix(i0h, z, oh),
            build_resize_matrix(np.minimum(i0h + 1, oh - 1), z, oh),
        ]).reshape(2, 2, hq, oh)
        Sw = jnp.stack([
            build_resize_matrix(i0w, zw, ow),
            build_resize_matrix(np.minimum(i0w + 1, ow - 1), zw, ow),
        ]).reshape(2, 2, wq, ow)
        if fast and fast_bf16:
            rows = jnp.einsum("aprh,hw->aprw", Sh, oct_img,
                              preferred_element_type=jnp.bfloat16)
            G = jnp.einsum("aprw,bqcw->abpqrc", rows, Sw,
                           preferred_element_type=jnp.bfloat16)
            blocks[li] = _combine_block_plain(G, frh, frw, hq, wq,
                                              jnp.bfloat16)
            continue
        # fast f32 planes: HIGH (3-pass) selection instead of HIGHEST
        # (6-pass) — the ~2^-17 relative selection residue sits far below
        # the mode's own plain-projection + bf16-canvas deviation, at
        # half the MXU passes.  (A manual hi/lo split einsum pair is NOT
        # an option: --xla_allow_excess_precision folds the f32->bf16->
        # f32 round-trip that builds the hi term into a no-op, CLAUDE.md
        # landmine.)  The exact path keeps HIGHEST: its selection must
        # reproduce f32 values bitwise for the dd lerp.
        prec = jax.lax.Precision.HIGH if fast else jax.lax.Precision.HIGHEST
        rows = jnp.einsum("aprh,hw->aprw", Sh, oct_img,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        G = jnp.einsum("aprw,bqcw->abpqrc", rows, Sw,
                       preferred_element_type=jnp.float32,
                       precision=prec)
        if fast:
            blocks[li] = _combine_block_plain(G, frh, frw, hq, wq,
                                              jnp.float32)
        else:
            blocks[li] = _combine_block_dd(G, frh, frw, hq, wq)

    # grouped pass-1 for the col-first int levels, one matmul per octave
    for octv, items in col_groups.items():
        oct_img = octaves[octv]
        if oct_img.dtype != jnp.float32:
            oct_img = oct_img.astype(jnp.float32)
        Sw_cat = jnp.concatenate([it[2] for it in items], axis=2)
        cols_cat = jnp.einsum("hw,bqcw->bhqc", oct_img, Sw_cat,
                              preferred_element_type=jnp.bfloat16)
        off = 0
        for li, Sh, _Sw, frh, frw, den_h, den_w, hq, wq in items:
            cols = cols_cat[:, :, :, off:off + wq]
            off += wq
            G = jnp.einsum("aprh,bhqc->abpqrc", Sh, cols,
                           preferred_element_type=jnp.bfloat16)
            blocks[li] = _combine_block(G, frh, frw, den_h, den_w, hq, wq)
    return blocks


def _poly_channels(planes, smooth, cf, packed: PackedPyramidPlan,
                   padded: bool = False):
    """Polyphase planes (B?, 2, 2, Hc, Wc) -> pooled channel canvas
    (B?, C, Hc, Wc): fused Pallas kernel on TPU, XLA chain elsewhere."""
    from .channels import CanvasCtx

    interior = jnp.asarray(packed.smooth_interior_mask()) if smooth == 1 \
        else None
    if (cf.poly_kernel is not None and _use_channel_kernel()
            and (smooth == 0 or cf.poly_kernel_smooth)
            and planes.dtype != jnp.float32):
        # fused Pallas chain (channels + pool + smooth + mask in one pass);
        # handles the batch as a grid dimension.  f32 planes mark FLOAT
        # image content, which stays on the XLA chain: the kernel's
        # double-float (dd) prefilter/projection chains blow Mosaic's
        # scoped-VMEM stack at full-frame tiles (measured 24.13M/16M at
        # VGA; parallel/detect.py routes its float batches the same way)
        interpret = jax.default_backend() != "tpu"
        content_hw = (packed.canvas_h, packed.canvas_w) if padded else None
        kmask = cf.poly_kernel_mask(packed) \
            if cf.poly_kernel_mask is not None else interior
        return cf.poly_kernel(planes, kmask, smooth, interpret,
                              content_hw=content_hw)

    bmp = None
    if cf.boundary == "stencil_zero":
        bm = packed.stencil_border_mask()  # image-space (2Hc, 2Wc)
        Hc2, Wc2 = bm.shape
        bmp = jnp.asarray(bm.reshape(Hc2 // 2, 2, Wc2 // 2, 2)
                          .transpose(1, 3, 0, 2))
    ctx = CanvasCtx(reflect=lambda x: x, border_mask_poly=bmp)

    def one(p):
        chns = cf.canvas_fn_poly(p, ctx)  # pooled (C, Hc, Wc)
        if smooth == 1:
            from .ops.image import smooth_3x3
            chns = smooth_3x3(chns)
            if cf.boundary == "stencil_zero":
                # integer channels (uint8 in the canvas path) truncate the
                # /16 back — the numba-stencil uint8 assignment semantics
                # (/root/reference/waldboost/channels.py:78-90 applied to
                # fpga channels); values are nonneg so floor == trunc
                chns = jnp.floor(chns)
            zero = jnp.zeros((), chns.dtype)
            chns = jnp.where(interior[None], chns, zero)
        return chns

    return jax.vmap(one)(planes) if planes.ndim == 5 else one(planes)


def _channel_canvas_per_level(image, shrink, n_per_oct, smooth, cf,
                              packed: PackedPyramidPlan):
    """Fallback canvas assembly for channel functions without a canvas_fn:
    per-level channel tensors written into the canvas (exact but slower)."""
    opts = dict(shrink=shrink, n_per_oct=n_per_oct, smooth=smooth, channels=cf)
    levels = compute_pyramid(image, opts)
    canvas = jnp.zeros((cf.n_channels, packed.canvas_h, packed.canvas_w),
                       jnp.float32)
    for pl in packed.levels:
        chns, _ = levels[pl.plan_index]
        canvas = jax.lax.dynamic_update_slice(
            canvas, chns.astype(jnp.float32), (0, pl.y, pl.x))
    return canvas

