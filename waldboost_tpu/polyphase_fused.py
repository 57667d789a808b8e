"""Fused polyphase plane pipeline (Pallas shelf kernels).

Builds the selector/weight corner matrices and drives the piece-staged +
row-stripe-ring shelf kernel (:mod:`waldboost_tpu.ops.plane_pallas`) that
produces every pyramid level's bf16 planes in one launch per shelf.
Pass-1 emits FLAT corner-major (B, oh, 4C) bf16 (a 5D intermediate
relayouts ~90 us/img); integer row weights fold into the bf16 pass-2 lhs
matmul when den_h <= 256 (bf16-exact).  See CLAUDE.md round-7 notes.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .packing import PackedPyramidPlan, _band_rows, _round_up
from .polyphase import _poly_geom_levels

def _sel_corner_rows(i0_rows: np.ndarray, n_in: int, k0: int,
                     k1: int) -> np.ndarray:
    """One-hot 4-corner selector block from phase-major tap indices.

    ``i0_rows`` (2, R) int32 with -1 marking zero filler rows (shelf-pitch /
    lane pads) -> (2, 2, R, k1-k0) f32 where corner ``a`` of phase ``p`` row
    ``r`` selects source index ``min(i0+a, n_in-1)``, restricted to the
    window [k0, k1)."""
    _, R = i0_rows.shape
    out = np.zeros((2, 2, R, k1 - k0), np.float32)
    r = np.arange(R)
    for p in range(2):
        idx0 = i0_rows[p]
        valid = idx0 >= 0
        for a in (0, 1):
            idx = np.minimum(np.maximum(idx0, 0) + a, n_in - 1)
            sel = valid & (idx >= k0) & (idx < k1)
            out[a, p, r[sel], idx[sel] - k0] = 1.0
    return out


def _wgt_corner_rows(i0_rows: np.ndarray, fn_rows: np.ndarray, den: int,
                     n_in: int, k0: int, k1: int) -> np.ndarray:
    """Integer-WEIGHTED row-combine block: row (p, r) holds ``den - fnum``
    at index i0 and ``fnum`` at ``min(i0+1, n_in-1)`` (summed when they
    coincide).  With ``den <= 256`` the weights are bf16-exact and the bf16
    MXU dot computes the exact row numerator ``wr0*p0 + wr1*p1`` directly
    (products <= 256*255 exact in the f32 accumulator) — the kernel's
    elementwise row stage disappears and the lhs halves to 2 phase rows."""
    _, R = i0_rows.shape
    out = np.zeros((2, R, k1 - k0), np.float32)
    r = np.arange(R)
    for p in range(2):
        idx0 = i0_rows[p]
        fn = fn_rows[p]
        valid = idx0 >= 0
        for a, wgt in ((0, den - fn), (1, fn)):
            idx = np.minimum(np.maximum(idx0, 0) + a, n_in - 1)
            sel = valid & (idx >= k0) & (idx < k1)
            out[p, r[sel], idx[sel] - k0] += wgt[sel]
    return out


def _poly_fused_cached(packed: PackedPyramidPlan, halo: int,
                       image_hw: Tuple[int, int]):
    banded = os.environ.get("WB_POLY_BANDED", "1") == "1"
    return _poly_fused_impl(packed, halo, image_hw, banded)


@functools.lru_cache(maxsize=16)
def _poly_fused_impl(packed: PackedPyramidPlan, halo: int,
                     image_hw: Tuple[int, int], banded: bool):
    """Operands + static plans for the fused shelf pass-2 kernel
    (ops.plane_pallas.shelf_pass2_call).

    Pass-1 stays batched XLA einsums — EVERY level col-first, so each
    octave's selector blocks concatenate into per-octave matmuls whose
    product feeds the kernel — and pass-2 + lerp + shelf assembly run
    inside the kernel.  Returns ``(arrays, spec)``: ``arrays`` the device
    operands (pass-1 selector blocks, then one lhs/fh/fw stack per shelf),
    ``spec`` the static plan.  The canvas is bit-identical to the XLA mats
    path — same one-hot corner dot products and the same f32 lerp
    association (tests/test_polyphase.py pins this).

    Reference anchor: /root/reference/waldboost/channels.py:111-132 (the
    per-level bilinear resize this replaces)."""
    from .ops.channels_pallas import plane_pad_geometry
    from .ops.plane_pallas import LevelPlan, ShelfPlan

    geom = _poly_geom_levels(packed, halo, image_hw)
    pgeom = plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    pr, pc, PH, PW = pgeom
    he2 = halo // 2
    n_oct = max((g["oct"] for g in geom), default=-1) + 1

    # shelf bands (same partition as _poly_mats_impl: first band absorbs
    # the top rim, the last extends to PH — the pitches tile [0, PH))
    band = {}
    shelf_rows = []
    for ys, pitch, lis in _band_rows(packed, he2, pr, PH):
        for li, top, _col in lis:
            band[li] = (top, pitch)
        shelf_rows.append((ys, pitch, [li for li, _t, _c in lis]))

    arrays: List[jax.Array] = []

    # ---- pass-1: per-octave concatenated col selectors (every level
    # col-first; blocks 128-lane aligned so cbase slabs are aligned views)
    oct_levels: Dict[int, List[int]] = {}
    for li, g in enumerate(geom):
        oct_levels.setdefault(g["oct"], []).append(li)
    oct_list = tuple(sorted(oct_levels))
    oct_pos = {o: i for i, o in enumerate(oct_list)}
    groups: Dict[int, tuple] = {}
    cbase_of: Dict[int, int] = {}
    oct_rows: Dict[int, int] = {}
    blk_flat: Dict[tuple, int] = {}  # (octave, local 128-block) -> flat idx
    for octv in oct_list:
        ow = geom[oct_levels[octv][0]]["ow"]
        oct_rows[octv] = _round_up(geom[oct_levels[octv][0]]["oh"], 8)
        i0_cat = []
        for li in oct_levels[octv]:
            g = geom[li]
            cbase_of[li] = sum(x.shape[1] for x in i0_cat)
            i0 = np.asarray(g["i0w"]).reshape(2, g["wq"])
            pad = (-g["wq"]) % 128
            if pad:
                i0 = np.pad(i0, ((0, 0), (0, pad)), constant_values=-1)
            i0_cat.append(i0)
        i0_cat = np.concatenate(i0_cat, axis=1)
        C = i0_cat.shape[1]
        blocks = []
        for c0 in range(0, C, 128):
            i0_blk = i0_cat[:, c0:c0 + 128]
            valid = i0_blk[i0_blk >= 0]
            if banded:
                lo = int(valid.min()) if valid.size else 0
                hi = int(valid.max()) if valid.size else 0
                k0 = (min(lo, ow - 1) // 128) * 128
                k0 = min(k0, max(ow - 128, 0))
                k1 = min(max(_round_up(hi + 2, 128), k0 + 128), ow)
            else:
                k0, k1 = 0, ow
            # rows flattened (x, q, c)-major: the einsum's lane order within
            # a block is then the kernel's canonical corner-slab order, and
            # every pass-1 intermediate stays 3D — size-2 minor dims would
            # be PADDED to 8 sublanes by TPU layouts (a 5D (B,h,2,2,C)
            # intermediate cost ~90 us/img of relayout, measured)
            blkw = i0_blk.shape[1]
            arrays.append(jnp.asarray(
                _sel_corner_rows(i0_blk, ow, k0, k1)
                .reshape(4 * blkw, k1 - k0)))
            blk_flat[(octv, c0 // 128)] = len(blocks) + sum(
                len(groups[o]) for o in groups)
            blocks.append((len(arrays) - 1, k0, k1))
        groups[octv] = tuple(blocks)

    # ---- pass-2: per-shelf stacked lhs pieces + lerp weight stacks
    RB = 64  # kernel row-block (multiple of the bf16 sublane tile)
    shelves = []
    vmem_max = 0
    for ys, pitch, lis in shelf_rows:
        lhs_pieces: List[np.ndarray] = []
        fh_parts: List[np.ndarray] = []
        fw_rows: List[np.ndarray] = []
        levels = []
        row_off = 0
        fh_off = 0
        kmax = 0
        wmax = max(_round_up(geom[li]["wq"], 128) for li in lis)
        for slot, li in enumerate(lis):
            g = geom[li]
            top, pitch_l = band[li]
            assert pitch_l == pitch
            hq, wq, oh = g["hq"], g["wq"], g["oh"]
            oh8 = _round_up(oh, 8)
            i0_pad = np.pad(np.asarray(g["i0h"]).reshape(2, hq),
                            ((0, 0), (top, pitch - top - hq)),
                            constant_values=-1)
            # den_h <= 256: the integer row weights are bf16-exact, so they
            # ride the lhs matmul (exact products in the f32 accumulator) —
            # half the lhs rows / MXU flops and no elementwise row stage
            weighted = g["den_h"] <= 256
            fn_pad = np.pad(
                np.asarray(g["frh"]).reshape(2, hq).astype(np.int64),
                ((0, 0), (top, pitch - top - hq)))
            # pieces cover only the level's own (8-rounded) band rows —
            # stacked levels in one column then never store over each
            # other's rows (gap rows come from the stripe zero-fill).
            # Piece boundaries still land on the kernel's 64-row stripe
            # grid; a piece's static in-stripe store offset is r0 % 64.
            t0, t1 = top, min(top + _round_up(hq, 8), pitch)
            assert t0 % 8 == 0 and t1 % 8 == 0, (li, top, hq, pitch)
            pieces = []
            r0 = t0
            while r0 < t1:
                r1 = min(t1, (r0 // RB + 1) * RB)
                blk_idx = i0_pad[:, r0:r1]
                valid = blk_idx[blk_idx >= 0]
                if valid.size == 0:
                    r0 = r1
                    continue  # all-zero filler rows: band zero-fill covers
                if banded:
                    k0 = (int(valid.min()) // 8) * 8
                    k1 = min(_round_up(int(valid.max()) + 2, 8), oh8)
                else:
                    k0, k1 = 0, oh8
                rb = r1 - r0
                if weighted:
                    sel = _wgt_corner_rows(blk_idx, fn_pad[:, r0:r1],
                                           g["den_h"], oh, k0, k1)
                    nrow = 2 * rb
                else:
                    sel = _sel_corner_rows(blk_idx, oh, k0, k1)
                    nrow = 4 * rb
                lhs_pieces.append(sel.reshape(nrow, k1 - k0))
                pieces.append((row_off, rb, r0, k0, k1 - k0))
                row_off += nrow
                kmax = max(kmax, k1 - k0)
                r0 = r1
            frh_p = np.pad(np.asarray(g["frh"]).reshape(2, hq),
                           ((0, 0), (top, pitch - top - hq))).reshape(-1)
            fh_parts.append(frh_p.astype(np.float32))
            frw = np.asarray(g["frw"]).reshape(2, wq).astype(np.float32)
            fw_rows.append(np.pad(frw, ((0, 0), (0, wmax - wq))))
            xc = packed.levels[li].x - he2 + pc
            # the level's slab spans whole 128-col blocks of its octave's
            # selector concat (every level is 128-padded); record FLAT
            # block ids, remapped to shelf-local cols positions below
            b0 = cbase_of[li] // 128
            fblks = tuple(blk_flat[(g["oct"], b0 + j)]
                          for j in range(_round_up(wq, 128) // 128))
            levels.append((fblks, LevelPlan(
                (), oh8, _round_up(wq, 128), wq, xc, fh_off,
                2 * slot, pieces, den_h=g["den_h"], den_w=g["den_w"],
                row_weighted=weighted)))
            fh_off += 2 * pitch
        used = tuple(sorted({f for fblks, _ in levels for f in fblks}))
        local = {f: i for i, f in enumerate(used)}
        levels = [LevelPlan(tuple(local[f] for f in fblks), lv.oh,
                            lv.cwpad, lv.wq, lv.xc, lv.fh0, lv.fw0,
                            lv.pieces, den_h=lv.den_h, den_w=lv.den_w,
                            row_weighted=lv.row_weighted)
                  for fblks, lv in levels]
        lhs = np.zeros((max(_round_up(row_off, 8), 8), max(kmax, 128)),
                       np.float32)
        for (ro, _rb, _r0, _k0, kwp), piece in zip(
                (p for lv in levels for p in lv.pieces), lhs_pieces):
            lhs[ro:ro + piece.shape[0], :kwp] = piece
        fh = np.concatenate(fh_parts)[:, None]
        # lerp col weights at 8-row strides: row (2*slot+q)*8 is an aligned
        # (1, 128) sublane read in the kernel
        fw = np.zeros((16 * len(lis), wmax), np.float32)
        for slot in range(len(lis)):
            fw[(2 * slot) * 8] = fw_rows[slot][0]
            fw[(2 * slot + 1) * 8] = fw_rows[slot][1]
        arrays.append(jnp.asarray(lhs, dtype=jnp.bfloat16))
        lhs_i = len(arrays) - 1
        arrays.append(jnp.asarray(fh))
        fh_i = len(arrays) - 1
        arrays.append(jnp.asarray(fw))
        fw_i = len(arrays) - 1
        ohS = max(lv.oh for lv in levels)
        cwmax = max(lv.cwpad for lv in levels)
        plan = ShelfPlan(ys, pitch, ohS, cwmax, levels)
        shelves.append((lhs_i, fh_i, fw_i, plan, used))
        from .ops.plane_pallas import shelf_vmem_bytes
        vmem_max = max(vmem_max, shelf_vmem_bytes(
            plan, PW, lhs.size, fh.size, fw.size))

    # merged single-call variant: every shelf's level blks remapped to the
    # GLOBAL union of pass-1 block products (ops.plane_pallas.
    # multi_shelf_pass2_call); gated on ALL shelves' lhs/fh/fw fitting
    # VMEM together alongside the shared rings
    merged = None
    if shelves:
        from .ops.plane_pallas import multi_shelf_vmem_bytes
        used_all = tuple(sorted({f for *_ , used in shelves for f in used}))
        gpos = {f: i for i, f in enumerate(used_all)}
        plans_g = []
        arr_bytes = 0
        for lhs_i, fh_i, fw_i, plan, used in shelves:
            plans_g.append(ShelfPlan(
                plan.ys, plan.pitch, plan.ohS, plan.cwmax,
                [LevelPlan(tuple(gpos[used[b]] for b in lv.blks), lv.oh,
                           lv.cwpad, lv.wq, lv.xc, lv.fh0, lv.fw0,
                           lv.pieces, den_h=lv.den_h, den_w=lv.den_w,
                           row_weighted=lv.row_weighted)
                 for lv in plan.levels]))
            arr_bytes += (arrays[lhs_i].size * 2 + arrays[fh_i].size * 4
                          + arrays[fw_i].size * 4)
        if multi_shelf_vmem_bytes(plans_g, PW, arr_bytes) <= 14 * 2 ** 20:
            merged = (tuple(plans_g), used_all)

    spec = dict(geom=pgeom, n_oct=n_oct, oct_list=oct_list,
                oct_rows=oct_rows, groups=groups, shelves=tuple(shelves),
                vmem_bytes=vmem_max, merged=merged)
    return tuple(arrays), spec


def _poly_planes_fused(images, mats, spec, interpret: bool = False):
    """Batched polyphase planes via the fused shelf kernel: XLA pass-1
    einsums (per-octave, col-first, K-sliced) feed
    ops.plane_pallas.shelf_pass2_call per shelf, carrying the canvas
    through input/output aliasing.  Bit-identical to vmapped
    :func:`_poly_planes` over the mats path for integer images."""
    from .channels import _compute_octaves_f32
    from .ops.plane_pallas import shelf_pass2_call

    _pr, _pc, PH, PW = spec["geom"]
    octs = jax.vmap(
        lambda im: tuple(_compute_octaves_f32(im, spec["n_oct"])))(images)
    # raw per-block parts, flat-indexed in octave/block order (the order
    # _poly_fused_impl's blk_flat assigns): each is (B, oh8, 4*128) with
    # lanes (x, q, c)-flattened, consumed DIRECTLY by the kernel's slab
    # DMAs — no assembly concat between the einsum and the kernel
    parts_flat = []
    for octv in spec["oct_list"]:
        img = octs[octv]
        oh8 = spec["oct_rows"][octv]
        if img.shape[1] < oh8:
            # zero row pad: keeps every slab DMA 8-aligned; padded rows
            # emit exact zeros through the einsum
            img = jnp.pad(img, ((0, 0), (0, oh8 - img.shape[1]), (0, 0)))
        for ai, k0, k1 in spec["groups"][octv]:
            parts_flat.append(
                jnp.einsum("Bhw,kw->Bhk", img[:, :, k0:k1], mats[ai],
                           preferred_element_type=jnp.bfloat16))
    # WB_SHELF_MERGED=1: single-launch multi-shelf kernel.  Bitwise equal
    # (TPU-validated, scripts/exp_r5_fusedbisect.py) but measured ~2%
    # SLOWER on the VGA headline (1009/1021 vs 1035 MP/s): the merged
    # kernel serializes on ALL pass-1 cols, while the per-shelf chain lets
    # shelf k's kernel overlap later shelves' einsums — the 8 launch
    # drains it saves were already hidden under that overlap.
    merged = spec.get("merged")
    if merged is not None and os.environ.get("WB_SHELF_MERGED", "0") == "1":
        from .ops.plane_pallas import multi_shelf_pass2_call
        plans_g, used_g = merged
        shelf_arrays = tuple(mats[i] for s in spec["shelves"]
                             for i in s[:3])
        cols = tuple(parts_flat[f] for f in used_g)
        return multi_shelf_pass2_call(shelf_arrays, cols, plans_g, PH, PW,
                                      interpret=interpret)
    carry = None
    for lhs_i, fh_i, fw_i, plan, used in spec["shelves"]:
        cols = tuple(parts_flat[f] for f in used)
        carry = shelf_pass2_call(mats[lhs_i], mats[fh_i], mats[fw_i],
                                 cols, carry, plan, PH, PW,
                                 interpret=interpret)
    return carry


