"""Detection model: cascade container + TPU detection pipeline.

Re-architecture of /root/reference/waldboost/model.py for TPU:

* The classifier is compiled to a structure-of-arrays :class:`~waldboost_tpu.ops.cascade.Cascade`
  (padded static shapes, cached; rebuilt lazily when stages are appended).
* ``detect`` packs *all* pyramid levels into one channel canvas (shelf
  packing with window-sized gaps) and evaluates the whole cascade in a single
  static-shaped masked pass — one XLA program per (image-shape, opts,
  cascade-shape) instead of one per pyramid level.  Windows in gaps/padding
  are pre-killed via a static mask, so the survivor set is identical to the
  reference's per-level loop (/root/reference/waldboost/model.py:149-179).
* ``predict`` / ``predict_on_image`` / ``scan_channels`` keep the reference
  API (used by training and sample mining).
* Serialization is wire-compatible protobuf (zlib level 9,
  /root/reference/waldboost/model.py:324-344) with a safe channel-function
  registry instead of ``eval`` (/root/reference/waldboost/model.py:23-29).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import boxes as bbx
from .boxes import Boxes
from .channels import (ChannelFunction, Level, _normalize_opts, compute_pyramid,
                       pyramid_plan, resolve_channel_function)
from .ops import cascade as casc_ops
from .ops.cascade import Cascade, cascade_predict_samples, cascade_response_grid
from .proto import model_pb2

__all__ = ["Model", "PackedPyramidPlan"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Packed pyramid plan (static, host-side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PackedLevel:
    level: Level
    plan_index: int  # index into the full pyramid plan / compute_pyramid output
    y: int           # canvas offset of this level's channel tensor
    x: int
    # stacked layouts: band/column ids of the guillotine structure the
    # plane assembly rides (band = horizontal strip of the canvas, column =
    # vertical stack of levels within a band).  -1 = legacy plan: bands are
    # derived by grouping on y and every level is its own column.
    band: int = -1
    col: int = -1


@dataclasses.dataclass(frozen=True)
class PackedPyramidPlan:
    """Shelf-packed layout of all pyramid levels into one (C, H, W) canvas.

    Gaps between levels are at least the window size (so windows never read
    across levels) *and* at least ``2*ceil(halo/shrink)`` (so the image-space
    reflect halos of neighbouring levels never overlap); the canvas carries a
    ``margin`` so edge levels have halo room too.
    """

    levels: Tuple[PackedLevel, ...]
    canvas_h: int
    canvas_w: int
    shrink: int = 1
    halo: int = 0     # image-space halo the layout was built for
    window: Tuple[int, int] = (0, 0)  # detector window the plan was built for
    # stacked layouts: (y, height) channel-space extent per band id (the
    # guillotine row partition); () = legacy plan, bands derived from level y
    bands: Tuple[Tuple[int, int], ...] = ()

    @staticmethod
    def build(plan: Sequence[Level], window: Tuple[int, int],
              lane_align: int = 128, halo: int = 0, shrink: int = 1
              ) -> "PackedPyramidPlan":
        m, n = window
        # round the reflect halo up to even: the 2x2-polyphase planes of a
        # level then share ONE plane-space placement across all four phases
        # (odd halos offset the phases by one plane row/col), which lets the
        # plane assembly be a handful of pad+concat ops instead of per-phase
        # scattered writes.  A wider reflect band only fills more gap pixels,
        # which no valid window ever reads — level-interior values are
        # unchanged.
        halo = halo + (halo % 2)
        halo_c = -(-halo // shrink)  # halo in channel-space units
        # levels only need their reflect-halo bands separated: window origins
        # in gaps are statically dead in valid_mask and valid windows never
        # leave their level (origins stop m/n before the level edge), so
        # window-sized gaps would only inflate the canvas — every downstream
        # kernel's cost scales with canvas area
        gap_y = max(2 * halo_c, 2)
        gap_x = max(2 * halo_c, 2)
        # one channel px of extra rim: halo bands must never touch the canvas
        # edge, where ops.image.gradients' reflect boundary and the polyphase
        # zero-fill _shift would disagree (a zero rim makes both read 0)
        margin = halo_c + (1 if halo > 0 else 0)
        # polyphase assembly alignment (shrink=2): choose the top margin so
        # every shelf band starts at an 8-aligned PLANE row (band row =
        # y - halo_c + PAD_R), and round shelf heights to 8 — the plane
        # assembly's row-axis concats then run at full DMA speed instead of
        # sublane-relayout speed.  Tile counts absorb the extra rows (the
        # width search accounts for them).
        align_y = 8 if shrink == 2 else 1
        margin_y = margin
        if align_y > 1:
            while (margin_y - halo_c) % align_y:
                margin_y += 1
        # Only levels that can host at least one window origin matter.
        usable = [(pi, lv) for pi, lv in enumerate(plan)
                  if lv.out_height > m and lv.out_width > n]
        if not usable:
            return PackedPyramidPlan(levels=(), canvas_h=max(m + 1, 8),
                                     canvas_w=max(n + 1, lane_align),
                                     shrink=shrink, halo=halo, window=(m, n))
        order = sorted(range(len(usable)), key=lambda i: -usable[i][1].out_height)

        def needs(i):
            lv = usable[i][1]
            return (_round_up(lv.out_height + gap_y, align_y),
                    lv.out_width + gap_x)

        def shelf_pack(canvas_w: int):
            # first-fit-decreasing-height shelves: each level backfills the
            # first open shelf with room (descending heights guarantee it
            # fits vertically), instead of next-fit's closed-shelf tails
            placed: Dict[int, PackedLevel] = {}
            shelves: List[List[int]] = []  # [y, height, cur_x, band_id]
            bands: List[Tuple[int, int]] = []
            for i in order:
                pi, lv = usable[i]
                h_need, w_need = needs(i)
                home = None
                for s in shelves:
                    if s[2] + w_need <= canvas_w - margin and h_need <= s[1]:
                        home = s
                        break
                if home is None:
                    y = (shelves[-1][0] + shelves[-1][1]) if shelves \
                        else margin_y
                    home = [y, h_need, margin, len(shelves)]
                    shelves.append(home)
                    bands.append((y, h_need))
                placed[i] = PackedLevel(level=lv, plan_index=pi, y=home[0],
                                        x=home[2], band=home[3], col=i)
                home[2] += w_need
            canvas_h = _round_up(shelves[-1][0] + shelves[-1][1] + margin, 8)
            return placed, canvas_h, tuple(bands)

        def stack_pack(canvas_w: int, pack_order, stack_bias: float):
            # guillotine shelves -> columns -> vertical stacks: a short
            # level may sit ON TOP of another inside a column instead of
            # forcing a full-height slot, recovering the height a tall
            # shelf wastes above its short members.  Slot starts stay
            # align_y-aligned (slot heights are rounded), which the plane
            # assembly and the fused shelf kernel's 8-aligned stores rely
            # on at shrink 2.
            placed: Dict[int, PackedLevel] = {}
            shelves = []  # dict(y, bh, cx, band, cols=[dict(x, w, cy, id)])
            bands: List[Tuple[int, int]] = []
            for i in pack_order:
                pi, lv = usable[i]
                h_need, w_need = needs(i)
                best_st = None
                best_co = None
                for s in shelves:
                    for c in s["cols"]:
                        rem = s["y"] + s["bh"] - c["cy"]
                        if rem >= h_need and c["w"] >= w_need:
                            key = ((c["w"] - w_need) * h_need * stack_bias
                                   + (rem - h_need) * w_need * 0.01)
                            if best_st is None or key < best_st[0]:
                                best_st = (key, s, c)
                    if (s["cx"] + w_need <= canvas_w - margin
                            and s["bh"] >= h_need):
                        key = (s["bh"] - h_need) * w_need
                        if best_co is None or key < best_co[0]:
                            best_co = (key, s)
                if best_st is not None and (best_co is None
                                            or best_st[0] <= best_co[0]):
                    _, s, c = best_st
                    y, x = c["cy"], c["x"]
                    c["cy"] += h_need
                elif best_co is not None:
                    _, s = best_co
                    c = {"x": s["cx"], "w": w_need, "cy": s["y"] + h_need,
                         "id": len(s["cols"])}
                    y, x = s["y"], s["cx"]
                    s["cols"].append(c)
                    s["cx"] += w_need
                else:
                    y0 = (shelves[-1]["y"] + shelves[-1]["bh"]) if shelves \
                        else margin_y
                    s = {"y": y0, "bh": h_need, "cx": margin,
                         "band": len(shelves), "cols": []}
                    c = {"x": margin, "w": w_need, "cy": y0 + h_need,
                         "id": 0}
                    y, x = y0, margin
                    s["cols"].append(c)
                    s["cx"] += w_need
                    shelves.append(s)
                    bands.append((y0, h_need))
                placed[i] = PackedLevel(level=lv, plan_index=pi, y=y, x=x,
                                        band=s["band"], col=c["id"])
            canvas_h = _round_up(shelves[-1]["y"] + shelves[-1]["bh"]
                                 + margin, 8)
            return placed, canvas_h, tuple(bands)

        # Try many canvas widths and keep the layout with the fewest
        # (128, 256) kernel tiles (tie-break on raw area) — the channel and
        # cascade kernels' cost is a step function of the tile grid, so
        # minimizing rounded-up tiles beats minimizing area.  For each
        # width, the FFDH shelf baseline competes against a deterministic
        # randomized family of stacked packings (seeded: plans must agree
        # across processes); the stacked winner is never worse than FFDH.
        import os as _os
        import random as _random
        trials = int(_os.environ.get("WB_PACK_TRIALS", "64"))
        min_w = _round_up(max(lv.out_width for _, lv in usable)
                          + gap_x + 2 * margin, lane_align)
        best = None
        for canvas_w in range(min_w, min_w + 16 * lane_align, lane_align):
            cands = [shelf_pack(canvas_w)]
            rng = _random.Random(canvas_w)
            for t in range(trials):
                pack_order = list(order)
                if t:
                    for _ in range(rng.randrange(0, 8)):
                        j = rng.randrange(len(pack_order) - 1)
                        pack_order[j], pack_order[j + 1] = \
                            pack_order[j + 1], pack_order[j]
                bias = rng.choice([0.3, 0.5, 1.0, 2.0, 5.0]) if t else 1.0
                cands.append(stack_pack(canvas_w, pack_order, bias))
            for placed, canvas_h, bands in cands:
                tiles = -(-canvas_h // 128) * -(-canvas_w // 256)
                area = canvas_h * canvas_w
                if best is None or (tiles, area) < best[0]:
                    best = ((tiles, area), canvas_w, canvas_h, placed, bands)
        _, canvas_w, canvas_h, placed, bands = best
        ordered = tuple(placed[i] for i in range(len(usable)))
        return PackedPyramidPlan(levels=ordered, canvas_h=canvas_h,
                                 canvas_w=canvas_w, shrink=shrink, halo=halo,
                                 window=(m, n), bands=bands)

    # -- static canvas masks / permutations (image space = channel space
    #    scaled by shrink) ------------------------------------------------
    def image_canvas_shape(self) -> Tuple[int, int]:
        return self.canvas_h * self.shrink, self.canvas_w * self.shrink

    def reflect_regions(self) -> Tuple[Tuple[int, int, int, int, int], ...]:
        """Image-space (y, x, h, w, halo) regions for halo reflection."""
        s = self.shrink
        return tuple((pl.y * s, pl.x * s, pl.level.height, pl.level.width,
                      self.halo) for pl in self.levels)

    def stencil_border_mask(self) -> np.ndarray:
        """Image-space bool mask: True strictly inside each level (1px ring
        excluded) — the numba-stencil zero-border convention."""
        H, W = self.image_canvas_shape()
        mask = np.zeros((H, W), bool)
        s = self.shrink
        for pl in self.levels:
            y, x = pl.y * s, pl.x * s
            h, w = pl.level.height, pl.level.width
            if h > 2 and w > 2:
                mask[y + 1:y + h - 1, x + 1:x + w - 1] = True
        return mask

    def smooth_interior_mask(self) -> np.ndarray:
        """Channel-space bool mask: True strictly inside each level's channel
        rect (1px ring excluded) — per-level smooth zero-border convention."""
        mask = np.zeros((self.canvas_h, self.canvas_w), bool)
        for pl in self.levels:
            h, w = pl.level.out_height, pl.level.out_width
            if h > 2 and w > 2:
                mask[pl.y + 1:pl.y + h - 1, pl.x + 1:pl.x + w - 1] = True
        return mask

    def level_interior_mask(self) -> np.ndarray:
        """Channel-space bool mask: True inside each level's channel rect."""
        mask = np.zeros((self.canvas_h, self.canvas_w), bool)
        for pl in self.levels:
            mask[pl.y:pl.y + pl.level.out_height,
                 pl.x:pl.x + pl.level.out_width] = True
        return mask

    def valid_mask(self, window: Tuple[int, int]) -> np.ndarray:
        """Static bool mask over canvas window origins: True where the origin
        belongs to some level's origin grid.  ``window`` may be LARGER than
        the plan's build window (heterogeneous multi-model serving shares one
        min-window plan): levels too small for it get an empty extent."""
        m, n = window
        gu, gv = max(self.canvas_h - m, 0), max(self.canvas_w - n, 0)
        mask = np.zeros((gu, gv), bool)
        for pl in self.levels:
            lv = pl.level
            mask[pl.y:pl.y + max(lv.out_height - m, 0),
                 pl.x:pl.x + max(lv.out_width - n, 0)] = True
        return mask

    def level_maps(self, window: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
        """(level_id, inv_scale) static maps over canvas origins; level_id is
        -1 outside any level."""
        m, n = window
        gu, gv = max(self.canvas_h - m, 0), max(self.canvas_w - n, 0)
        level_id = np.full((gu, gv), -1, np.int32)
        for i, pl in enumerate(self.levels):
            lv = pl.level
            level_id[pl.y:pl.y + max(lv.out_height - m, 0),
                     pl.x:pl.x + max(lv.out_width - n, 0)] = i
        return level_id, np.array([1.0 / pl.level.scale for pl in self.levels], np.float32)


@functools.lru_cache(maxsize=64)
def _packed_plan_cached(h: int, w: int, shrink: int, n_per_oct: int,
                        window: Tuple[int, int], halo: int = 0) -> PackedPyramidPlan:
    plan = pyramid_plan(h, w, shrink, n_per_oct)
    return PackedPyramidPlan.build(plan, window, halo=halo, shrink=shrink)


def _band_rows(packed: PackedPyramidPlan, he2: int, pr: int, PH: int):
    """The plane-row band partition every plane-assembly consumer shares.

    Returns ``[(ys, pitch, [(li, top, col), ...]), ...]`` sorted by band
    start: ``ys``/``pitch`` tile ``[0, PH)`` exactly (the first band absorbs
    the top rim, the last extends to PH), ``top`` is the level's row offset
    within its band, and ``col`` groups vertically stacked levels (levels in
    one column never overlap in rows; distinct columns never overlap in
    lanes).  Legacy plans (no explicit ``bands``) get one band per distinct
    ``pl.y`` with every level its own column and ``top`` folded into the
    first band's rim absorption — identical to the historical grouping.
    """
    if packed.bands:
        by_band: Dict[int, List[Tuple[int, int, int]]] = {}
        for li, pl in enumerate(packed.levels):
            y0 = packed.bands[pl.band][0]
            by_band.setdefault(pl.band, []).append(
                (li, pl.y - y0, pl.col if pl.col >= 0 else li))
        starts = sorted((packed.bands[bi][0] - he2, bi) for bi in by_band)
        groups = [(r0, by_band[bi]) for r0, bi in starts]
    else:
        by_y: Dict[int, List[Tuple[int, int, int]]] = {}
        for li, pl in enumerate(packed.levels):
            by_y.setdefault(pl.y - he2, []).append((li, 0, li))
        groups = sorted(by_y.items())
    out = []
    for si, (r0, lis) in enumerate(groups):
        nxt = groups[si + 1][0] + pr if si + 1 < len(groups) else PH
        rr = r0 + pr
        lead = rr if si == 0 and rr > 0 else 0
        ys = rr - lead
        pitch = nxt - ys
        out.append((ys, pitch,
                    [(li, top + (lead if si == 0 else 0), col)
                     for li, top, col in lis]))
    return out


# ---------------------------------------------------------------------------
# jitted device programs (module-level for cross-model cache sharing)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("window", "depth"))
def _grid_eval_jit(chns_chw, casc: Cascade, window, depth):
    return cascade_response_grid(chns_chw, casc, window, depth)


@functools.partial(jax.jit, static_argnames=("shape", "depth"))
def _predict_jit(x, casc: Cascade, shape, depth, valid=None):
    return cascade_predict_samples(x, casc, depth, valid=valid)


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


def _poly_pad_geometry(cf, packed: PackedPyramidPlan, smooth: int = 0):
    """Pre-pad geometry for the fused channel kernel (or None for XLA)."""
    if (cf.poly_kernel is not None and _use_channel_kernel()
            and (smooth == 0 or cf.poly_kernel_smooth)):
        from .ops.channels_pallas import plane_pad_geometry
        return plane_pad_geometry(packed.canvas_h, packed.canvas_w)
    return None


def _channel_canvas_poly(image, smooth, cf, packed: PackedPyramidPlan):
    """Polyphase canvas pipeline (shrink=2 fast path), single image."""
    geom = _poly_pad_geometry(cf, packed, smooth)
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
        geom = _poly_pad_geometry(cf, packed, smooth)
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
                 mats=None, spec=None):
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
    blocks = _poly_level_blocks(octaves, cf, packed, halo, is_int,
                                mats=mats if use_mats else None,
                                spec=spec if use_mats else None)
    # integer-valued canvases (uint8 images) are exact in bf16 (<= 255 needs
    # 8 mantissa bits): halving the plane bytes halves both the assembly
    # writes and the channel kernel's fetch traffic, with identical values
    # after the f32 upcast downstream
    dtype = jnp.bfloat16 if is_int else jnp.float32

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


def _poly_level_blocks(octaves, cf, packed: PackedPyramidPlan, halo,
                       is_int, mats=None, spec=None):
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
            i0h, frh = (
                _ext_pm(t, lv.height) for t in resize_taps(oh, lv.height))
            i0w, frw = (
                _ext_pm(t, lv.width) for t in resize_taps(ow, lv.width))
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
        Rh_pm = build_resize_matrix(i0h, frh, oh).reshape(2, hq, oh)
        Rw_pm = build_resize_matrix(i0w, frw, ow).reshape(2, wq, ow)
        # HIGHEST precision: the TPU default runs f32 matmuls in bf16,
        # whose ~0.5-unit error breaks the trunc-tie convention (floats
        # are not bf16-exact, so the selector scheme doesn't apply)
        blocks[li] = jnp.einsum("prh,hw,qcw->pqrc", Rh_pm, oct_img, Rw_pm,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

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
            and (smooth == 0 or cf.poly_kernel_smooth)):
        # fused Pallas chain (channels + pool + smooth + mask in one pass);
        # handles the batch as a grid dimension
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


def _packed_body(image, casc: Cascade, valid_mask, shrink, n_per_oct,
                 smooth, cf, window, depth, packed: PackedPyramidPlan):
    """Channels for every level -> packed canvas -> one cascade pass."""
    if cf.canvas_fn is not None:
        canvas = _channel_canvas_fast(image, shrink, smooth, cf, packed)
        canvas = canvas.astype(jnp.float32)
    else:
        canvas = _channel_canvas_per_level(image, shrink, n_per_oct, smooth,
                                           cf, packed)
    hs, alive, n_weak = cascade_response_grid(canvas, casc, window, depth,
                                              init_alive=valid_mask)
    return canvas, hs, alive, n_weak


@functools.partial(
    jax.jit,
    static_argnames=("shrink", "n_per_oct", "smooth", "cf", "packed"),
)
def _canvas_jit(image, shrink, n_per_oct, smooth, cf,
                packed: PackedPyramidPlan):
    """Stage 1: packed channel canvas (f32, CHW)."""
    if cf.canvas_fn is not None:
        canvas = _channel_canvas_fast(image, shrink, smooth, cf, packed)
        return canvas.astype(jnp.float32)
    return _channel_canvas_per_level(image, shrink, n_per_oct, smooth, cf,
                                     packed)


@functools.partial(jax.jit, static_argnames=("window", "depth"))
def _canvas_cascade_jit(canvas, casc: Cascade, valid_mask, window, depth):
    """Stage 2: masked lockstep cascade over the canvas.

    Kept as a separate XLA program from the canvas build: composing both into
    one program triggers pathological XLA scheduling on TPU (50ms vs 5ms, 20x
    compile time) — measured, not theoretical."""
    return cascade_response_grid(canvas, casc, window, depth,
                                 init_alive=valid_mask)


#: channel-pipeline engine: "pallas" (fused polyphase kernel), "xla", or
#: "auto" (pallas on TPU — on CPU the kernel would run in interpret mode,
#: which is slower than XLA's native fusion)
_CHANNEL_BACKEND = os.environ.get("WALDBOOST_TPU_CHANNELS", "auto")


def set_channel_backend(name: str) -> None:
    global _CHANNEL_BACKEND
    if name not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown channel backend {name!r}")
    _CHANNEL_BACKEND = name


def _use_channel_kernel() -> bool:
    if _CHANNEL_BACKEND == "auto":
        return jax.default_backend() == "tpu"
    return _CHANNEL_BACKEND == "pallas"


#: cascade engine: "xla" (lockstep masked scan), "pallas" (generic fused VMEM
#: kernel with tile-level SPRT exit; node tables are runtime arrays, so a
#: growing training cascade does not recompile), "static" (cascade-specialized
#: kernel — the whole frozen cascade is baked into the compiled program; the
#: fastest serving path), or "auto" (static/pallas on TPU, xla elsewhere).
_CASCADE_BACKEND = os.environ.get("WALDBOOST_TPU_CASCADE", "auto")


def set_cascade_backend(name: str) -> None:
    """Select the cascade evaluation engine
    ("xla" | "pallas" | "static" | "auto")."""
    global _CASCADE_BACKEND
    if name not in ("xla", "pallas", "static", "auto"):
        raise ValueError(f"unknown cascade backend {name!r}")
    _CASCADE_BACKEND = name


def _resolve_cascade_backend(serving: bool = False) -> str:
    """Backend for the mutable-cascade (training) path, or — with
    ``serving=True`` — for frozen-cascade detection, where the
    cascade-specialized kernel wins (recompiles per cascade content, which a
    per-stage-growing training model cannot afford)."""
    if _CASCADE_BACKEND == "auto":
        if jax.default_backend() == "tpu":
            return "static" if serving else "pallas"
        return "static" if serving else "xla"
    return _CASCADE_BACKEND


def _run_cascade(canvas, casc, valid_mask, window, meta):
    backend = _resolve_cascade_backend()
    if backend == "pallas":
        from .ops.cascade_pallas import cascade_response_grid_pallas
        interpret = jax.default_backend() != "tpu"
        return cascade_response_grid_pallas(canvas, casc, valid_mask, window,
                                            meta, interpret=interpret)
    return _canvas_cascade_jit(canvas, casc, valid_mask, window, meta)


def _run_cascade_serving(canvas, model: "Model", valid_mask, window):
    """Frozen-cascade detection dispatch (single image or batch canvas)."""
    backend = _resolve_cascade_backend(serving=True)
    if backend == "static":
        from .ops.cascade_static import cascade_response_grid_static
        sc = model._get_static_cascade()
        interpret = jax.default_backend() != "tpu"
        return cascade_response_grid_static(canvas, sc, valid_mask, window,
                                            interpret=interpret)
    casc, meta = model._get_cascade()
    if canvas.ndim == 4:
        f = lambda cv: _run_cascade(cv, casc, valid_mask, window, meta)
        hs, alive, nw = jax.vmap(f)(canvas) if backend == "xla" else \
            tuple(jnp.stack(x) for x in zip(*[
                _run_cascade(canvas[i], casc, valid_mask, window, meta)
                for i in range(canvas.shape[0])]))
        return hs, alive, nw
    return _run_cascade(canvas, casc, valid_mask, window, meta)


def _run_packed(image, casc, valid_mask, shrink, n_per_oct, smooth, cf,
                window, depth, packed):
    canvas = _canvas_jit(image, shrink, n_per_oct, smooth, cf, packed)
    hs, alive, n_weak = _run_cascade(canvas, casc, valid_mask, window, depth)
    return canvas, hs, alive, n_weak


def _run_packed_serving(image, model: "Model", valid_mask, shrink, n_per_oct,
                        smooth, cf, window, packed):
    canvas = _canvas_jit(image, shrink, n_per_oct, smooth, cf, packed)
    hs, alive, n_weak = _run_cascade_serving(canvas, model, valid_mask, window)
    return canvas, hs, alive, n_weak


def prewarm_next_mining_bucket(model: "Model", logger=None):
    """Background-compile the NEXT length-bucket's mining program (thin
    wrapper over :func:`prewarm_mining_buckets` with a one-bucket
    horizon)."""
    T = len(model) if model.classifier else 0
    if T == 0:
        return None
    return prewarm_mining_buckets(model, Model._stage_bucket(T) + 1,
                                  logger=logger)


def prewarm_mining_buckets(model: "Model", length: int, logger=None):
    """Compile EVERY length-bucket mining cascade program a training run to
    ``length`` stages will need, in ONE background thread, overlapped with
    training.

    The mining scan recompiles whenever the growing cascade crosses a
    length bucket (Model._stage_bucket) — seconds per crossing on the TPU
    compile relay, the dominant cost of the measured training loop
    (scripts/exp_r9_mining.py: the scan itself is ~36 ms/dispatch).  The
    jit cache keys on SHAPES and static metadata, not values, so padding
    the CURRENT stages to a future bucket compiles exactly the program that
    bucket's crossing will need.  The training loop knows its target
    ``length`` up front, so all crossings can start compiling at the first
    opportunity instead of one bucket ahead (stages outpace the compile
    relay: a fast loop reaches the next crossing in ~1 s while compiles
    take seconds — the one-ahead horizon lost the race and the crossing
    blocked anyway).  Buckets compile in crossing order so the nearest one
    is ready first.  Returns the started thread (or None when the geometry
    is unknown / everything is already warm).
    """
    geom = getattr(model, "_mining_geom", None)
    if geom is None or not model.classifier:
        return None
    T = len(model)
    cur = Model._stage_bucket(T)
    # the warmed set is keyed on the mining geometry: a geometry change
    # (new image shape / dtype) means every bucket's program is cold again
    geom_key = (tuple(geom[0]), str(geom[1]), tuple(geom[2]))
    prev_key, warmed = getattr(model, "_mining_warmed", (None, set()))
    if prev_key != geom_key:
        warmed = set()
    model._mining_warmed = (geom_key, warmed)
    targets = []
    b = cur
    end = Model._stage_bucket(max(int(length), 1))
    while b < end:
        b = Model._stage_bucket(b + 1)
        if b not in warmed:
            targets.append(b)
    if not targets:
        return None
    warmed.update(targets)
    # snapshot HOST-side state on this thread (model is mutated by the
    # stage loop); everything touching the device — including the cascade
    # table uploads in cascade_from_stages — runs in the background thread
    # (synchronous device puts through the axon tunnel measured ~10 s
    # total main-thread stall per training run, scripts/
    # profile_train_device.py r3c)
    stages = [w.to_stage_dict() for w in model.classifier]
    thetas = list(model.theta)
    canvas_shape, canvas_dtype, valid_shape = geom
    m, n, _ = model.shape
    backend = _resolve_cascade_backend()

    def compile_it():
        # REAL calls on dummy operands: .lower().compile() would populate
        # only the AOT path, not the jit dispatch cache the crossing hits.
        # Each executed program is one wasted ~36 ms scan; the compiles it
        # front-loads cost seconds apiece.
        for nxt in targets:
            try:
                casc, meta = casc_ops.cascade_from_stages(stages, thetas,
                                                          n_stages=nxt)
                cvs = jnp.zeros(canvas_shape, canvas_dtype)
                valid = jnp.zeros(valid_shape, bool)
                if backend == "pallas":
                    interpret = jax.default_backend() != "tpu"
                    out = _cascade_pallas_batch_jit(cvs, casc, valid, (m, n),
                                                    meta, interpret)
                else:
                    out = _cascade_xla_batch_jit(cvs, casc, valid, (m, n),
                                                 meta)
                jax.block_until_ready(out)
            except Exception as e:  # a cold crossing cache-miss, not an error
                # un-mark the bucket so the next prewarm call retries it
                # instead of leaving it falsely warm (the crossing would
                # silently pay the full blocking compile)
                warmed.discard(nxt)
                if logger is not None:
                    logger.debug("mining prewarm for bucket %d failed: %s",
                                 nxt, e)

    import threading
    t = threading.Thread(target=compile_it, daemon=True,
                         name=f"wb-prewarm-{targets[0]}")
    t.start()
    # track live prewarm threads on the model so training loops can join
    # them before returning: a daemon thread still inside an XLA call at
    # interpreter teardown aborts the process ("terminate called after
    # throwing ..." — observed after profile_train_device r3e)
    threads = [th for th in getattr(model, "_mining_prewarm_threads", [])
               if th.is_alive()]
    threads.append(t)
    model._mining_prewarm_threads = threads
    return t


def join_prewarm_threads(model, timeout: float = 300.0) -> None:
    """Wait for outstanding background mining-bucket compiles (a compile
    finishes in seconds; the timeout is a hung-relay escape hatch)."""
    for t in getattr(model, "_mining_prewarm_threads", []):
        t.join(timeout=timeout)
    model._mining_prewarm_threads = []


def detect_multi(models, image, response_scale=None):
    """Multi-model detection over ONE shared channel canvas.

    The packed channel canvas (the expensive pyramid program) is computed
    once; each model's cascade then scans the SAME device-resident canvas.
    Scores are scaled per model by ``response_scale`` and boxes carry a
    'label' field with the emitting model index — the device analog of
    /root/reference/waldboost/__init__.py:75-130 (one pyramid, K models).
    Models must share channel options (the reference's shared-pyramid loop
    implicitly assumes compatible channels too); window shapes may DIFFER —
    the canvas is planned from the elementwise-min window so every model's
    usable levels exist, and each model scans it with its own window grid
    and validity mask.
    """
    from .channels import _normalize_opts

    image = np.asarray(image)
    if image.ndim != 2:
        raise ValueError("Image must have 2 dimensions")
    model0 = models[0]
    key0 = _normalize_opts(model0.channel_opts)
    if not all(_normalize_opts(mm.channel_opts) == key0 for mm in models):
        raise ValueError("detect_multi needs models sharing channel options")
    if response_scale is None:
        response_scale = [1.0] * len(models)
    shrink, n_per_oct, smooth, cf = key0
    m_min = min(mm.shape[0] for mm in models)
    n_min = min(mm.shape[1] for mm in models)
    packed = _packed_plan_cached(image.shape[0], image.shape[1], shrink,
                                 n_per_oct, (m_min, n_min), halo=cf.halo)
    empty = lambda: bbx.empty_boxes(scores=np.empty(0, np.float32),
                                    label=np.empty(0, np.int64))
    if not packed.levels:
        return empty()
    canvas = _canvas_jit(jnp.asarray(image), shrink, n_per_oct, smooth, cf,
                         packed)  # ONCE for all models
    geom = {}  # per-window-shape valid mask + level maps
    out = []
    for kix, mm in enumerate(models):
        m, n, _ = mm.shape
        if (m, n) not in geom:
            level_id_map, inv_scales = packed.level_maps((m, n))
            geom[(m, n)] = (jnp.asarray(packed.valid_mask((m, n))),
                            level_id_map, inv_scales,
                            int((level_id_map >= 0).sum()))
        valid, level_id_map, inv_scales, n_valid = geom[(m, n)]
        casc, depth = mm._get_cascade()
        rs = cs = scores = None
        if casc.n_stages > TWO_PHASE_PREFIX:
            # same two-phase compaction as Model.detect: only the compacted
            # survivor set crosses the (slow) device->host link; exact
            # whenever phase-1 survivors fit the capacity
            gv = packed.canvas_w - n
            idx, H, aliveK, n_weak, count1 = _two_phase_jit(
                canvas, casc, valid, (m, n), depth,
                sc=mm._get_static_cascade())
            if int(count1) <= min(TWO_PHASE_CAPACITY, valid.size):
                mm._track_cost(int(n_weak), n_valid)
                sel = np.asarray(aliveK)
                idxs = np.asarray(idx)[sel]
                scores = np.asarray(H)[sel]
                rs, cs = idxs // gv, idxs % gv
        if rs is None:
            hs, alive, n_weak = _run_cascade_serving(canvas, mm, valid,
                                                     (m, n))
            mm._track_cost(int(n_weak), n_valid)
            alive_np = np.asarray(alive)
            rs, cs = np.nonzero(alive_np)
            scores = np.asarray(hs)[rs, cs] if rs.size \
                else np.empty(0, np.float32)
        b = mm._boxes_from_canvas_origins(rs, cs,
                                          scores * float(response_scale[kix]),
                                          packed, level_id_map, inv_scales)
        b.set_field("label", np.full(len(b), kix, dtype=np.int64))
        out.append(b)
    return bbx.concatenate(out, ["scores", "label"]) if out else empty()


#: lockstep stage-prefix length and survivor capacity of two-phase evaluation
TWO_PHASE_PREFIX = 12
TWO_PHASE_CAPACITY = 4096


@functools.partial(jax.jit, static_argnames=("window",))
def _gather_windows_jit(canvas, rs, cs, window):
    """(C, U, V) canvas + (K,) origins -> (K, m, n, C) crops (HWC samples)."""
    m, n = window

    def crop(r, c):
        sl = jax.lax.dynamic_slice(canvas, (0, r, c),
                                   (canvas.shape[0], m, n))
        return jnp.transpose(sl, (1, 2, 0))

    return jax.vmap(crop)(rs, cs)


@functools.partial(jax.jit, static_argnames=("window",))
def _gather_windows_batch_jit(canvas, bs, rs, cs, window):
    """(B, C, U, V) canvas + (K,) per-crop (image, row, col) -> (K, m, n, C)
    crops — one device gather for a whole mining batch."""
    m, n = window

    def crop(b, r, c):
        sl = jax.lax.dynamic_slice(canvas, (b, 0, r, c),
                                   (1, canvas.shape[1], m, n))
        return jnp.transpose(sl[0], (1, 2, 0))

    return jax.vmap(crop)(bs, rs, cs)


@functools.partial(jax.jit, static_argnames=("window",))
def _gather_windows_scores_batch_jit(canvas, hs, bs, rs, cs, window):
    """Crops AND their cascade scores in ONE gather dispatch (device->host
    transfers crawl through the tunnel; fetch only what labeling kept)."""
    crops = _gather_windows_batch_jit(canvas, bs, rs, cs, window)
    scores = jax.vmap(lambda b, r, c: hs[b, r, c])(bs, rs, cs)
    return crops, scores


@jax.jit
def _packbits_jit(alive):
    """(B, GU, GV) bool -> (B, GU, ceil(GV/8)) uint8 (bit k of byte j is
    column 8*j+k): an 8x smaller survivor map for the slow tunnel D2H."""
    B, GU, GV = alive.shape
    GVp = -(-GV // 8) * 8
    a = jnp.pad(alive.astype(jnp.uint8), ((0, 0), (0, 0), (0, GVp - GV)))
    a = a.reshape(B, GU, GVp // 8, 8)
    weights_ = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(a * weights_, axis=-1, dtype=jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("shrink", "n_per_oct", "smooth", "cf", "packed"))
def _canvas_batch_jit(images, shrink, n_per_oct, smooth, cf, packed):
    """Stage 1 for a mining batch: (B, H, W) -> (B, C, Hc, Wc) canvases as
    ONE program (eager tracing would dispatch every op through the
    tunnel)."""
    return _channel_canvas_batch(images, shrink, n_per_oct, smooth, cf,
                                 packed)


@functools.partial(
    jax.jit, static_argnames=("window", "depth", "interpret"))
def _cascade_pallas_batch_jit(cvs, casc, valid, window, depth, interpret):
    from .ops.cascade_pallas import cascade_response_grid_pallas

    outs = [cascade_response_grid_pallas(cvs[i], casc, valid, window, depth,
                                         interpret=interpret)
            for i in range(cvs.shape[0])]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]).sum())


@functools.partial(jax.jit, static_argnames=("window", "depth"))
def _cascade_xla_batch_jit(cvs, casc, valid, window, depth):
    f = lambda cv: cascade_response_grid(cv, casc, window, depth,
                                         init_alive=valid)
    hs, alive, nw = jax.vmap(f)(cvs)
    return hs, alive, nw.sum()


def _run_packed_batch(images, casc, valid_mask, shrink, n_per_oct, smooth,
                      cf, window, depth, packed):
    """(B, H, W) same-shape mining batch -> (canvas, hs, alive, n_weak),
    batched: the canvas build and the cascade run as ONE jitted program
    each instead of B dispatch round-trips (the training loop's mining is
    dispatch-latency-bound through the tunnel)."""
    canvas = _canvas_batch_jit(images, shrink, n_per_oct, smooth, cf,
                               packed)
    backend = _resolve_cascade_backend()
    if backend == "pallas":
        interpret = jax.default_backend() != "tpu"
        hs, alive, n_weak = _cascade_pallas_batch_jit(
            canvas, casc, valid_mask, window, depth, interpret)
    else:
        hs, alive, n_weak = _cascade_xla_batch_jit(canvas, casc, valid_mask,
                                                   window, depth)
    return canvas, hs, alive, n_weak


@functools.partial(jax.jit, static_argnames=("window", "meta", "k1",
                                             "capacity", "sc"))
def _two_phase_jit(canvas, casc: Cascade, valid_mask, window, meta,
                   k1: int = TWO_PHASE_PREFIX,
                   capacity: int = TWO_PHASE_CAPACITY, sc=None):
    """Two-phase cascade: lockstep stages [0:k1) over the whole grid, then
    top-``capacity`` survivor compaction and per-window gather evaluation of
    stages [k1:T).  Exact (monotone rejection) as long as phase-1 survivors
    fit in ``capacity`` — the returned count lets callers detect overflow and
    fall back to the dense path.

    Returns (idx, scores, alive, n_weak, phase1_count): flattened window-grid
    indices of candidate survivors, their final scores, survivor mask, the
    exact weak-eval counter, and the phase-1 survivor count.
    """
    from .ops.cascade import cascade_suffix_sparse, slice_cascade

    T = casc.n_stages
    k1 = min(k1, T)
    pre = slice_cascade(casc, 0, k1)
    backend = _resolve_cascade_backend(serving=True)
    if sc is not None and backend == "static":
        from .ops.cascade_static import cascade_response_grid_static
        interpret = jax.default_backend() != "tpu"
        hs1, alive1, nw1 = cascade_response_grid_static(
            canvas, sc, valid_mask, window, interpret=interpret,
            n_stages_cap=k1)
    elif backend in ("pallas", "static"):
        from .ops.cascade_pallas import cascade_response_grid_pallas
        interpret = jax.default_backend() != "tpu"
        hs1, alive1, nw1 = cascade_response_grid_pallas(
            canvas, pre, valid_mask, window, meta, interpret=interpret)
    else:
        hs1, alive1, nw1 = cascade_response_grid(canvas, pre, window, meta,
                                                 init_alive=valid_mask)
    flat = jnp.where(alive1, hs1, -jnp.inf).reshape(-1)
    cap = min(capacity, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, cap)
    aliveK = jnp.isfinite(scores)
    count1 = jnp.sum(alive1, dtype=jnp.int32)
    H, aliveK, nw2 = cascade_suffix_sparse(canvas, casc, window, meta,
                                           idx, scores, aliveK, k1)
    return idx, H, aliveK, nw1 + nw2, count1


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class Model:
    """Detection model: window shape + channel opts + soft cascade.

    API parity with /root/reference/waldboost/model.py:32 (``predict``,
    ``predict_on_image``, ``detect``, ``channels``, ``scan_channels``,
    ``get_boxes``, ``append``, ``save``/``load``, ``eval_cost``).
    """

    #: pad stage count to a multiple of this to stabilise jit cache keys
    #: while the model grows during training
    STAGE_PAD = 8

    def __init__(self, shape, channel_opts):
        self.shape = tuple(int(s) for s in shape)
        opts = dict(channel_opts)
        opts["channels"] = resolve_channel_function(opts["channels"])
        self.channel_opts = opts
        self.classifier: List = []
        self.theta: List[float] = []
        self._cascade: Optional[Cascade] = None
        self._cascade_depth = 0
        self._cascade_version = -1
        self._static_cascade = None
        self._static_version = -1
        self._version = 0
        self.reset()

    # -- stats ---------------------------------------------------------
    @property
    def eval_cost(self) -> float:
        """Average number of weak-classifier evaluations per scanned window
        (/root/reference/waldboost/model.py:69-89)."""
        return self.n_weak / self.n_loc if self.n_loc > 0 else 0

    def reset(self) -> None:
        self.n_loc = 0
        self.n_weak = 0
        #: worst-case counters (the reference's unfinished roadmap item
        #: "Keep worst case eval. cost", /root/reference/NOTES.md:70):
        #: highest per-scan average weak evals and number of scans tracked
        self.n_images = 0
        self.worst_eval_cost = 0.0
        #: accumulated per-stage survivor counts (see survivor_histogram)
        self.stage_survivors = None

    def _track_cost(self, n_weak: int, n_loc: int, images: int = 1) -> None:
        """Fold one scan's counters into the running totals AND the
        worst-case stats.  ``images`` > 1 marks a batched scan whose
        per-image breakdown is unavailable (the batch average is then one
        worst-case sample — a lower bound on the true per-image max)."""
        self.n_weak += n_weak
        self.n_loc += n_loc
        if n_loc > 0:
            self.n_images += images
            self.worst_eval_cost = max(self.worst_eval_cost, n_weak / n_loc)

    def cost_stats(self) -> dict:
        """Cascade-efficiency counters: running average, worst-case scan,
        and the accumulated per-stage survivor histogram (None until
        :meth:`survivor_histogram` has run)."""
        return {
            "eval_cost": self.eval_cost,
            "worst_eval_cost": self.worst_eval_cost,
            "n_images": self.n_images,
            "n_loc": self.n_loc,
            "n_weak": self.n_weak,
            "stage_survivors": (None if self.stage_survivors is None
                                else np.asarray(self.stage_survivors)),
        }

    def survivor_histogram(self, image) -> np.ndarray:
        """Per-stage survivor counts for one image: ``out[t]`` = windows
        still alive ENTERING stage ``t`` over the full packed pyramid.
        Accumulates into ``self.stage_survivors`` (reset on cascade
        growth).  A diagnostic pass over the XLA cascade backend; the
        serving kernels are untouched."""
        from .ops.cascade import cascade_survivor_counts

        image = np.asarray(image)
        if image.ndim != 2:
            raise ValueError("Image must have 2 dimensions")
        m, n, _ = self.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
        packed = _packed_plan_cached(image.shape[0], image.shape[1], shrink,
                                     n_per_oct, (m, n), halo=cf.halo)
        T = len(self)
        if not packed.levels or T == 0:
            return np.zeros(T, np.int64)
        valid = jnp.asarray(packed.valid_mask((m, n)))
        casc, depth = self._get_cascade()
        canvas = _canvas_jit(jnp.asarray(image), shrink, n_per_oct, smooth,
                             cf, packed)
        counts, n_weak = jax.jit(
            cascade_survivor_counts, static_argnums=(2, 3))(
                canvas, casc, (m, n), depth, init_alive=valid)
        # cascade tables are padded to the jit stage bucket (inactive
        # stages); the histogram reports the real stages only
        counts = np.asarray(counts).astype(np.int64)[:T]
        level_id_map, _ = packed.level_maps((m, n))
        self._track_cost(int(n_weak), int((level_id_map >= 0).sum()))
        if (self.stage_survivors is None
                or len(self.stage_survivors) != len(counts)):
            self.stage_survivors = np.zeros(len(counts), np.int64)
        self.stage_survivors += counts
        return counts

    # -- container protocol ---------------------------------------------
    def __getitem__(self, i):
        return self.classifier[i], self.theta[i]

    def __len__(self) -> int:
        return len(self.classifier)

    def __bool__(self) -> bool:
        return bool(self.classifier)

    def __iter__(self):
        yield from zip(self.classifier, self.theta)

    def append(self, weak, theta: float) -> None:
        self.classifier.append(weak)
        self.theta.append(float(theta))
        self._version += 1

    # -- cascade compilation ---------------------------------------------
    @staticmethod
    def _stage_bucket(T: int) -> int:
        """Length-bucket of a T-stage cascade: hybrid stage buckets, linear
        (xSTAGE_PAD) while small, geometric beyond 32 — a growing training
        cascade then recompiles its consumers O(log T) times instead of
        O(T/8) (each recompile of the mining/rescore programs costs seconds
        on the TPU compile relay); padded stages are dead (zero response,
        theta=-inf)."""
        T = max(T, 1)
        if T <= 32:
            return max(_round_up(T, Model.STAGE_PAD), Model.STAGE_PAD)
        return 1 << (T - 1).bit_length()

    def _get_cascade(self) -> Tuple[Cascade, int]:
        if self._cascade is None or self._cascade_version != self._version:
            stages = [w.to_stage_dict() for w in self.classifier]
            pad_T = self._stage_bucket(len(stages))
            casc, meta = casc_ops.cascade_from_stages(stages, self.theta, n_stages=pad_T)
            self._cascade = casc
            self._cascade_depth = meta  # CascadeMeta (hashable, jit-static)
            self._cascade_version = self._version
        return self._cascade, self._cascade_depth

    def _get_static_cascade(self):
        """Host-side hashable cascade for the cascade-specialized kernel
        (content-keyed, so identical cascades share one compiled kernel)."""
        if self._static_cascade is None or self._static_version != self._version:
            from .ops.cascade_static import static_cascade_from_model
            self._static_cascade = static_cascade_from_model(self)
            self._static_version = self._version
        return self._static_cascade

    # -- channels ---------------------------------------------------------
    def channels(self, image):
        """Iterator over the channel pyramid (HWC numpy per level)."""
        from .channels import channel_pyramid
        yield from channel_pyramid(image, self.channel_opts)

    def scan_channels(self, image):
        """Yield ``(chns, scale, (r, c, h))`` per level — the mining entry
        point (/root/reference/waldboost/model.py:105-134)."""
        for chns, scale in self.channels(image):
            yield chns, scale, self.predict_on_image(chns)

    # -- boxes --------------------------------------------------------------
    def get_boxes(self, r, c, scale) -> Boxes:
        """Window origins (r, c) at pyramid scale -> XYXY boxes in image space
        (/root/reference/waldboost/model.py:136-147)."""
        r = np.asarray(r)
        c = np.asarray(c)
        if r.size == 0:
            return Boxes(np.empty((0, 4), np.float32))
        m, n = self.shape[:2]
        x1 = c.reshape(-1, 1).astype(np.float32)
        y1 = r.reshape(-1, 1).astype(np.float32)
        rects = np.concatenate([x1, y1, x1 + n, y1 + m], axis=1)
        return Boxes(rects).normalized(scale=1.0 / scale)

    # -- inference ----------------------------------------------------------
    def predict(self, X) -> Tuple[np.ndarray, np.ndarray]:
        """Cascade scores for a batch of samples (N,)+shape.  Rejected samples
        get -inf (/root/reference/waldboost/model.py:181-214)."""
        X = np.asarray(X)
        n, *shape = X.shape
        assert tuple(shape) == tuple(self.shape), \
            f"Invalid shape of X. Expected {self.shape}, given {shape}"
        if not self.classifier:
            return np.zeros(n, np.float32), np.ones(n, bool)
        if n == 0:
            return np.zeros(0, np.float32), np.zeros(0, bool)
        casc, depth = self._get_cascade()
        # power-of-2 batch-size buckets, min 256 (pools grow/shrink every
        # stage — each padded size is a fresh XLA compile, seconds to
        # minutes each on the TPU compile relay; true O(log N) bucketing
        # keeps it to a handful per training run)
        pad = max(256, 1 << (n - 1).bit_length()) - n
        Xp = np.pad(X, ((0, pad),) + ((0, 0),) * (X.ndim - 1))
        valid = np.zeros(n + pad, bool)
        valid[:n] = True
        H, mask = _predict_jit(jnp.asarray(Xp), casc, tuple(self.shape),
                               depth, jnp.asarray(valid))
        return np.asarray(H)[:n], np.asarray(mask)[:n]

    def predict_on_image(self, X) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Evaluate the cascade on all window origins of an HWC channel image.
        Returns surviving ``(rs, cs, hs)`` (/root/reference/waldboost/model.py:216-259)."""
        X = np.asarray(X) if not isinstance(X, jax.Array) else X
        u, v, ch_image = X.shape
        m, n, ch_cls = self.shape
        assert ch_image == ch_cls, \
            f"Invalid number of channels. Expected {ch_cls} given {ch_image}."
        gu, gv = max(u - m, 0), max(v - n, 0)
        if gu == 0 or gv == 0:
            e = np.empty(0, np.int64)
            return e, e, np.empty(0, np.float32)
        if not self.classifier:
            self._track_cost(0, gu * gv)
            rs, cs = np.indices((gu, gv))
            return rs.flatten(), cs.flatten(), np.zeros(gu * gv, np.float32)
        casc, depth = self._get_cascade()
        chw = jnp.transpose(jnp.asarray(X), (2, 0, 1))
        hs, alive, n_weak = _grid_eval_jit(chw, casc, (m, n), depth)
        self._track_cost(int(n_weak), gu * gv)
        alive = np.asarray(alive)
        rs, cs = np.nonzero(alive)
        return rs, cs, np.asarray(hs)[rs, cs]

    def scan_packed(self, image):
        """Single-pass pyramid scan for sample mining.

        Runs the packed-canvas pipeline once and returns
        ``(canvas, packed_plan, rs, cs, hs)`` where ``rs``/``cs`` are
        *canvas* coordinates of surviving window origins and ``canvas`` is
        the (C, H, W) channel canvas as a DEVICE array holding every level's
        channels — crop windows with :meth:`gather_windows_device` (device
        gather + small transfer) instead of pulling the canvas to the host.
        Returns ``None`` when the image is too small for any level.  Updates
        eval-cost counters like ``predict_on_image`` does.
        """
        image = np.asarray(image)
        if image.ndim != 2:
            raise ValueError("Image must have 2 dimensions")
        m, n, _ = self.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
        packed = _packed_plan_cached(image.shape[0], image.shape[1], shrink,
                                     n_per_oct, (m, n), halo=cf.halo)
        if not packed.levels:
            return None
        valid = jnp.asarray(packed.valid_mask((m, n)))
        casc, depth = self._get_cascade()
        canvas, hs, alive, n_weak = _run_packed(
            jnp.asarray(image), casc, valid, shrink, n_per_oct, smooth, cf,
            (m, n), depth, packed)
        level_id_map, _ = packed.level_maps((m, n))
        self._track_cost(int(n_weak), int((level_id_map >= 0).sum()))
        alive_np = np.asarray(alive)
        rs, cs = np.nonzero(alive_np)
        scores = np.asarray(hs)[rs, cs] if rs.size else np.empty(0, np.float32)
        return canvas, packed, rs, cs, scores

    def scan_packed_batch(self, images, n_real: Optional[int] = None):
        """Batched :meth:`scan_packed`: scan B same-shape images with ONE
        canvas program and ONE cascade program (mining is dispatch-latency
        bound; per-image scans cost ~1 ms each through the tunnel).

        ``n_real``: number of leading images that are real (the rest are
        jit-bucket padding, skipped in outputs and eval-cost counters).
        Returns ``(canvas (B,C,H,W) device, hs (B,GU,GV) device, packed,
        [(rs, cs)] * n)`` or None when the image is too small for any
        level — survivor scores stay on device (fetch the kept ones via
        _gather_windows_scores_batch_jit)."""
        images = np.asarray(images)
        if images.ndim != 3:
            raise ValueError("images must be (B, H, W)")
        n_real = images.shape[0] if n_real is None else int(n_real)
        m, n, _ = self.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
        packed = _packed_plan_cached(images.shape[1], images.shape[2],
                                     shrink, n_per_oct, (m, n),
                                     halo=cf.halo)
        if not packed.levels:
            return None
        valid = jnp.asarray(packed.valid_mask((m, n)))
        casc, depth = self._get_cascade()
        canvas, hs, alive, n_weak = _run_packed_batch(
            jnp.asarray(images), casc, valid, shrink, n_per_oct, smooth,
            cf, (m, n), depth, packed)
        # remember the mining program geometry so the training loops can
        # prewarm the NEXT length-bucket's program in the background
        # (prewarm_next_mining_bucket) instead of stalling at the crossing
        self._mining_geom = (tuple(canvas.shape), canvas.dtype,
                             tuple(valid.shape))
        level_id_map, _ = packed.level_maps((m, n))
        # batch n_weak includes padding images; keep the counter a close
        # estimate by scaling (eval_cost is a diagnostic running average)
        self._track_cost(int(n_weak) * n_real // images.shape[0],
                         int((level_id_map >= 0).sum()) * n_real,
                         images=n_real)
        # transfer the survivor map BIT-PACKED (8x fewer bytes through the
        # tunnel); scores stay ON DEVICE — callers fetch them only for the
        # windows labeling kept, fused with the crop gather
        packed_alive = np.asarray(_packbits_jit(alive))
        gv = alive.shape[-1]
        bits = np.unpackbits(packed_alive, axis=-1,
                             bitorder="little")[:, :, :gv]
        per_image = []
        for i in range(n_real):
            rs, cs = np.nonzero(bits[i])
            per_image.append((rs, cs))
        return canvas, hs, packed, per_image

    def gather_windows_device(self, image_or_canvas, rs, cs,
                              is_canvas: bool = False) -> np.ndarray:
        """Crop (m, n, C) windows at canvas origins on device and transfer
        only the crops (vmapped dynamic_slice) — the training-mining path's
        replacement for pulling the whole channel canvas to the host."""
        m, n, _ = self.shape
        if is_canvas:
            canvas = image_or_canvas
        else:
            shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
            image = np.asarray(image_or_canvas)
            packed = _packed_plan_cached(image.shape[0], image.shape[1],
                                         shrink, n_per_oct, (m, n),
                                         halo=cf.halo)
            canvas = _canvas_jit(jnp.asarray(image), shrink, n_per_oct,
                                 smooth, cf, packed)
        rs = np.asarray(rs, np.int32)
        cs = np.asarray(cs, np.int32)
        k = rs.size
        if k == 0:
            return np.empty((0, m, n, canvas.shape[0]),
                            np.dtype(str(canvas.dtype)))
        # bucket the crop count so jit compiles O(log K) programs, not O(K)
        pad = max(64, 1 << (k - 1).bit_length()) - k
        rs_p = jnp.asarray(np.pad(rs, (0, pad)))
        cs_p = jnp.asarray(np.pad(cs, (0, pad)))
        crops = _gather_windows_jit(canvas, rs_p, cs_p, (m, n))
        return np.asarray(crops[:k])

    def detect(self, image) -> Boxes:
        """Detect objects: full pyramid + cascade in one packed device pass.
        Returns surviving window boxes with a 'scores' field (pre-NMS), the
        same set the reference's per-level loop produces
        (/root/reference/waldboost/model.py:149-179)."""
        image = np.asarray(image)
        if image.ndim != 2:
            raise ValueError("Image must have 2 dimensions")
        m, n, _ = self.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
        packed = _packed_plan_cached(image.shape[0], image.shape[1], shrink,
                                     n_per_oct, (m, n), halo=cf.halo)
        if not packed.levels:
            return bbx.empty_boxes(scores=np.empty(0, np.float32))
        valid = jnp.asarray(packed.valid_mask((m, n)))
        casc, depth = self._get_cascade()
        level_id_map, inv_scales = packed.level_maps((m, n))
        n_valid = int((level_id_map >= 0).sum())
        gv = packed.canvas_w - n

        # two-phase fast path: lockstep prefix + compacted suffix (exact as
        # long as phase-1 survivors fit the capacity; the count tells us)
        if casc.n_stages > TWO_PHASE_PREFIX:
            canvas = _canvas_jit(jnp.asarray(image), shrink, n_per_oct,
                                 smooth, cf, packed)
            idx, H, aliveK, n_weak, count1 = _two_phase_jit(
                canvas, casc, valid, (m, n), depth,
                sc=self._get_static_cascade())
            if int(count1) <= min(TWO_PHASE_CAPACITY, valid.size):
                self._track_cost(int(n_weak), n_valid)
                sel = np.asarray(aliveK)
                idx = np.asarray(idx)[sel]
                scores = np.asarray(H)[sel]
                rs, cs = idx // gv, idx % gv
                return self._boxes_from_canvas_origins(
                    rs, cs, scores, packed, level_id_map, inv_scales)
            # overflow: fall through to the dense path (n_weak discarded)

        _, hs, alive, n_weak = _run_packed_serving(
            jnp.asarray(image), self, valid, shrink, n_per_oct, smooth, cf,
            (m, n), packed)
        self._track_cost(int(n_weak), n_valid)
        alive_np = np.asarray(alive)
        rs, cs = np.nonzero(alive_np)
        scores = np.asarray(hs)[rs, cs] if rs.size else np.empty(0, np.float32)
        return self._boxes_from_canvas_origins(rs, cs, scores, packed,
                                               level_id_map, inv_scales)

    def _boxes_from_canvas_origins(self, rs, cs, scores, packed,
                                   level_id_map, inv_scales) -> Boxes:
        """Canvas window origins -> image-space boxes with scores."""
        if np.size(rs) == 0:
            return bbx.empty_boxes(scores=np.empty(0, np.float32))
        m, n, _ = self.shape
        lid = level_id_map[rs, cs]
        offs = np.array([(pl.y, pl.x) for pl in packed.levels], np.int64)
        local_r = rs - offs[lid, 0]
        local_c = cs - offs[lid, 1]
        x1 = local_c.astype(np.float32)
        y1 = local_r.astype(np.float32)
        rects = np.stack([x1, y1, x1 + n, y1 + m], axis=1)
        rects *= inv_scales[lid][:, None]
        out = Boxes(rects)
        out.set_field("scores", np.asarray(scores, np.float32))
        return out

    def detect_topk(self, image, k: int = 1024, nms_iou: Optional[float] = None) -> Boxes:
        """Detect with fully on-device extraction: the k highest-scoring
        surviving windows are mapped to image-space boxes on the device
        (single top_k + lookup, no dense host transfer), optionally followed
        by on-device NMS.  Use for throughput paths; ``detect`` returns the
        complete survivor set.
        """
        from .ops.nms import nms_device, topk_detections

        image = np.asarray(image)
        if image.ndim != 2:
            raise ValueError("Image must have 2 dimensions")
        m, n, _ = self.shape
        shrink, n_per_oct, smooth, cf = _normalize_opts(self.channel_opts)
        packed = _packed_plan_cached(image.shape[0], image.shape[1], shrink,
                                     n_per_oct, (m, n), halo=cf.halo)
        if not packed.levels:
            return bbx.empty_boxes(scores=np.empty(0, np.float32))
        valid = jnp.asarray(packed.valid_mask((m, n)))
        _, hs, alive, n_weak = _run_packed_serving(
            jnp.asarray(image), self, valid, shrink, n_per_oct, smooth, cf,
            (m, n), packed)
        level_id_map, inv_scales = packed.level_maps((m, n))
        self._track_cost(int(n_weak), int((level_id_map >= 0).sum()))
        offsets = np.array([(pl.y, pl.x) for pl in packed.levels], np.int32)
        rects, scores, valid_k = topk_detections(
            hs, alive, jnp.asarray(level_id_map), jnp.asarray(offsets),
            jnp.asarray(inv_scales), jnp.asarray([m, n]), k=int(k))
        if nms_iou is not None:
            keep = nms_device(rects, scores, valid_k, iou_threshold=float(nms_iou))
            valid_k = jnp.logical_and(valid_k, keep)
        rects = np.asarray(rects)
        scores = np.asarray(scores)
        sel = np.asarray(valid_k)
        out = Boxes(rects[sel])
        out.set_field("scores", scores[sel].astype(np.float32))
        return out

    # -- serialization -----------------------------------------------------
    def as_proto(self, proto) -> None:
        proto.Clear()
        proto.shape.extend(self.shape)
        proto.channel_opts.shrink = int(self.channel_opts["shrink"])
        proto.channel_opts.n_per_oct = int(self.channel_opts["n_per_oct"])
        proto.channel_opts.smooth = int(self.channel_opts["smooth"])
        proto.channel_opts.func = self.channel_opts["channels"].name
        for weak, theta in self:
            w_pb = proto.classifier.add()
            weak.as_proto(w_pb)
            proto.theta.append(theta)

    @staticmethod
    def from_proto(proto) -> "Model":
        from .training import DTree
        shape = tuple(proto.shape)
        channel_opts = {
            "shrink": proto.channel_opts.shrink,
            "n_per_oct": proto.channel_opts.n_per_oct,
            "smooth": proto.channel_opts.smooth,
            "channels": resolve_channel_function(proto.channel_opts.func),
        }
        M = Model(shape, channel_opts)
        for weak_proto, theta_proto in zip(proto.classifier, proto.theta):
            M.append(DTree.from_proto(weak_proto), theta_proto)
        return M

    def save(self, filename: str) -> None:
        proto = model_pb2.Model()
        self.as_proto(proto)
        data = zlib.compress(proto.SerializeToString(), 9)
        with open(filename, "wb") as f:
            f.write(data)

    @staticmethod
    def load(filename: str) -> "Model":
        with open(filename, "rb") as f:
            data = f.read()
        proto = model_pb2.Model()
        try:
            proto.ParseFromString(zlib.decompress(data))
        except Exception:
            raise ValueError(f"Cannot read model from {filename}")
        return Model.from_proto(proto)
