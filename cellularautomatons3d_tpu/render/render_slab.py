"""Sliced fast path: z-slab DDA kernels + XLA composite for grids > 256³.

The fused kernel (render_fast.py) keeps the whole bit-packed volume in
VMEM — possible up to 256³ (2 MiB).  Beyond that (the reference renders up
to 1024³ on one GPU, main_pathtraced.js:274-277) the volume is decomposed
into z-slabs that each fit VMEM; every slab runs the same exact
coarse→fine DDA (shared traversal machinery, render_fast._make_traversal)
and XLA composites:

* primary pass: one kernel per slab returns (t, cell id) of the slab-local
  first hit; the global first hit is the min-t over slabs that found one —
  correct for any ray direction because cells in different slabs are
  disjoint.
* shading: Cook-Torrance BRDF in plain XLA, reusing the exact pipeline's
  `brdf.calculate_lighting_at` (which the fused kernel's in-register
  shading was validated against) — elementwise over 2M pixels, a
  negligible cost next to the sweeps.
* shadows: per-pixel shadow rays from the composited hit point run one
  occlusion kernel per slab; global occlusion = OR over slabs.  Soft
  shadows jitter the light target per sample exactly like the fused path.

Indirect lighting (multi-bounce GI) works at every grid size through the
same decomposition: neighbour cell states ride `cell_state_batch`
(in-kernel word fetches, ORed over bricks) and each level's occlusion
queries ride `shadow_occlusion_batch`, so slab/brick boundaries are
transparent to the GI math.  A temporally-amortized mode
(`indirect_bounce(slot=…)`, `direct_occlusion(jitter_k=…)`) evaluates one
rotating sample per frame for real-time use.

Slab extent: ≤ 8 MiB of packed words per slab (256 planes at 512³), in
multiples of 32 planes so the supercolumn grouping stays aligned.

Grids > 512 (the reference allows 1024, main_pathtraced.js:274-277)
additionally decompose along **x** into bricks of 8 packed words (256
cells — exactly one coarse x-block group): the fine-fetch where-chain
and the coarse-row lane budget both scale with the x extent, and at
1024³ a full-x traversal is compile- and runtime-prohibitive
(render_fast._make_traversal docstring).  Bricks partition the cells,
so the same min-t composite stays exact; each brick's coarse rows are
the matching x-group slice of the globally dilated rows (cross-chunk
carries included).  All bricks of one shape share one compiled kernel —
the z offset and x word offset ride in ``zrange[2:4]`` as runtime
scalars.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.occupancy import coarse_occupancy, dilate_occupancy
from .render_fast import (
    BH,
    BW,
    COT_HALF_FOV,
    LANE,
    P_CELLMUL,
    P_EMIS,
    P_EMISS,
    P_LIGHT,
    P_LMAG,
    P_LRAD,
    P_MATC,
    P_O,
    P_R00,
    P_REFL,
    P_ROUGH,
    P_ROW0,
    P_TIME,
    P_WIN,
    SUB,
    _make_traversal,
    _or_fold_scalar,
    _store_ray,
)

# Sliced/bricked kernels carry a full z-slab of a >256-cubed volume in
# VMEM (8.4 MiB at 512-cubed) on top of the tile refs; Mosaic's default
# 16 MiB scoped-vmem cap OOMs at 512-cubed (measured: 22.5 MiB needed),
# and the 4-slot cellstate kernel's unrolled plane loops need 69.6 MiB
# of (reused) scoped stack at 256³ (measured AOT error).  v5e has
# 128 MiB of VMEM and these kernels stream almost nothing, so a 100 MiB
# cap is safe headroom for every kernel shape up to 1024-cubed.
_SLAB_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

__all__ = ["raytrace_sliced", "MAX_SLICED_GRID", "slab_extent"]

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

MAX_SLICED_GRID = 1024  # reference UI ceiling (main_pathtraced.js:274-277)
X_BRICK_CELLS = 256     # brick x extent for n > 512 (= one coarse group)
_SLAB_BYTES = 8 * 2**20  # VMEM budget for one slab's packed words

# Cellstate-kernel tile sublanes (must divide SUB, ≥ 8): finer strips
# tighten the per-instance z-group bitmask (see _make_cellstate_kernel).
import os as _os

CS_SUB = int(_os.environ.get("CA3D_CS_SUB", "32"))
assert SUB % CS_SUB == 0 and CS_SUB >= 8


class SlabGroup(NamedTuple):
    """Equal-shape bricks, inputs stacked on a leading brick axis.

    The per-brick pallas launches of one shape run as a ``lax.scan`` over
    this axis: the kernel body is traced/compiled ONCE per shape instead
    of once per brick, which keeps the XLA program size constant in brick
    count (a 1024³ frame has 16 bricks; unrolled, its fused-frame program
    OOMed the compiler — ROADMAP "1024³ status")."""

    zext: int
    xw: int | None          # packed words per x-chunk (None = full-x)
    bricks: tuple           # (z0, zext, gi) triples, stack order
    vols: jax.Array         # u32 [S, zext, C, 128] packed brick layouts
    cols: jax.Array         # u32 [S, R, LANE] column occupancy rows
    c2s: jax.Array          # u32 [S, R2, LANE] supercolumn rows
    zrs: jax.Array          # i32 [S, 3|4] (zmin, zmax, z0[, x0w])


def _scan_bricks(group: SlabGroup, call, merge, init, extra=None,
                 carry_to_call=False, reverse=None):
    """Run ``call(vol2d, col, c2, zrange, extra_slice)`` for every brick
    of a group, folding results with ``merge(acc, outs)``.  Single-brick
    groups call directly (no scan machinery); larger groups scan so the
    kernel is traced once.

    ``carry_to_call``: also pass the running accumulator to ``call`` as
    the keyword ``acc`` — the cross-brick ray-progress carry (best-t /
    already-occluded masks) that lets later bricks deactivate finished
    rays instead of re-tracing every ray per brick.

    ``reverse``: optional traced bool — iterate the brick stack in
    reverse order (elementwise select between the stack and its flip;
    the copy is a few MB of HBM traffic, ~0.1 ms).  With the carry this
    orders bricks front-to-back for the dominant ray direction, which is
    what makes the carry actually deactivate rays early."""
    xs = (group.vols, group.cols, group.c2s, group.zrs)
    if extra is not None:
        xs = xs + (extra,)
    if group.vols.shape[0] == 1:
        kw = {"acc": init} if carry_to_call else {}
        return merge(init, call(*(x[0] for x in xs), **kw))
    if reverse is not None:
        xs = tuple(jnp.where(
            jnp.reshape(reverse, (1,) * a.ndim), jnp.flip(a, 0), a
        ) for a in xs)

    def body(acc, x):
        kw = {"acc": acc} if carry_to_call else {}
        return merge(acc, call(*x, **kw)), None

    acc, _ = jax.lax.scan(body, init, xs)
    return acc


def slab_extent(n: int, x_cells: int | None = None) -> int:
    """Planes per slab: ≤ 8 MiB of packed words, multiple of 32.
    ``x_cells`` restricts the budget to an x-brick of that extent."""
    y_pad = -(-n // LANE) * LANE
    plane_bytes = ((x_cells or n) // 32) * y_pad * 4
    ze = max(32, min(n, (_SLAB_BYTES // plane_bytes) // 32 * 32))
    return ze


def brick_layout(n: int, slab_planes: int | None = None,
                 x_chunk_cells: int | None = None):
    """Brick decomposition of an n³ volume for the sliced fast path.

    Returns (bricks, x_words): ``bricks`` is a list of (z0, zext, gi)
    with gi the x-group index (None = full-x slab, grids ≤ 512);
    ``x_words`` is the per-brick packed-word extent along x (None when
    unchunked).  Overrides exist for tests only.
    """
    x_cells = x_chunk_cells if x_chunk_cells is not None else (
        X_BRICK_CELLS if n > 512 else None
    )
    ze = slab_planes or slab_extent(n, x_cells)
    zs = [(z0, min(ze, n - z0)) for z0 in range(0, n, ze)]
    if x_cells is None or x_cells >= n:
        return [(z0, zext, None) for z0, zext in zs], None
    ng = -(-n // x_cells)
    return (
        [(z0, zext, gi) for z0, zext in zs for gi in range(ng)],
        x_cells // 32,
    )


_BRICK_SKIP = _os.environ.get("CA3D_BRICK_SKIP", "1") == "1"


def _brick_nonempty(zrange):
    """Scalar: the brick's occupancy z-range is non-inverted (any live
    cell).  Empty bricks contribute nothing to any pass — min-t, OR and
    state composites are all neutral for them — so their kernel launch
    is skipped with ``lax.cond`` (at 1024³ a center-seeded scene
    occupies 2-4 of 16 bricks; the other launches were pure fixed
    cost).  CA3D_BRICK_SKIP=0 disables the conds (perf attribution)."""
    if not _BRICK_SKIP:
        return jnp.bool_(True)
    return zrange[0] <= zrange[1]


def _brick_visible(cam, zrange, zext, xw, n):
    """Conservative frustum test of a brick's world AABB (primary pass
    only — occlusion rays run outside the view frustum).  Skips the
    brick iff ALL 8 corners lie outside one frustum plane in camera
    space (the standard conservative AABB-vs-frustum test; mixed-sign
    z corners stay 'maybe visible').  Exact for the composite: a
    culled brick can contain no primary hit, because every primary ray
    segment lies inside the frustum pyramid."""
    if not _BRICK_SKIP:
        return jnp.bool_(True)
    z0 = zrange[2].astype(_F32)
    if xw is not None:
        x0 = (zrange[3] * 32).astype(_F32)
        x1 = x0 + xw * 32
    else:
        x0, x1 = jnp.float32(0.0), jnp.float32(n)
    inv_n = 1.0 / n
    xs = jnp.stack([x0 * inv_n - 0.5, x1 * inv_n - 0.5])
    zs = jnp.stack([z0 * inv_n - 0.5, (z0 + zext) * inv_n - 0.5])
    ys = jnp.asarray([-0.5, 0.5], _F32)
    cx, cy, cz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    corners = jnp.stack(
        [cx.reshape(-1), cy.reshape(-1), cz.reshape(-1)], axis=-1
    )  # [8, 3] world
    o = cam[P_O : P_O + 3]
    rot = jnp.stack(
        [cam[P_R00 : P_R00 + 3], cam[P_R00 + 3 : P_R00 + 6],
         cam[P_R00 + 6 : P_R00 + 9]]
    )  # camera→world; camera space = rotᵀ · (p − o)
    pc = (corners - o) @ rot  # [8, 3] camera space (forward = −z)
    tan_y = 1.0 / COT_HALF_FOV
    tan_x = (cam[P_WIN] / cam[P_WIN + 1]) * tan_y
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    behind = jnp.all(z > 0.0)
    out_r = jnp.all(x + tan_x * z > 0.0)
    out_l = jnp.all(-x + tan_x * z > 0.0)
    out_t = jnp.all(y + tan_y * z > 0.0)
    out_b = jnp.all(-y + tan_y * z > 0.0)
    return ~(behind | out_r | out_l | out_t | out_b)


def _pixel_rays_kernel(cam, width, height):
    """Per-pixel camera ray inside a kernel (iotas + SMEM scalars)."""
    t = pl.program_id(0)
    nbx = (width + BW - 1) // BW
    bx = jnp.mod(t, nbx)
    by = t // nbx
    lane = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 1)
    sub = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 0)
    l = sub * LANE + lane
    px = bx * BW + jnp.mod(l, BW)
    py = by * BH + l // BW
    onscreen = (px < width) & (py < height)
    px = jnp.minimum(px, width - 1)
    py = jnp.minimum(py, height - 1)
    win_w = cam[P_WIN]
    win_h = cam[P_WIN + 1]
    ux = (px.astype(_F32) + 0.5) / win_w
    uy = 1.0 - (py.astype(_F32) + cam[P_ROW0] + 0.5) / win_h
    rx = (ux - 0.5) * (win_w / win_h)
    ry = uy - 0.5
    inv = jax.lax.rsqrt(rx * rx + ry * ry + 0.25 * COT_HALF_FOV * COT_HALF_FOV)
    rx, ry, rz = rx * inv, ry * inv, -0.5 * COT_HALF_FOV * inv
    dx = cam[P_R00 + 0] * rx + cam[P_R00 + 1] * ry + cam[P_R00 + 2] * rz
    dy = cam[P_R00 + 3] * rx + cam[P_R00 + 4] * ry + cam[P_R00 + 5] * rz
    dz = cam[P_R00 + 6] * rx + cam[P_R00 + 7] * ry + cam[P_R00 + 8] * rz
    return dx, dy, dz, onscreen


def _make_primary_kernel(n, zext, width, height, age_bits, x_words=None):
    """One kernel serves every brick of extent ``zext``: the brick's
    global z offset (and x word offset, when chunked) ride in
    ``zrange[2:4]`` as runtime scalars, so brick count costs zero extra
    Mosaic compiles."""
    sweep, _, _ = _make_traversal(n, zext, age_bits, x_words)
    inv_n = 1.0 / n
    half = 0.5

    # No mip1 prefilter in the sliced path either: a 512³ frame traces
    # ~2·nc·8 pl.when regions per slab with it, which overflowed XLA's
    # pass stack on the interpret-mode differential tests.  The fused
    # ≤ 256³ kernel (the north-star path) keeps the prefilter.
    def kernel(cam, zrange, vol, coarse, coarse2, *rest):
        rest = list(rest)
        ages = rest.pop(0) if age_bits else None
        best = rest.pop(0)  # running min-t over earlier bricks (carry)
        out_t, out_idx = rest[:2]
        rest = rest[2:]
        out_age = rest.pop(0) if age_bits else None
        (f_a, t_a, hx_a, hy_a, hz_a,
         r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1,
         r_flags) = rest[:14]
        rest = rest[14:]
        age_ref = rest.pop(0) if age_bits else None
        alive_ref = rest.pop(0)  # (1,) i32 SMEM: sticky any-alive scalar
        rayrefs = (r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags)

        dx, dy, dz, onscreen = _pixel_rays_kernel(cam, width, height)
        ox = jnp.full((SUB, LANE), cam[P_O + 0], _F32)
        oy = jnp.full((SUB, LANE), cam[P_O + 1], _F32)
        oz = jnp.full((SUB, LANE), cam[P_O + 2], _F32)

        def slab(o, d):
            invd = 1.0 / d
            t1 = (-half - o) * invd
            t2 = (half - o) * invd
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        nx_, fx_ = slab(ox, dx)
        ny_, fy_ = slab(oy, dy)
        nz_, fz_ = slab(oz, dz)
        tn = jnp.maximum(jnp.maximum(nx_, ny_), nz_)
        # Cross-brick ray-progress carry: a hit from an earlier brick at
        # t = best bounds this brick's search window — any hit found here
        # at t ≥ best would lose the strict `<` min-t merge anyway, so
        # clamping t_end to it is exact (ties between distinct cells are
        # discarded by the merge in both orderings).  With front-to-back
        # brick order (see raytrace_sliced's `reverse`), rays latched by
        # earlier bricks go fully inactive and whole tiles skip their
        # direction passes at the `pass_possible` fold.
        tf = jnp.minimum(jnp.minimum(jnp.minimum(fx_, fy_), fz_), best[:])
        active = (tn <= tf) & (tf >= 0.0) & onscreen
        t_start = jnp.maximum(tn, 0.0)

        cell_half = inv_n * cam[P_CELLMUL] * 0.5
        if age_ref is not None:
            age_ref[:] = jnp.full((SUB, LANE), 1, _I32)
        _store_ray(rayrefs, ox, oy, oz, dx, dy, dz, t_start, tf, active)
        found, t_hit, hx, hy, hz = sweep(
            vol, coarse, coarse2, zrange, (f_a, t_a, hx_a, hy_a, hz_a),
            rayrefs, cell_half, None, True, ages=ages, age_ref=age_ref,
            scalar_origin=(cam[P_O + 0], cam[P_O + 1], cam[P_O + 2]),
            alive_ref=alive_ref,
        )
        out_t[:] = t_hit
        out_idx[:] = jnp.where(
            found, hx + hy * n + hz * n * n, jnp.full((SUB, LANE), -1, _I32)
        )
        if out_age is not None:
            out_age[:] = age_ref[:]

    return kernel


def _make_shadow_kernel_sweep(n, zext, x_words=None):
    """Single-query occlusion sweep: one kernel instance per (query,
    screen-tile) pair, running the fused sweep machinery
    (`_make_traversal`) end to end — group/column OR-fold gates, ray
    state in VMEM refs, componentwise hit-cell exclusion (out-of-range
    excluded coords can never equal an in-range probe coord, so the
    reference's clamp quirk needs no sentinel here).

    This is the round-3 shadow kernel, restored as the ``nq == 1`` path:
    the multi-query kernel's amortization (one traversal serving ≤4
    queries per tile) only pays when there ARE multiple queries — for
    plain hard-shadow frames (one query) its per-query unrolled probe
    geometry is pure overhead, and the round-4 rewrite routing nq=1
    through it regressed the 512³ sliced frame 58.3 → 72.3 ms.

    No mip1 prefilter here: occlusion launches are BATCHED (soft
    shadows, GI slots) and the prefilter doubles each sweep's traced
    graph, which pushed the two-bounce XLA program past reasonable
    compile bounds.
    """
    sweep, _, _ = _make_traversal(n, zext, 0, x_words)
    inv_n = 1.0 / n

    def kernel(cam, zrange, sx, sy, sz, dx, dy, dz, t1, exx, exy, exz, act,
               occ_prev, vol, coarse, coarse2, out_occ,
               f_b, t_b, hx_b, hy_b, hz_b,
               r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags,
               alive_ref):
        rayrefs = (r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags)
        cell_half = inv_n * cam[P_CELLMUL] * 0.5
        # Cross-brick carry: rays an earlier brick already occluded are
        # inactive here (the OR-composite makes any further hit
        # redundant) — fully-resolved tiles then skip both direction
        # passes at the sweep's pass_possible fold.
        _store_ray(
            rayrefs, sx[:], sy[:], sz[:], dx[:], dy[:], dz[:],
            jnp.zeros((SUB, LANE), _F32), t1[:],
            (act[:] == 1) & (occ_prev[:] == 0),
        )
        occluded, _, _, _, _ = sweep(
            vol, coarse, coarse2, zrange, (f_b, t_b, hx_b, hy_b, hz_b),
            rayrefs, cell_half, (exx, exy, exz), False, alive_ref=alive_ref,
        )
        out_occ[:] = occluded.astype(_I32)

    return kernel


def _make_shadow_kernel(n, zext, nq=1, x_words=None):
    """Multi-query occlusion sweep: ONE kernel instance per screen tile
    serves all ``nq`` shadow-ray queries of that tile's pixels.

    This is the round-3 cellstate trick (`_make_cellstate_kernel`)
    applied to the occlusion sweeps, which dominated the full-quality GI
    frame (~8 secondary sweeps × ~4.1 ms, each running the complete
    coarse→fine traversal machinery independently).  Shared across
    queries per tile:

    * the fixed traversal machinery — group/column scalar gates, OR-fold
      reductions and `pl.when` regions run ONCE per tile instead of once
      per query (the ablated no-sweep floor put ~3.4 ms/sweep on exactly
      this machinery): GI-slot and soft-shadow rays of one pixel all run
      from ~the hit surface toward ~the light, so their column sets
      nearly coincide and one traversal serves the batch;
    * the coarse/supercolumn row broadcasts of the column gates.

    Per-query state (origin, direction, t-range, exclusion id, found)
    lives in the stacked input/scratch blocks — query q owns sublane
    rows [q·SUB, (q+1)·SUB).  A column executes when ANY query's probes
    flag it; per-query ``seg_ok`` masks keep exactness unchanged.
    Exclusion uses the packed-id form with a -1 sentinel for
    out-of-range excluded coords (the reference's clamp quirk can yield
    x == n, which would otherwise alias the packed id of a REAL cell):
    see shadow_occlusion_batch's exid packing.
    """
    _, fetch_one, _ = _make_traversal(n, zext, 0, x_words)
    w_words = n // 32
    chunk_words = w_words if x_words is None else x_words
    chunked = chunk_words < w_words
    nbk = n // 8
    ncy = n // 8
    nc = zext // 8
    inv_n = 1.0 / n
    half = 0.5
    GROUP = 4

    from .render_fast import _bcast_row, _fetch_coarse_bit_impl

    def kernel(cam, zrange, sx, sy, sz, dx, dy, dz, t1, exid, act,
               occ_prev, vol, coarse, coarse2, out_occ, found_ref):
        cell_half = inv_n * cam[P_CELLMUL] * 0.5
        z0 = zrange[2]
        z0f = z0.astype(_F32)
        if chunked:
            x0w = zrange[3]
            x0b = x0w * 4
        else:
            x0w = x0b = None

        def fetch_coarse(row_b, bxc, byc, valid):
            if x0b is None:
                return _fetch_coarse_bit_impl(row_b, bxc, byc, valid, nbk, ncy)
            bxl = jnp.clip(bxc - x0b, 0, chunk_words * 4 - 1)
            byl = jnp.clip(byc, 0, ncy - 1)
            g = jnp.take_along_axis(row_b, byl, axis=1)
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(g, bxl.astype(_U32)), _U32(1)
            )
            return (bit.astype(_I32) == 1) & valid

        def load_q(q):
            """Query q's ray, re-read from the input refs (fresh loads in
            every conditional region — the sweep's no-spill discipline).

            Two steepness flags, matching the fused sweep's convention
            (render_fast.py:201-202): the 3-point supercolumn probe on the
            one-block-dilated coarse2 is conservative-exact only for
            |dxy/dz| <= 1 (render_fast.py:1465-1468), so ``steep_super``
            (threshold 1, ray[9]) must force supercolumn descent; the
            x-dilated per-column probe is exact to |dxy/dz| <= 2, so
            ``steep_col`` (threshold 2, ray[8]) gates the column level.
            Using the threshold-2 flag at the supercolumn level let
            shadow/GI rays with slope in (1, 2] skip occupied column
            groups — light leaks (round-4 advisor finding)."""
            sl = slice(q * SUB, (q + 1) * SUB)
            dxq, dyq, dzq = dx[sl], dy[sl], dz[sl]
            adx, ady, adz = jnp.abs(dxq), jnp.abs(dyq), jnp.abs(dzq)
            steep_col = (adx > 2.0 * adz) | (ady > 2.0 * adz)
            steep_super = (adx > adz) | (ady > adz)
            return (
                sx[sl], sy[sl], sz[sl], dxq, dyq, dzq, t1[sl],
                act[sl] == 1, steep_col, steep_super,
            )

        def pass_act(ray, direction):
            return ray[7] & ((ray[5] > 0) if direction > 0 else (ray[5] < 0))

        # Cross-brick carry: seed the found flags from earlier bricks'
        # occlusion — every per-query gate (seg_ok & ~foundq) then treats
        # already-occluded rays as latched, and fully-resolved tiles die
        # at the per-direction scalar folds below.
        found_ref[:] = occ_prev[:]

        # Start-column gating over ALL queries (sweep's smin_c/smax_c):
        # columns entirely behind every query's start along the pass
        # direction can never produce a hit.
        actv = act[:] == 1
        ozv = sz[:]
        big = jnp.float32(1e9)
        start_gz = jnp.floor((jnp.where(actv, ozv, big).min() + half) * n)
        smin_c = start_gz.astype(_I32) // 8 - z0 // 8 - 1
        end_gz = jnp.floor((jnp.where(actv, ozv, -big).max() + half) * n)
        smax_c = end_gz.astype(_I32) // 8 - z0 // 8 + 1

        def col_seg(c_plane, ray, pass_active, foundq):
            """Column segment overlap for one query (t ∈ [0, t1])."""
            oz, dzq, t1q = ray[2], ray[5], ray[6]
            inv_dz = 1.0 / dzq
            gz = z0f + c_plane * 8
            ta = (gz * inv_n - half - oz) * inv_dz
            tb = ((gz + 8.0) * inv_n - half - oz) * inv_dz
            lo = jnp.maximum(jnp.minimum(ta, tb), 0.0)
            hi = jnp.minimum(jnp.maximum(ta, tb), t1q)
            return (lo < hi) & ~foundq & pass_active, lo, hi

        def column_planes(c_plane, direction):
            """All 8 fine planes of one descended column, all queries.

            Query-OUTER, plane-INNER: each query's ray loads ONCE per
            column and stays live across its 8 sequential plane probes
            (the sweep's col_work discipline — the first cut of this
            kernel reloaded the 9 ray arrays per plane probe, 8× the
            VMEM traffic, and regressed the 512³ frame by ~40%).  The
            per-query fetches forgo cross-query row-load sharing; the
            shared gating machinery (group/column candidates + folds +
            `pl.when` regions, the dominant per-sweep fixed cost) still
            amortizes over the batch."""
            for q in range(nq):
                sl = slice(q * SUB, (q + 1) * SUB)
                ray = load_q(q)
                pa = pass_act(ray, direction)
                ox, oy, oz, dxq, dyq, dzq, t1q = ray[:7]
                inv_dx = 1.0 / dxq
                inv_dy = 1.0 / dyq
                inv_dz = 1.0 / dzq
                exq = exid[sl]
                for f in range(8):
                    fo = f if direction > 0 else 7 - f
                    k_plane = c_plane * 8 + fo
                    gz_i = z0 + k_plane
                    gzf = z0f + k_plane
                    foundq = found_ref[sl] == 1
                    ta = (gzf * inv_n - half - oz) * inv_dz
                    tb = ((gzf + 1.0) * inv_n - half - oz) * inv_dz
                    lo = jnp.maximum(jnp.minimum(ta, tb), 0.0)
                    hi = jnp.minimum(jnp.maximum(ta, tb), t1q)
                    seg_ok = (lo < hi) & ~foundq & pa
                    tm = 0.5 * (lo + hi)
                    cx = jnp.clip(
                        jnp.floor((ox + tm * dxq + half) * n), 0, n - 1
                    ).astype(_I32)
                    cy = jnp.clip(
                        jnp.floor((oy + tm * dyq + half) * n), 0, n - 1
                    ).astype(_I32)
                    bit = fetch_one(vol, k_plane, cx, cy, seg_ok, x0w)
                    cand = (
                        seg_ok
                        & (bit == 1)
                        & ~((cx + cy * n + gz_i * (n * n)) == exq)
                    )
                    # Visible-cube intersection, shadow accept rule
                    # (wgsl:669: tn ≤ tf ∧ tn ≥ 0).
                    ccx = (cx.astype(_F32) + 0.5) * inv_n - half
                    ccy = (cy.astype(_F32) + 0.5) * inv_n - half
                    ccz = (gzf + 0.5) * inv_n - half
                    t1x = (ccx - cell_half - ox) * inv_dx
                    t2x = (ccx + cell_half - ox) * inv_dx
                    t1y = (ccy - cell_half - oy) * inv_dy
                    t2y = (ccy + cell_half - oy) * inv_dy
                    t1z = (ccz - cell_half - oz) * inv_dz
                    t2z = (ccz + cell_half - oz) * inv_dz
                    tn = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)
                        ),
                        jnp.minimum(t1z, t2z),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)
                        ),
                        jnp.maximum(t1z, t2z),
                    )
                    hit = cand & (tn <= tf) & (tn >= 0.0)
                    found_ref[sl] = jnp.where(hit, 1, found_ref[sl])

        # Per-direction scalar gate over ALL queries (the sweep's
        # pass_possible check): shadow rays toward an overhead light are
        # almost all dz > 0 — one fold kills the whole -z pass.  Rays
        # already occluded by earlier bricks (the carry) drop out here
        # too: a fully-resolved tile skips both passes outright.
        dzs = dz[:]
        actv_all = (act[:] == 1) & (found_ref[:] == 0)
        dir_any = {
            1: _or_fold_scalar((actv_all & (dzs > 0)).astype(_I32)) != 0,
            -1: _or_fold_scalar((actv_all & (dzs < 0)).astype(_I32)) != 0,
        }

        for direction in (1, -1):
            for g0 in range(0, nc, GROUP):
                cols = [
                    (g0 + j) if direction > 0 else (nc - 1 - (g0 + j))
                    for j in range(GROUP)
                ]
                lo_c, hi_c = min(cols), max(cols)
                gate = dir_any[direction]
                gate = gate & (zrange[1] >= lo_c) & (zrange[0] <= hi_c)
                gate = gate & (
                    (hi_c >= smin_c) if direction > 0 else (lo_c <= smax_c)
                )

                @pl.when(gate)
                def _(cols=cols, lo_c=lo_c, hi_c=hi_c, direction=direction):
                    # Supercolumn gate over the 4-column span, folded
                    # across every query (3 probes each on the shared,
                    # dilated coarse2 row).
                    row2 = _bcast_row(coarse2[lo_c // 4 : lo_c // 4 + 1, :])
                    desc = jnp.zeros((SUB, LANE), _I32)
                    for q in range(nq):
                        ray = load_q(q)
                        pa = pass_act(ray, direction)
                        foundq = found_ref[q * SUB : (q + 1) * SUB] == 1
                        ox, oy, oz, dxq, dyq, dzq, t1q = ray[:7]
                        steep = ray[9]
                        inv_dz = 1.0 / dzq
                        ta = ((z0f + lo_c * 8) * inv_n - half - oz) * inv_dz
                        tb = (
                            (z0f + hi_c * 8 + 8) * inv_n - half - oz
                        ) * inv_dz
                        lo_t = jnp.maximum(jnp.minimum(ta, tb), 0.0)
                        hi_t = jnp.minimum(jnp.maximum(ta, tb), t1q)
                        seg2 = (lo_t < hi_t) & ~foundq & pa
                        occ2 = steep & seg2  # steep = steep_super (ray[9])
                        for tp in (lo_t, 0.5 * (lo_t + hi_t), hi_t):
                            bxc = jnp.floor(
                                (ox + tp * dxq + half) * nbk
                            ).astype(_I32)
                            byc = jnp.floor(
                                (oy + tp * dyq + half) * nbk
                            ).astype(_I32)
                            occ2 = occ2 | fetch_coarse(row2, bxc, byc, seg2)
                        desc = desc | occ2.astype(_I32)
                    sdesc = _or_fold_scalar(desc)

                    @pl.when(sdesc != 0)
                    def _(cols=cols, direction=direction):
                        # Per-column candidates, all queries, ONE fold.
                        gmask_v = jnp.zeros((SUB, LANE), _I32)
                        for j, c in enumerate(cols):
                            row_b = _bcast_row(coarse[c : c + 1, :])
                            for q in range(nq):
                                ray = load_q(q)
                                pa = pass_act(ray, direction)
                                foundq = (
                                    found_ref[q * SUB : (q + 1) * SUB] == 1
                                )
                                seg_ok, lo, hi = col_seg(c, ray, pa, foundq)
                                occ = ray[8] & seg_ok
                                for tp in (lo, 0.5 * (lo + hi), hi):
                                    bxc = jnp.floor(
                                        (ray[0] + tp * ray[3] + half) * nbk
                                    ).astype(_I32)
                                    byc = jnp.floor(
                                        (ray[1] + tp * ray[4] + half) * nbk
                                    ).astype(_I32)
                                    occ = occ | fetch_coarse(
                                        row_b, bxc, byc, seg_ok
                                    )
                                gmask_v = gmask_v | jnp.where(
                                    occ, _I32(1 << j), _I32(0)
                                )
                        gmask = _or_fold_scalar(gmask_v)
                        for j, c_plane in enumerate(cols):

                            @pl.when(((gmask >> j) & 1) != 0)
                            def _(c_plane=c_plane, direction=direction):
                                column_planes(c_plane, direction)

        out_occ[:] = found_ref[:]

    return kernel


def _make_cellstate_kernel(n, zext, nq, x_words=None, sub=SUB):
    """Per-pixel cell-state lookup for ``nq`` target-coord queries per
    pixel, fetched in-kernel in ONE pass over the volume planes.

    Replaces the XLA `jnp.take` gathers of `intersect.get_cell_state`
    (2M pixels × 4 slots per GI level) with the sweep's lane-gather word
    fetches — and fixes two costs the first in-kernel cut (one query per
    kernel instance, [zlo, zhi] interval gate) still paid (CSE-proof
    profile: 57.5 ms for the 4 GI slots — slower than the full primary
    sweep):

    * the z-groups to visit are gated by an OR-folded 32-bit BITMASK of
      the groups any slot actually targets — an interval collapses to
      the whole volume on silhouette tiles, where foreground and
      background hits stretch [zlo, zhi] across hundreds of planes while
      only 2-3 groups are populated;
    * all ``nq`` slots share each executed plane's packed-word row loads
      (`fetch_fine_bits_multi`): the GI slots' z's sit within ±1 of the
      hit cell, so their plane sets coincide and the row loads amortize
      nq×;
    * the kernel runs on (``sub``, LANE) tiles FINER than the sweep's
      (SUB, LANE): the bitmask gate's effectiveness scales inversely
      with the tile's screen footprint (a 256×128-pixel tile spans many
      depth levels, a 16×256 strip few) and this kernel has no sweep to
      amortize — traced at sub=SUB it costs 13.7 ms/frame, more than
      the whole primary sweep.

    Exactness: each output bit replicates `state(max(coords, 0) mod n)` —
    the reference's clamp-then-wrap lookup semantics
    (pathtraced_fragment_clustered.wgsl:268-304; intersect.py:95-111).
    The GI layer slots are *edge-diagonal* offsets (wgsl:110-169), so
    lookups take absolute target coords — a 6-face-neighbour mask cannot
    express them.
    """
    _, _, fetch_multi = _make_traversal(n, zext, 0, x_words, sub=sub)
    assert zext // 8 <= 32, "group bitmask is 32-bit (zext ≤ 256)"

    def kernel(zrange, *refs):
        ins = refs[: 4 * nq]
        vol = refs[4 * nq]
        outs = refs[4 * nq + 1 :]
        z0 = zrange[2]
        x0w = zrange[3] if x_words is not None else None
        zmin_c, zmax_c = zrange[0], zrange[1]  # occupied columns, slab-local
        qs = []
        gm = jnp.zeros((sub, LANE), _I32)
        for i in range(nq):
            cx_in, cy_in, cz_in, act_in = ins[4 * i : 4 * i + 4]
            act = act_in[:] == 1
            # Clamp-then-wrap target coords (intersect.py:95-111: coords
            # are pre-clamped ≥ 0 by the caller; lookup wraps mod n).
            tx = jnp.maximum(cx_in[:], 0) % n
            ty = jnp.maximum(cy_in[:], 0) % n
            tz = jnp.maximum(cz_in[:], 0) % n
            k = tz - z0  # slab-local plane (may be out of [0, zext))
            in_slab = act & (k >= 0) & (k < zext)
            # One-hot of the slab-local 8-plane group, built with an
            # in-graph shift so group 31 lands on the i32 sign bit; the
            # clamp keeps out-of-slab shift amounts defined (the where
            # discards their value).
            gm = gm | jnp.where(
                in_slab,
                jax.lax.shift_left(
                    jnp.int32(1), jnp.clip(k, 0, zext - 1) >> 3
                ),
                0,
            )
            qs.append((tx, ty, tz))
        gmask = _or_fold_scalar(gm)

        for i in range(nq):
            outs[i][:] = jnp.zeros((sub, LANE), _I32)
        for c8 in range(zext // 8):
            bit = jax.lax.shift_left(jnp.int32(1), jnp.int32(c8))
            gate = (
                (jnp.bitwise_and(gmask, bit) != 0)
                # Unoccupied coarse columns hold no set state bits —
                # skipping them leaves the bit 0, which equals fetching.
                & (zmax_c >= c8) & (zmin_c <= c8)
            )

            @pl.when(gate)
            def _(c8=c8):
                ms = [outs[i][:] for i in range(nq)]
                for f in range(8):
                    k = c8 * 8 + f
                    g = z0 + k
                    bits = fetch_multi(
                        vol, k, [(tx, ty) for tx, ty, _ in qs], x0w
                    )
                    for i, b in enumerate(bits):
                        ms[i] = ms[i] | jnp.where(qs[i][2] == g, b, 0)
                for i in range(nq):
                    outs[i][:] = ms[i]

    return kernel


def cell_state_batch(queries, prepped, *, grid_size, width, height,
                     interpret=False, blocked=False):
    """Cell states for a batch of per-pixel coordinate queries.

    ``queries``: list of (coords [H, W, 3] int32 (pre-clamped ≥ 0),
    active [H, W] bool).  Returns one int32 [H, W] state image per query
    with the reference's clamp-then-wrap addressing.  All queries run in
    ONE kernel launch per brick (every query served per instance so the
    plane row loads are shared); states OR over bricks (cells outside a
    brick contribute 0).  The launch grid partitions each (SUB, LANE)
    screen tile into (CS_SUB, LANE) strips — same blocked arrays, finer
    instances — so the per-instance z-group bitmask stays tight (see
    _make_cellstate_kernel).
    """
    n = grid_size
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
    nq = len(queries)
    blk_i32 = jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.int32)
    cs_sub = CS_SUB
    grid_n = tiles * (SUB // cs_sub)
    tile_spec = pl.BlockSpec((cs_sub, LANE), lambda t: (t, 0))

    if blocked:
        def tb(x):
            return x
    else:
        def tb(x):
            return _to_blocks(x, width, height)

    args = []
    for coords, active in queries:
        args += [
            tb(coords[..., 0]),
            tb(coords[..., 1]),
            tb(coords[..., 2]),
            tb(active.astype(jnp.int32)),
        ]

    states = [jnp.zeros((tiles * SUB, LANE), jnp.int32) for _ in range(nq)]
    for group in prepped:
        kernel = _make_cellstate_kernel(n, group.zext, nq, group.xw, cs_sub)

        def call(vol2d, col, c2, zrange, kernel=kernel):
            def run():
                return tuple(
                    pl.pallas_call(
                        kernel,
                        grid=(grid_n,),
                        out_shape=[blk_i32] * nq,
                        in_specs=(
                            [pl.BlockSpec(memory_space=pltpu.SMEM)]
                            + [tile_spec] * (4 * nq)
                            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                        ),
                        out_specs=[tile_spec] * nq,
                        interpret=interpret,
                        compiler_params=_SLAB_PARAMS,
                    )(zrange, *args, vol2d)
                )

            # Empty bricks hold no set state bits (OR-neutral) — skip.
            return jax.lax.cond(
                _brick_nonempty(zrange), run,
                lambda: tuple(
                    jnp.zeros((tiles * SUB, LANE), jnp.int32)
                    for _ in range(nq)
                ),
            )

        states = _scan_bricks(
            group, call,
            lambda a, st: [x | y for x, y in zip(a, st)], states,
        )
    if blocked:
        return states
    return [_from_blocks(s, width, height) for s in states]


def _vol2d_slab(vol, z0, zext, n, x0w=None, x_words=None):
    """Pack a (z-slab × x-chunk) brick into the kernel's [Z, C, 128]
    layout.  The final x-chunk of a non-multiple grid is zero-padded —
    padded words read as empty space."""
    y_pad = -(-n // LANE) * LANE
    v = vol[:, z0 : z0 + zext, :]
    xw = n // 32
    if x0w is not None:
        v = v[x0w : x0w + x_words]
        xw = x_words
        if v.shape[0] < x_words:
            v = jnp.pad(v, ((0, x_words - v.shape[0]), (0, 0), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, y_pad - n))).transpose(1, 0, 2)
    return v.reshape(zext, xw * (y_pad // LANE), LANE)


def _chunk_rows(rows, b0, nb, yc):
    """Slice blocks [b0, b0+nb) out of group-major packed rows
    [R, XG·yc] → single-chunk rows [R, yc] (bit k = block b0+k).  Chunks
    never straddle a 32-block group (nb divides 32)."""
    r = rows.reshape(rows.shape[0], -1, yc)[:, b0 // 32, :]
    if nb < 32:
        r = (r >> _U32(b0 % 32)) & _U32((1 << nb) - 1)
    return r


def _slab_occupancy(coarse_full, z0, zext, n, x0w=None, x_words=None,
                    cache=None):
    """(column rows, supercolumn rows, zrange) for one brick; zrange is
    [zmin, zmax, z0(, x0w)] with slab-local column indices and the
    brick's global z / x-word offsets as runtime scalars
    (render_fast._make_traversal).  Dilation runs on the FULL rows
    before chunk extraction so cross-chunk carries are kept.  ``cache``
    (a dict) shares the full-row dilations between the x-chunks of one
    z-slab — at 1024³ the 16 bricks need only 4 dilation graphs."""
    yc = n // 8
    key = (z0, zext)
    if cache is not None and key in cache:
        sl, col, c2 = cache[key]
    else:
        sl = coarse_full[z0 // 8 : (z0 + zext) // 8]
        col = dilate_occupancy(sl, dilate_z=False, yc=yc, dilate_y=False)
        nc_groups = (zext // 8) // 4
        c4 = sl[: nc_groups * 4].reshape(nc_groups, 4, -1)
        c2 = c4[:, 0] | c4[:, 1] | c4[:, 2] | c4[:, 3]
        c2 = dilate_occupancy(c2, yc=yc)
        if cache is not None:
            cache[key] = (sl, col, c2)
    occ_nd = sl
    if x0w is not None:
        b0, nb = x0w * 4, x_words * 4
        col = _chunk_rows(col, b0, nb, yc)
        c2 = _chunk_rows(c2, b0, nb, yc)
        occ_nd = _chunk_rows(sl, b0, nb, yc)
    if col.shape[1] < LANE:
        col = jnp.pad(col, ((0, 0), (0, LANE - col.shape[1])))
    if c2.shape[1] < LANE:
        c2 = jnp.pad(c2, ((0, 0), (0, LANE - c2.shape[1])))
    nc_ = zext // 8
    row_any = jnp.any(occ_nd != 0, axis=1)
    idxs = jnp.arange(nc_, dtype=jnp.int32)
    any_any = jnp.any(row_any)
    zmin = jnp.where(any_any, jnp.min(jnp.where(row_any, idxs, nc_)), nc_)
    zmax = jnp.where(any_any, jnp.max(jnp.where(row_any, idxs, -1)), -1)
    parts = [zmin, zmax, jnp.asarray(z0, zmin.dtype)]
    if x0w is not None:
        parts.append(jnp.asarray(x0w, zmin.dtype))
    return col, c2, jnp.stack(parts).astype(jnp.int32)


def _to_blocks(x, width, height, fill=0):
    """[H, W] → tile-blocked [tiles·SUB, LANE] (inverse of unflat)."""
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    x = jnp.pad(
        x, ((0, nby * BH - height), (0, nbx * BW - width)),
        constant_values=fill,
    )
    x = x.reshape(nby, BH, nbx, BW).transpose(0, 2, 1, 3)
    return x.reshape(nby * nbx * SUB, LANE)


def _from_blocks(x, width, height):
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    x = x.reshape(nby, nbx, BH, BW).transpose(0, 2, 1, 3)
    return x.reshape(nby * BH, nbx * BW)[:height, :width]


def prep_slabs(vol, bricks, grid_size, x_words=None):
    """Kernel operands (packed layouts + occupancy structures) for every
    brick, computed once per frame and shared across every occlusion
    pass, grouped by shape with inputs STACKED on a brick axis (see
    ``SlabGroup`` — consumers scan over it).  ``bricks``: (z0, zext)
    pairs or (z0, zext, gi) triples (gi = x-group, None = full-x).
    ``brick_layout`` emits slabs in increasing z0 with only the last
    slab (and x-remainder) differing in shape, so grouping preserves
    the global brick order — the min-t tie-break matches the unrolled
    composite exactly."""
    coarse_full = coarse_occupancy(vol)
    occ_cache = {}
    order = []
    acc = {}
    for brick in bricks:
        z0, zext = brick[:2]
        gi = brick[2] if len(brick) > 2 else None
        x0w = None if gi is None else gi * x_words
        xw = None if gi is None else x_words
        vol2d = _vol2d_slab(vol, z0, zext, grid_size, x0w, xw)
        col, c2, zrange = _slab_occupancy(
            coarse_full, z0, zext, grid_size, x0w, xw, cache=occ_cache
        )
        key = (zext, xw)
        if key not in acc:
            acc[key] = ([], [], [], [], [])
            order.append(key)
        g = acc[key]
        g[0].append((z0, zext, gi))
        g[1].append(vol2d)
        g[2].append(col)
        g[3].append(c2)
        g[4].append(zrange)
    return [
        SlabGroup(
            k[0], k[1], tuple(acc[k][0]),
            jnp.stack(acc[k][1]), jnp.stack(acc[k][2]),
            jnp.stack(acc[k][3]), jnp.stack(acc[k][4]),
        )
        for k in order
    ]


def _shadow_occlusion_sweep(cam, queries, prepped, n, width, height,
                            tiles, tb, interpret, blocked):
    """Sweep-kernel occlusion: one `_make_shadow_kernel_sweep` instance
    per (query, tile), inputs stacked QUERY-major.  The nq == 1 (and
    CA3D_OCC_SWEEP=1 attribution) backend of `shadow_occlusion_batch` —
    same contract."""
    nq = len(queries)
    blk_i32 = jax.ShapeDtypeStruct((nq * tiles * SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((SUB, LANE), lambda t: (t, 0))
    ray_scratch = [
        pltpu.VMEM((SUB, LANE), jnp.float32) for _ in range(8)
    ] + [pltpu.VMEM((SUB, LANE), jnp.int32)]  # r_flags

    cols = [[] for _ in range(11)]
    for start, target, excl, active in queries:
        sd = target - start
        sd = sd * jax.lax.rsqrt(jnp.sum(sd * sd, axis=-1, keepdims=True))
        e1 = (-0.5 - start) / sd
        e2 = (0.5 - start) / sd
        sh_tf = jnp.min(jnp.maximum(e1, e2), axis=-1)
        parts = [
            tb(start[..., 0]),
            tb(start[..., 1]),
            tb(start[..., 2]),
            tb(sd[..., 0], fill=1),
            tb(sd[..., 1], fill=1),
            tb(sd[..., 2], fill=1),
            tb(sh_tf),
            tb(excl[..., 0], fill=-1),
            tb(excl[..., 1], fill=-1),
            tb(excl[..., 2], fill=-1),
            tb(active.astype(jnp.int32)),
        ]
        for c, p in zip(cols, parts):
            c.append(p)
    args = [jnp.concatenate(c, axis=0) for c in cols]

    occluded = jnp.zeros((nq * tiles * SUB, LANE), jnp.int32)
    for group in prepped:
        kernel = _make_shadow_kernel_sweep(n, group.zext, group.xw)

        def call(vol2d, col, c2, zrange, acc=None, kernel=kernel):
            def run():
                return pl.pallas_call(
                    kernel,
                    grid=(nq * tiles,),
                    out_shape=blk_i32,
                    in_specs=(
                        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                        + [pl.BlockSpec((SUB, LANE), lambda t: (t, 0))] * 12
                        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                    ),
                    out_specs=out_spec,
                    scratch_shapes=[
                        pltpu.VMEM((SUB, LANE), jnp.int32),
                        pltpu.VMEM((SUB, LANE), jnp.float32),
                        pltpu.VMEM((SUB, LANE), jnp.int32),
                        pltpu.VMEM((SUB, LANE), jnp.int32),
                        pltpu.VMEM((SUB, LANE), jnp.int32),
                    ] + list(ray_scratch)
                    + [pltpu.SMEM((1,), jnp.int32)],  # sticky any-alive
                    interpret=interpret,
                    compiler_params=_SLAB_PARAMS,
                )(cam, zrange, *args, acc, vol2d, col, c2)

            # Empty bricks occlude nothing (OR-neutral) — skip the launch.
            return jax.lax.cond(
                _brick_nonempty(zrange), run,
                lambda: jnp.zeros((nq * tiles * SUB, LANE), jnp.int32),
            )

        occluded = _scan_bricks(group, call, lambda a, occ: a | occ,
                                occluded, carry_to_call=True)
    per_q = occluded.reshape(nq, tiles * SUB, LANE)
    if blocked:
        return [per_q[i] == 1 for i in range(nq)]
    return [_from_blocks(per_q[i], width, height) == 1 for i in range(nq)]


def shadow_occlusion_batch(cam, queries, prepped, *, grid_size, width,
                           height, interpret=False, blocked=False):
    """Cell-exact occlusion for a BATCH of per-pixel ray queries.

    ``queries``: list of (start [H,W,3], target [H,W,3], excl [H,W,3] int,
    active [H,W] bool) — e.g. the k jittered soft-shadow samples, or the
    4 indirect-bounce slots.  All queries run in ONE kernel launch per
    slab with every query served per tile INSTANCE (_make_shadow_kernel):
    the traversal machinery and plane row loads are shared across
    queries, which is what cut the full-GI frame's 8 independent
    secondary sweeps down to two shared traversals.  Inputs stack
    tile-major (tile t's block holds its nq query slabs contiguously).
    Returns list of bool [H, W] occlusion masks (ORed over slabs).

    Kernel selection: per-query SWEEP kernels
    (`_make_shadow_kernel_sweep`, one instance per query × tile) are the
    DEFAULT for every batch size — measured round 5: the multi-query
    kernel's per-query unrolled probe geometry costs more than the fixed
    machinery it shares (full-GI 8-query frame 121.4 ms vs 92.8 with
    independent sweeps in round 3; 512³ nq=1 frame 72.3 → 52.0 after
    the switch; bench_out/r05_scale.txt, r05_512_ablate.txt).
    CA3D_OCC_SWEEP=0 opts nq>1 batches back into the shared-traversal
    multi-query kernel (perf attribution); CA3D_OCC_NQ1_SWEEP=0
    additionally forces nq=1 through it.
    """
    n = grid_size
    nq = len(queries)
    # Mosaic compile time scales superlinearly with nq (the kernel
    # unrolls per-query geometry for every plane probe): nq=2 compiles
    # in minutes, nq=8 ran >1.5 h on this host before being abandoned.
    # Cap at 4 — the full-GI frame (4 soft + 4 GI slots) runs as two
    # shared-traversal launches, still amortizing the per-sweep fixed
    # machinery 4× vs the old per-query launches.
    nq_max = int(_os.environ.get("CA3D_OCC_NQ", "4"))
    if nq > nq_max:
        out = []
        for i in range(0, nq, nq_max):
            out += shadow_occlusion_batch(
                cam, queries[i : i + nq_max], prepped, grid_size=grid_size,
                width=width, height=height, interpret=interpret,
                blocked=blocked,
            )
        return out
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
    blk_i32 = jax.ShapeDtypeStruct((tiles * nq * SUB, LANE), jnp.int32)
    qblock = pl.BlockSpec((nq * SUB, LANE), lambda t: (t, 0))

    if blocked:
        # Inputs are already tile-blocked [T·SUB, LANE(,3)]; direction
        # components with 0 denominators only occur on inactive lanes
        # (padded pixels carry real-but-unused geometry there).
        def tb(x, fill=0):
            return x
    else:
        def tb(x, fill=0):
            return _to_blocks(x, width, height, fill=fill)

    use_sweep = _os.environ.get("CA3D_OCC_SWEEP", "1") == "1" or (
        nq == 1 and _os.environ.get("CA3D_OCC_NQ1_SWEEP", "1") == "1"
    )
    if use_sweep:
        return _shadow_occlusion_sweep(
            cam, queries, prepped, n, width, height, tiles, tb, interpret,
            blocked,
        )

    cols = [[] for _ in range(9)]
    for start, target, excl, active in queries:
        sd = target - start
        sd = sd * jax.lax.rsqrt(jnp.sum(sd * sd, axis=-1, keepdims=True))
        e1 = (-0.5 - start) / sd
        e2 = (0.5 - start) / sd
        sh_tf = jnp.min(jnp.maximum(e1, e2), axis=-1)
        # Packed exclusion id.  Out-of-range coords get the -1 sentinel:
        # naive packing aliases, e.g. x == n packs to the same id as the
        # REAL cell (0, y+1, z) and would wrongly exclude that occluder
        # (the old componentwise compare could never match; round-4
        # advisor finding).  Probe ids are always >= 0, so -1 never hits.
        in_range = jnp.all((excl >= 0) & (excl < n), axis=-1)
        exid = jnp.where(
            in_range,
            excl[..., 0] + excl[..., 1] * n + excl[..., 2] * (n * n),
            -1,
        )
        parts = [
            tb(start[..., 0]),
            tb(start[..., 1]),
            tb(start[..., 2]),
            tb(sd[..., 0], fill=1),
            tb(sd[..., 1], fill=1),
            tb(sd[..., 2], fill=1),
            tb(sh_tf),
            tb(exid, fill=-1),
            tb(active.astype(jnp.int32)),
        ]
        for c, p in zip(cols, parts):
            c.append(p)

    def interleave(xs):
        a = jnp.stack(xs).reshape(nq, tiles, SUB, LANE)
        return a.transpose(1, 0, 2, 3).reshape(tiles * nq * SUB, LANE)

    args = [interleave(c) for c in cols]

    occluded = jnp.zeros((tiles * nq * SUB, LANE), jnp.int32)
    for group in prepped:
        kernel = _make_shadow_kernel(n, group.zext, nq, group.xw)

        def call(vol2d, col, c2, zrange, acc=None, kernel=kernel):
            def run():
                return pl.pallas_call(
                    kernel,
                    grid=(tiles,),
                    out_shape=blk_i32,
                    in_specs=(
                        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                        + [qblock] * 10
                        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                    ),
                    out_specs=qblock,
                    scratch_shapes=[
                        pltpu.VMEM((nq * SUB, LANE), jnp.int32),  # found_ref
                    ],
                    interpret=interpret,
                    compiler_params=_SLAB_PARAMS,
                )(cam, zrange, *args, acc, vol2d, col, c2)

            # Empty bricks occlude nothing (OR-neutral) — skip the launch.
            # (OR-merge of `acc` makes the carried bits idempotent.)
            return jax.lax.cond(
                _brick_nonempty(zrange), run,
                lambda: jnp.zeros((tiles * nq * SUB, LANE), jnp.int32),
            )

        occluded = _scan_bricks(group, call, lambda a, occ: a | occ,
                                occluded, carry_to_call=True)
    per_q = occluded.reshape(tiles, nq, SUB, LANE).transpose(1, 0, 2, 3)
    per_q = per_q.reshape(nq, tiles * SUB, LANE)
    if blocked:
        return [per_q[i] == 1 for i in range(nq)]
    return [_from_blocks(per_q[i], width, height) == 1 for i in range(nq)]


def soft_shadow_jitter(cam, kk, width, height, nk=None, uv=None):
    """Jittered area-light offset for soft-shadow sample ``kk`` — the
    reference's sin-fract hash over global-window UVs (n1rand,
    wgsl:171-180; renderer.py:218-222).  Returns [H, W, 3].  ``kk`` may
    be a traced i32 scalar in [0, nk) (the temporally-amortized mode
    rotates the sample index per frame): the per-sample hash constants
    are then a static f64-rounded table indexed dynamically, so each
    rotated sample is BIT-IDENTICAL to the corresponding static sample
    (a 1-ulp constant change would decorrelate the sin-fract hash).
    ``uv``: optional (ux, uy) pixel-uv arrays of any layout (the blocked
    pipeline passes tile-blocked uvs; the hash is per-pixel pointwise,
    so the layout permutes but the values match)."""
    win_w = cam[P_WIN]
    win_h = cam[P_WIN + 1]
    if uv is not None:
        ux, uy = uv
    else:
        pxs = jnp.arange(width, dtype=jnp.float32)[None, :]
        pys = jnp.arange(height, dtype=jnp.float32)[:, None]
        ux = (pxs + 0.5) / win_w + jnp.zeros((height, 1), jnp.float32)
        uy = (
            1.0 - (pys + cam[P_ROW0] + 0.5) / win_h
            + jnp.zeros((1, width), jnp.float32)
        )
    tfrac = cam[P_TIME] - jnp.floor(cam[P_TIME])

    def j1(cst):
        ax = 0.07 * tfrac + ux + cst
        ay = 0.07 * tfrac + uy + cst
        v = jnp.sin(ax * 12.9898 + ay * 78.233) * 43758.5453
        return (v - jnp.floor(v)) - 0.5

    if isinstance(kk, (int, float)):
        c1 = jnp.float32(0.17 * kk + 0.05)
        c2 = jnp.float32(0.29 * kk + 0.11)
        c3 = jnp.float32(0.41 * kk + 0.23)
    else:
        if nk is None:
            raise ValueError("traced sample index requires nk")
        ki = jnp.asarray(kk, jnp.int32)
        c1 = jnp.asarray([0.17 * k + 0.05 for k in range(nk)], jnp.float32)[ki]
        c2 = jnp.asarray([0.29 * k + 0.11 for k in range(nk)], jnp.float32)[ki]
        c3 = jnp.asarray([0.41 * k + 0.23 for k in range(nk)], jnp.float32)[ki]
    rad2 = 2.0 * cam[P_LRAD]
    return jnp.stack([j1(c1), j1(c2), j1(c3)], axis=-1) * rad2


def direct_occlusion(cam, q, coords, found, prepped, *,
                     grid_size, width, height, soft_k=1, jitter_k=None,
                     interpret=False):
    """Direct-light occlusion quotient [H, W]: hard (one kernel ray per
    pixel) or soft (``soft_k`` jittered area-light samples averaged,
    renderer.py:212-224); all samples batched into one launch.

    ``jitter_k``: traced i32 sample index in [0, soft_k) for the
    temporally-amortized mode — ONE jittered sample per frame whose
    index rotates over the configured sample count; the temporal EMA
    converges to the same ``soft_k``-sample average (the reference's own
    stochastic-shadow pattern: one jittered ray per frame into the
    accumulator).  Each rotated sample is bit-identical to the
    corresponding static sample (soft_shadow_jitter's constant table)."""
    light = cam[P_LIGHT : P_LIGHT + 3]
    queries = []
    if jitter_k is not None:
        target = light + soft_shadow_jitter(
            cam, jitter_k, width, height, nk=max(1, soft_k)
        )
        queries.append((q, target, coords, found))
        soft_k = 1
    for kk in range(0 if jitter_k is not None else max(1, soft_k)):
        if soft_k > 1:
            target = light + soft_shadow_jitter(cam, kk, width, height)
        else:
            target = jnp.broadcast_to(light, q.shape)
        queries.append((q, target, coords, found))
    occs = shadow_occlusion_batch(
        cam, queries, prepped, grid_size=grid_size, width=width,
        height=height, interpret=interpret,
    )
    occ_sum = jnp.zeros((height, width), jnp.float32)
    for occluded in occs:
        occ_sum = occ_sum + jnp.where(
            occluded, jnp.float32(0.0095), jnp.float32(1.0)
        )
    return occ_sum / jnp.float32(max(1, soft_k))


def indirect_bounce(vol, cam, q, origin, coords, found, prepped, *,
                    grid_size, width, height, interpret=False, bounces=1,
                    slot=None):
    """Indirect GI (wgsl:307-377; semantics of renderer._indirect_lighting
    with the stochastic shadow march replaced by cell-exact occlusion
    kernels, each level's 4 neighbour slots batched into one launch).
    ``bounces`` > 1 recursively adds each neighbour's own indirect term
    (4^b occlusion queries).  Works for any grid size the slab machinery
    supports — including the fused path (one (0, n) slab), whose in-kernel
    GI variant was compile-prohibitive at 256³.  Returns rgb [H, W, 3].

    Neighbour states come from ``cell_state_batch`` (one in-kernel
    word-fetch launch per GI level, all 4 slots batched) instead of XLA
    per-pixel gathers — the round-2 ablation put ~85 ms of the 117 ms GI
    frame on `get_cell_state`'s `jnp.take` over 2M pixels × 4 slots.

    ``slot``: traced i32 scalar — temporally-amortized mode: evaluate
    ONE of the 4 neighbour slots, scaled ×4 (an unbiased estimator of
    the 4-slot sum); the caller rotates the slot per frame so the
    temporal EMA converges to the full indirect term at ~1/3 of its
    per-frame sweep cost.  Requires ``bounces == 1`` (deeper recursion
    with one shared slot index would correlate the levels)."""
    from . import brdf
    from .intersect import (
        FULL_CUBE_SIZE,
        HALF_CUBE_SIZE,
        cube_face_normal,
        ray_cube_intersect,
    )
    from .renderer import _INDIRECT_LAYERS, _face_index

    n = grid_size
    cell = jnp.float32(FULL_CUBE_SIZE / n)
    vis_half = cell * cam[P_CELLMUL] * 0.5
    light = cam[P_LIGHT : P_LIGHT + 3]
    o = cam[P_O : P_O + 3]
    lmag3 = jnp.broadcast_to(cam[P_LMAG], q.shape)
    emis = cam[P_EMIS : P_EMIS + 3] * cam[P_EMISS]
    layers = jnp.asarray(_INDIRECT_LAYERS)  # [6, 4, 3]

    def shade(point, porigin, pcoords, viewer, radiance, light_point):
        return brdf.calculate_lighting_at(
            point, porigin, pcoords, viewer, radiance, light_point,
            grid_size=n, roughness=cam[P_ROUGH],
            material_color=cam[P_MATC : P_MATC + 3],
            base_reflectivity=cam[P_REFL : P_REFL + 3],
        )

    def _select_by_face(table, face):
        """``table[face]`` for a tiny [6, 3] table and a per-pixel face
        image — as a 6-way select chain, NOT ``jnp.take``: an XLA gather
        indexed by 2M pixel rows costs ~3.8 ms/frame at 1080p (traced,
        `fusion.172` + its S(1) copy), while the selects fuse to
        elementwise for free."""
        out = jnp.zeros(face.shape + (3,), table.dtype)
        for f in range(6):
            out = jnp.where((face == f)[..., None], table[f], out)
        return out

    def slot_offsets(face):
        """Per-slot [H, W, 3] target offsets: all 4 (static mode) or the
        one traced ``slot`` (temporal mode)."""
        if slot is None:
            return [_select_by_face(layers[:, i, :], face) for i in range(4)]
        lay = jax.lax.dynamic_index_in_dim(
            layers, slot, axis=1, keepdims=False
        )  # [6, 3]
        return [_select_by_face(lay, face)]

    def indirect_from(point, porigin, pcoords, viewer, active, depth_left):
        face = _face_index(cube_face_normal(point, porigin))
        # All slots' target coords are known here (face + layer offsets),
        # so their states ride ONE batched in-kernel lookup.
        offs = slot_offsets(face)
        slot_cl = [jnp.maximum(pcoords + off, 0) for off in offs]
        slot_states = cell_state_batch(
            [(cl, active) for cl in slot_cl], prepped, grid_size=n,
            width=width, height=height, interpret=interpret,
        )
        slots = []
        queries = []
        for off, n_cl, n_state in zip(offs, slot_cl, slot_states):
            n_coords = pcoords + off
            n_origin = (
                n_coords.astype(jnp.float32) * cell
                + cell * 0.5
                - HALF_CUBE_SIZE
            )
            n_dir = off.astype(jnp.float32)  # unnormalized, as in the reference
            t_near, t_far = ray_cube_intersect(point, n_dir, n_origin, vis_half)
            ok = active & (n_state == 1) & (t_near <= t_far) & (t_far >= 0.0)
            n_point = point + n_dir * t_near[..., None]
            slots.append((n_cl, n_origin, n_point, ok))
            queries.append(
                (n_point, jnp.broadcast_to(light, point.shape), n_cl, ok)
            )

        occs = shadow_occlusion_batch(
            cam, queries, prepped, grid_size=n, width=width, height=height,
            interpret=interpret,
        )
        total = jnp.zeros_like(point)
        for (n_cl, n_origin, n_point, ok), occluded in zip(slots, occs):
            occ = jnp.where(occluded, jnp.float32(0.0095), jnp.float32(1.0))
            reflected = occ[..., None] * shade(
                n_point, n_origin, n_cl, point, lmag3, light
            )
            reflected = reflected + emis
            if depth_left > 1:
                reflected = reflected + indirect_from(
                    n_point, n_origin, n_cl, point, ok, depth_left - 1
                )
            bounce = shade(point, porigin, pcoords, viewer, reflected, n_point)
            total = total + jnp.where(ok[..., None], bounce, 0.0)
        if slot is not None:
            total = total * jnp.float32(4.0)  # unbiased 1-of-4 estimator
        return total

    if slot is not None and int(bounces) > 1:
        raise ValueError("temporal slot sampling requires bounces == 1")
    return indirect_from(q, origin, coords, o, found, max(1, int(bounces)))


def lighting_passes(cam, q, origin, coords, found, prepped, *,
                    grid_size, width, height, soft_k=1, jitter_k=None,
                    gi=False, gi_slot=None, interpret=False,
                    blocked=False):
    """Soft-shadow occlusion + one-bounce GI with EVERY occlusion query
    of the frame batched into ONE multi-query launch.

    The GI slots' occlusion queries depend only on hit geometry (face +
    layer offset), not on the neighbour's cell state — the state only
    gates whether the slot CONTRIBUTES.  Hoisting them ahead of the
    state lookup lets the ``soft_k`` jittered shadow samples and the GI
    slots share one `_make_shadow_kernel` traversal (its machinery and
    row loads amortize over all queries); occlusion values on
    state-rejected lanes are discarded by the same ``ok`` mask the
    old two-launch path applied.  Covers ``bounces == 1`` (and the
    temporal single-slot mode); deeper recursion uses
    ``indirect_bounce`` unchanged.

    Returns ``(occl [H, W] or None, gi_rgb [H, W, 3] or None)``.
    With ``blocked=True`` every per-pixel input/output is tile-blocked
    [T·SUB, LANE(, 3)] instead (zero layout conversions end to end; the
    jitter hash values are pointwise-identical, so the math matches the
    image-layout path pixel for pixel).
    """
    from . import brdf
    from .intersect import (
        FULL_CUBE_SIZE,
        HALF_CUBE_SIZE,
        cube_face_normal,
        ray_cube_intersect,
    )
    from .renderer import _INDIRECT_LAYERS, _face_index

    n = grid_size
    light = cam[P_LIGHT : P_LIGHT + 3]
    o = cam[P_O : P_O + 3]
    queries = []

    jitter_uv = None
    if blocked:
        # Blocked-layout pixel uvs for the jitter hash (pointwise equal
        # to the image-path uvs).
        px, py, _ = blocked_pixels(width, height)
        jitter_uv = (
            (px.astype(_F32) + 0.5) / cam[P_WIN],
            1.0 - (py.astype(_F32) + cam[P_ROW0] + 0.5) / cam[P_WIN + 1],
        )

    # --- soft / hard direct-shadow queries (direct_occlusion semantics) ---
    n_soft = 0
    if soft_k is not None:
        if jitter_k is not None:
            target = light + soft_shadow_jitter(
                cam, jitter_k, width, height, nk=max(1, soft_k),
                uv=jitter_uv,
            )
            queries.append((q, target, coords, found))
            n_soft = 1
        else:
            for kk in range(max(1, soft_k)):
                if soft_k > 1:
                    target = light + soft_shadow_jitter(
                        cam, kk, width, height, uv=jitter_uv
                    )
                else:
                    target = jnp.broadcast_to(light, q.shape)
                queries.append((q, target, coords, found))
            n_soft = max(1, soft_k)

    # --- GI slot geometry + hoisted occlusion queries ------------------
    slots = []
    if gi:
        cell = jnp.float32(FULL_CUBE_SIZE / n)
        vis_half = cell * cam[P_CELLMUL] * 0.5
        layers = jnp.asarray(_INDIRECT_LAYERS)  # [6, 4, 3]
        face = _face_index(cube_face_normal(q, origin))

        def _select_by_face(table):
            out = jnp.zeros(face.shape + (3,), table.dtype)
            for f in range(6):
                out = jnp.where((face == f)[..., None], table[f], out)
            return out

        if gi_slot is None:
            offs = [_select_by_face(layers[:, i, :]) for i in range(4)]
        else:
            lay = jax.lax.dynamic_index_in_dim(
                layers, gi_slot, axis=1, keepdims=False
            )
            offs = [_select_by_face(lay)]
        for off in offs:
            n_coords = coords + off
            n_cl = jnp.maximum(n_coords, 0)
            n_origin = (
                n_coords.astype(jnp.float32) * cell
                + cell * 0.5
                - HALF_CUBE_SIZE
            )
            n_dir = off.astype(jnp.float32)  # unnormalized, as in the ref
            t_near, t_far = ray_cube_intersect(q, n_dir, n_origin, vis_half)
            ok_geo = found & (t_near <= t_far) & (t_far >= 0.0)
            n_point = q + n_dir * t_near[..., None]
            slots.append((n_cl, n_origin, n_point, ok_geo))
            queries.append(
                (n_point, jnp.broadcast_to(light, q.shape), n_cl, ok_geo)
            )

    if not queries:
        return None, None

    occs = shadow_occlusion_batch(
        cam, queries, prepped, grid_size=n, width=width, height=height,
        interpret=interpret, blocked=blocked,
    )

    occl = None
    if n_soft:
        occ_sum = jnp.zeros(found.shape, jnp.float32)
        for occluded in occs[:n_soft]:
            occ_sum = occ_sum + jnp.where(
                occluded, jnp.float32(0.0095), jnp.float32(1.0)
            )
        occl = occ_sum / jnp.float32(
            1 if jitter_k is not None else max(1, soft_k)
        )

    gi_rgb = None
    if gi:
        lmag3 = jnp.broadcast_to(cam[P_LMAG], q.shape)
        emis = cam[P_EMIS : P_EMIS + 3] * cam[P_EMISS]

        def shade(point, porigin, pcoords, viewer, radiance, light_point):
            return brdf.calculate_lighting_at(
                point, porigin, pcoords, viewer, radiance, light_point,
                grid_size=n, roughness=cam[P_ROUGH],
                material_color=cam[P_MATC : P_MATC + 3],
                base_reflectivity=cam[P_REFL : P_REFL + 3],
            )

        slot_states = cell_state_batch(
            [(n_cl, ok_geo) for n_cl, _, _, ok_geo in slots], prepped,
            grid_size=n, width=width, height=height, interpret=interpret,
            blocked=blocked,
        )
        total = jnp.zeros_like(q)
        for (n_cl, n_origin, n_point, ok_geo), st, occluded in zip(
            slots, slot_states, occs[n_soft:]
        ):
            ok = ok_geo & (st == 1)
            occ = jnp.where(occluded, jnp.float32(0.0095), jnp.float32(1.0))
            reflected = occ[..., None] * shade(
                n_point, n_origin, n_cl, q, lmag3, light
            ) + emis
            bounce = shade(q, origin, coords, o, reflected, n_point)
            total = total + jnp.where(ok[..., None], bounce, 0.0)
        if gi_slot is not None:
            total = total * jnp.float32(4.0)  # unbiased 1-of-4 estimator
        gi_rgb = total

    return occl, gi_rgb


def blocked_pixels(width, height):
    """Per-pixel (px, py, onscreen) in the TILE-BLOCKED layout — the
    trace-time-constant inverse of ``_to_blocks``'s pixel permutation
    (matches the kernels' in-register pixel math,
    render_fast._make_kernel.pixel_rays).  Lets every elementwise stage
    of the extended-lighting pipeline run directly on blocked arrays:
    the blocked layout is a pure pixel permutation, so all per-pixel
    math is layout-agnostic once the coordinates themselves are blocked."""
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    t = jnp.arange(nbx * nby, dtype=jnp.int32)[:, None, None]
    i = (
        jnp.arange(SUB, dtype=jnp.int32)[None, :, None] * LANE
        + jnp.arange(LANE, dtype=jnp.int32)[None, None, :]
    )
    px = (t % nbx) * BW + i % BW
    py = (t // nbx) * BH + i // BW
    on = (px < width) & (py < height)
    px = jnp.minimum(px, width - 1)
    py = jnp.minimum(py, height - 1)

    def rs(a):
        return a.reshape(nbx * nby * SUB, LANE)

    return rs(px), rs(py), rs(on)


def hit_geometry_blocked(cam, idx_blk, t_blk, *, grid_size, width, height):
    """``hit_geometry`` on tile-blocked inputs/outputs (zero layout
    conversions; identical formulas on permuted pixels)."""
    from .intersect import FULL_CUBE_SIZE, HALF_CUBE_SIZE

    n = grid_size
    px, py, _ = blocked_pixels(width, height)
    found = idx_blk >= 0
    win_w = cam[P_WIN]
    win_h = cam[P_WIN + 1]
    ux = (px.astype(_F32) + 0.5) / win_w
    uy = 1.0 - (py.astype(_F32) + cam[P_ROW0] + 0.5) / win_h
    rx = (ux - 0.5) * (win_w / win_h)
    ry = uy - 0.5
    rz = jnp.full_like(rx, -0.5 * COT_HALF_FOV)
    norm = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
    ray_cam = jnp.stack([rx * norm, ry * norm, rz * norm], axis=-1)
    rot = jnp.stack(
        [cam[P_R00 : P_R00 + 3], cam[P_R00 + 3 : P_R00 + 6],
         cam[P_R00 + 6 : P_R00 + 9]]
    )
    d = ray_cam @ rot.T
    o = cam[P_O : P_O + 3]
    t1v = (-0.5 - o) / d
    t2v = (0.5 - o) / d
    tf = jnp.min(jnp.maximum(t1v, t2v), axis=-1)
    tn = jnp.max(jnp.minimum(t1v, t2v), axis=-1)
    crossed = (tn <= tf) & (tf >= 0.0)

    q = o + d * t_blk[..., None]
    hxv = idx_blk % n
    hyv = (idx_blk // n) % n
    hzv = idx_blk // (n * n)
    coords = jnp.stack([hxv, hyv, hzv], axis=-1)
    cell = jnp.float32(FULL_CUBE_SIZE / n)
    origin = (
        coords.astype(jnp.float32) * cell + cell * 0.5 - HALF_CUBE_SIZE
    )
    return q, origin, coords, found, jnp.where(crossed, tf, 0.0), d


def hit_geometry(cam, idx_img, t_img, *, grid_size, width, height):
    """(q, origin, coords, found, tf_miss) from a composited hit
    image — the shared XLA geometry for shadows/GI/shading."""
    from .intersect import FULL_CUBE_SIZE, HALF_CUBE_SIZE

    n = grid_size
    found = idx_img >= 0
    win_w = cam[P_WIN]
    win_h = cam[P_WIN + 1]
    pxs = jnp.arange(width, dtype=jnp.float32)[None, :]
    pys = jnp.arange(height, dtype=jnp.float32)[:, None]
    ux = (pxs + 0.5) / win_w + jnp.zeros((height, 1), jnp.float32)
    uy = (
        1.0 - (pys + cam[P_ROW0] + 0.5) / win_h
        + jnp.zeros((1, width), jnp.float32)
    )
    rx = (ux - 0.5) * (win_w / win_h)
    ry = uy - 0.5
    rz = jnp.full_like(rx, -0.5 * COT_HALF_FOV)
    norm = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
    ray_cam = jnp.stack([rx * norm, ry * norm, rz * norm], axis=-1)
    rot = jnp.stack(
        [cam[P_R00 : P_R00 + 3], cam[P_R00 + 3 : P_R00 + 6],
         cam[P_R00 + 6 : P_R00 + 9]]
    )
    d = ray_cam @ rot.T
    o = cam[P_O : P_O + 3]
    t1v = (-0.5 - o) / d
    t2v = (0.5 - o) / d
    tf = jnp.min(jnp.maximum(t1v, t2v), axis=-1)
    tn = jnp.max(jnp.minimum(t1v, t2v), axis=-1)
    crossed = (tn <= tf) & (tf >= 0.0)

    q = o + d * t_img[..., None]
    hxv = idx_img % n
    hyv = (idx_img // n) % n
    hzv = idx_img // (n * n)
    coords = jnp.stack([hxv, hyv, hzv], axis=-1)
    cell = jnp.float32(FULL_CUBE_SIZE / n)
    origin = (
        coords.astype(jnp.float32) * cell + cell * 0.5 - HALF_CUBE_SIZE
    )
    return q, origin, coords, found, jnp.where(crossed, tf, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "width", "height", "shadow", "interpret", "total_states",
        "soft_shadow_samples", "indirect", "indirect_bounces", "slab_planes",
        "x_chunk_cells",
    ),
)
def raytrace_sliced(
    vol,      # uint32 [W, Z, Y] canonical packed volume (visibility)
    cam,      # f32 [P_LEN] packed camera/material params
    ages=None,  # optional uint32 [B, W, Z, Y] age bit-planes
    *,
    grid_size: int,
    width: int,
    height: int,
    shadow: bool = True,
    interpret: bool = False,
    total_states: int = 2,
    soft_shadow_samples: int = 1,
    indirect: bool = False,
    indirect_bounces: int = 1,
    slab_planes: int | None = None,  # override for tests (multiple of 32)
    x_chunk_cells: int | None = None,  # override for tests (32/64/128/256)
    sample_idx=None,  # traced i32: temporally-amortized soft/GI sampling
):
    """Trace all pixels of an n > 256 volume via z-slab decomposition.
    Returns (light_rgb [H,W,3], depth [H,W], hit_idx [H,W]) — the same
    contract as render_fast.raytrace_tiles.  Emissive radiance is NOT
    added here (the wrapper owns it, renderer_fast.trace_shaded).

    ``sample_idx``: traced frame counter.  When given, soft shadows and
    GI each evaluate ONE rotating sample per frame (direct_occlusion's
    ``jitter_k`` / indirect_bounce's ``slot``) so the temporal EMA
    converges to the full multi-sample result at a fraction of the
    per-frame sweep cost."""
    from . import brdf

    n = grid_size
    if n > MAX_SLICED_GRID:
        raise ValueError(f"sliced fast path supports grid_size ≤ {MAX_SLICED_GRID}")
    bricks, bxw = brick_layout(n, slab_planes, x_chunk_cells)
    age_bits = 0 if ages is None else int(ages.shape[0])

    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby

    blk_f32 = jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32)
    blk_i32 = jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((SUB, LANE), lambda t: (t, 0))
    ray_scratch = [
        pltpu.VMEM((SUB, LANE), jnp.float32) for _ in range(8)
    ] + [pltpu.VMEM((SUB, LANE), jnp.int32)]  # r_flags

    # ---- primary pass: one lax.scan per brick SHAPE (the kernel is traced
    # once; z0/x0w ride as runtime scalars), running min-t composite —
    # exact because bricks partition the cells, and the strict `<` keeps
    # the first-found brick on (measure-zero) ties like the previous
    # stacked argmin did.  `prep_slabs`' groups are shared with the
    # occlusion/GI passes below, so each brick is relaid out once.
    groups = prep_slabs(vol, bricks, n, bxw)

    def _age_stack(group):
        """Stack per-brick age-plane layouts in the group's brick order."""
        y_pad = -(-n // LANE) * LANE
        parts = []
        for z0, zext, gi in group.bricks:
            a = ages[:, :, z0 : z0 + zext, :]
            words = n // 32
            if gi is not None:
                x0w = gi * bxw
                a = a[:, x0w : x0w + bxw]
                words = bxw
                if a.shape[1] < bxw:
                    a = jnp.pad(
                        a, ((0, 0), (0, bxw - a.shape[1]), (0, 0), (0, 0))
                    )
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, y_pad - n)))
            parts.append(
                a.transpose(0, 2, 1, 3).reshape(
                    age_bits * zext, words * (y_pad // LANE), LANE
                )
            )
        return jnp.stack(parts)

    t_hit = jnp.full((tiles * SUB, LANE), jnp.inf, jnp.float32)
    idx = jnp.full((tiles * SUB, LANE), -1, jnp.int32)
    age_blk = jnp.zeros((tiles * SUB, LANE), jnp.int32) if age_bits else None
    # Front-to-back brick order for the dominant view direction: the
    # stacks are built in ascending z; for a -z-dominant camera iterate
    # them reversed (traced select in _scan_bricks) so the best-t carry
    # deactivates latched rays as early as possible.
    dz_center = -cam[P_R00 + 8]
    brick_reverse = dz_center < 0.0
    for group in groups:
        kernel = _make_primary_kernel(
            n, group.zext, width, height, age_bits, group.xw
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_shape = [blk_f32, blk_i32]
        out_specs = [out_spec, out_spec]
        scratch = [
            pltpu.VMEM((SUB, LANE), jnp.int32),    # f_a
            pltpu.VMEM((SUB, LANE), jnp.float32),  # t_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hx_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hy_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hz_a
        ] + list(ray_scratch)
        extra = None
        if age_bits:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shape.append(blk_i32)
            out_specs.append(out_spec)
            scratch.append(pltpu.VMEM((SUB, LANE), jnp.int32))  # age_ref
            extra = _age_stack(group)
        # Cross-brick best-t carry (see the kernel's clamp note).
        in_specs.append(pl.BlockSpec((SUB, LANE), lambda t: (t, 0)))
        scratch.append(pltpu.SMEM((1,), jnp.int32))  # sticky any-alive

        def call(vol2d, col, c2, zrange, *rest, acc=None, kernel=kernel,
                 in_specs=in_specs, out_shape=out_shape,
                 out_specs=out_specs, scratch=scratch, group=group):
            inputs = [cam, zrange, vol2d, col, c2] + list(rest) + [acc[0]]

            def run():
                return tuple(
                    pl.pallas_call(
                        kernel,
                        grid=(tiles,),
                        out_shape=out_shape,
                        in_specs=in_specs,
                        out_specs=out_specs,
                        scratch_shapes=scratch,
                        interpret=interpret,
                        compiler_params=_SLAB_PARAMS,
                    )(*inputs)
                )

            def skip():
                # Neutral for the min-t composite: no hits.
                outs = [
                    jnp.zeros((tiles * SUB, LANE), jnp.float32),
                    jnp.full((tiles * SUB, LANE), -1, jnp.int32),
                ]
                if age_bits:
                    outs.append(jnp.zeros((tiles * SUB, LANE), jnp.int32))
                return tuple(outs)

            launch = _brick_nonempty(zrange) & _brick_visible(
                cam, zrange, group.zext, group.xw, n
            )
            out = jax.lax.cond(launch, run, skip)
            return out

        def merge(best, outs):
            t_b, i_b = outs[0], outs[1]
            better = (i_b >= 0) & (t_b < best[0])
            new = (
                jnp.where(better, t_b, best[0]),
                jnp.where(better, i_b, best[1]),
            )
            if age_bits:
                new = new + (jnp.where(better, outs[2], best[2]),)
            return new

        init = (t_hit, idx) + ((age_blk,) if age_bits else ())
        merged = _scan_bricks(group, call, merge, init, extra=extra,
                              carry_to_call=True, reverse=brick_reverse)
        t_hit, idx = merged[0], merged[1]
        if age_bits:
            age_blk = merged[2]
    # Unfound pixels carry t=+inf from the merge init; zero it so the
    # XLA geometry below stays finite (their outputs are found-masked).
    t_hit = jnp.where(idx >= 0, t_hit, 0.0)

    # ---- geometry + shadows + shading in XLA ---------------------------
    idx_img = _from_blocks(idx, width, height)
    t_img = _from_blocks(t_hit, width, height)
    q, origin, coords, found, tf_miss = hit_geometry(
        cam, idx_img, t_img, grid_size=n, width=width, height=height
    )
    depth = jnp.where(found, t_img, tf_miss)

    prepped = groups  # shared with the primary pass (one relayout per brick)
    gi_slot = None
    gi_bounces = indirect_bounces
    if indirect and sample_idx is not None:
        gi_slot = (sample_idx % 4).astype(jnp.int32)
        gi_bounces = 1
    jitter_k = None
    if shadow and sample_idx is not None and soft_shadow_samples > 1:
        jitter_k = (sample_idx % soft_shadow_samples).astype(jnp.int32)

    gi_rgb = None
    if (not indirect) or gi_bounces == 1:
        # Single-bounce configs: all occlusion queries in ONE launch.
        occl, gi_rgb = lighting_passes(
            cam, q, origin, coords, found, prepped,
            grid_size=n, width=width, height=height,
            soft_k=soft_shadow_samples if shadow else None,
            jitter_k=jitter_k, gi=indirect, gi_slot=gi_slot,
            interpret=interpret,
        )
    else:
        occl = (
            direct_occlusion(
                cam, q, coords, found, prepped,
                grid_size=n, width=width, height=height,
                soft_k=soft_shadow_samples, jitter_k=jitter_k,
                interpret=interpret,
            )
            if shadow
            else None
        )
    if occl is None:
        occl = jnp.ones((height, width), jnp.float32)

    light = cam[P_LIGHT : P_LIGHT + 3]
    o = cam[P_O : P_O + 3]
    color = brdf.calculate_lighting_at(
        q, origin, coords, o,
        jnp.broadcast_to(cam[P_LMAG], q.shape),  # [..., 3] radiance
        light,
        grid_size=n,
        roughness=cam[P_ROUGH],
        material_color=cam[P_MATC : P_MATC + 3],
        base_reflectivity=cam[P_REFL : P_REFL + 3],
    )
    if age_bits:
        age_img = _from_blocks(age_blk, width, height)
        fade = jnp.clip(
            (total_states - age_img).astype(jnp.float32)
            / jnp.float32(total_states - 1),
            0.0,
            1.0,
        )
        occl = occl * fade
    out = jnp.maximum(color, 0.0) * occl[..., None]
    if indirect:
        if gi_rgb is None:
            gi_rgb = indirect_bounce(
                vol, cam, q, origin, coords, found, prepped,
                grid_size=n, width=width, height=height,
                interpret=interpret, bounces=gi_bounces, slot=gi_slot,
            )
        out = out + gi_rgb
    rgb = jnp.where(found[..., None], out, 0.0)
    return rgb, depth, idx_img
