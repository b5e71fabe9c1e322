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

Indirect lighting (one-bounce GI) is currently fused-path only (≤ 256³):
its neighbour recording needs z±1 planes around each hit, which crosses
slab boundaries.

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
    _store_ray,
)

# Sliced/bricked kernels carry a full z-slab of a >256-cubed volume in
# VMEM (8.4 MiB at 512-cubed) on top of the tile refs; Mosaic's default
# 16 MiB scoped-vmem cap OOMs at 512-cubed (measured: 22.5 MiB needed).
# v5e has 128 MiB of VMEM and these kernels stream almost nothing, so a
# 64 MiB cap is safe headroom for every brick shape up to 1024-cubed.
_SLAB_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

__all__ = ["raytrace_sliced", "MAX_SLICED_GRID", "slab_extent"]

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

MAX_SLICED_GRID = 1024  # reference UI ceiling (main_pathtraced.js:274-277)
X_BRICK_CELLS = 256     # brick x extent for n > 512 (= one coarse group)
_SLAB_BYTES = 8 * 2**20  # VMEM budget for one slab's packed words


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
    sweep, _ = _make_traversal(n, zext, age_bits, x_words)
    inv_n = 1.0 / n
    half = 0.5

    # No mip1 prefilter in the sliced path either: a 512³ frame traces
    # ~2·nc·8 pl.when regions per slab with it, which overflowed XLA's
    # pass stack on the interpret-mode differential tests.  The fused
    # ≤ 256³ kernel (the north-star path) keeps the prefilter.
    def kernel(cam, zrange, vol, coarse, coarse2, *rest):
        rest = list(rest)
        ages = rest.pop(0) if age_bits else None
        out_t, out_idx = rest[:2]
        rest = rest[2:]
        out_age = rest.pop(0) if age_bits else None
        (f_a, t_a, hx_a, hy_a, hz_a,
         r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1,
         r_flags) = rest[:14]
        age_ref = rest[14] if age_bits else None
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
        tf = jnp.minimum(jnp.minimum(fx_, fy_), fz_)
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
        )
        out_t[:] = t_hit
        out_idx[:] = jnp.where(
            found, hx + hy * n + hz * n * n, jnp.full((SUB, LANE), -1, _I32)
        )
        if out_age is not None:
            out_age[:] = age_ref[:]

    return kernel


def _make_shadow_kernel(n, zext, x_words=None):
    sweep, _ = _make_traversal(n, zext, 0, x_words)
    inv_n = 1.0 / n

    # No mip1 prefilter here: occlusion launches are BATCHED (soft shadows,
    # GI slots — recursive GI traces ~4^b sweeps in one jit) and the
    # prefilter doubles each sweep's traced graph, which pushed the
    # two-bounce XLA program past reasonable compile bounds.
    def kernel(cam, zrange, sx, sy, sz, dx, dy, dz, t1, exx, exy, exz, act,
               vol, coarse, coarse2, out_occ,
               f_b, t_b, hx_b, hy_b, hz_b,
               r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags):
        rayrefs = (r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags)
        cell_half = inv_n * cam[P_CELLMUL] * 0.5
        _store_ray(
            rayrefs, sx[:], sy[:], sz[:], dx[:], dy[:], dz[:],
            jnp.zeros((SUB, LANE), _F32), t1[:], act[:] == 1,
        )
        occluded, _, _, _, _ = sweep(
            vol, coarse, coarse2, zrange, (f_b, t_b, hx_b, hy_b, hz_b),
            rayrefs, cell_half, (exx, exy, exz), False,
        )
        out_occ[:] = occluded.astype(_I32)

    return kernel


def _make_cellstate_kernel(n, zext, x_words=None):
    """Per-pixel cell-state lookup for arbitrary target coords, fetched
    in-kernel.

    Replaces the XLA `jnp.take` gathers of `intersect.get_cell_state`
    (2M pixels × 4 slots per GI level — the dominant cost of the
    decomposed indirect pass, ~85 ms/frame at 1080p) with the sweep's
    lane-gather word fetches: the volume stays in VMEM and each z-plane
    in the tile's (tight, coherent) target window costs one fetch chain.
    Exactness: the output bit replicates `state(max(coords, 0) mod n)` —
    the reference's clamp-then-wrap lookup semantics
    (pathtraced_fragment_clustered.wgsl:268-304; intersect.py:95-111).
    The GI layer slots are *edge-diagonal* offsets (wgsl:110-169), so
    lookups take absolute target coords — a 6-face-neighbour mask cannot
    express them.
    """
    _, fetch = _make_traversal(n, zext, 0, x_words)

    def kernel(zrange, cx_in, cy_in, cz_in, act_in, vol, out_bit):
        z0 = zrange[2]
        x0w = zrange[3] if x_words is not None else None
        zmin_c, zmax_c = zrange[0], zrange[1]  # occupied columns, slab-local
        act = act_in[:] == 1
        # Clamp-then-wrap target coords (intersect.py:95-111: coords are
        # pre-clamped ≥ 0 by the caller; lookup wraps modulo n per axis).
        tx = jnp.maximum(cx_in[:], 0) % n
        ty = jnp.maximum(cy_in[:], 0) % n
        tz = jnp.maximum(cz_in[:], 0) % n
        # Tile-level global-z window of the targets.
        big = jnp.int32(1 << 30)
        zlo = jnp.min(jnp.where(act, tz, big))
        zhi = jnp.max(jnp.where(act, tz, -big))

        out_bit[:] = jnp.zeros((SUB, LANE), _I32)
        for c8 in range(zext // 8):
            g8 = z0 + c8 * 8  # global z of this 8-plane group (traced)
            gate = (
                (zhi >= g8) & (zlo < g8 + 8)
                # Unoccupied coarse columns hold no set state bits —
                # skipping them leaves the bit 0, which equals fetching.
                & (zmax_c >= c8) & (zmin_c <= c8)
            )

            @pl.when(gate)
            def _(c8=c8):
                m = out_bit[:]
                for f in range(8):
                    k = c8 * 8 + f
                    g = z0 + k
                    b = fetch(vol, k, tx, ty, act, x0w)
                    m = m | jnp.where(tz == g, b, 0)
                out_bit[:] = m

    return kernel


def cell_state_batch(queries, prepped, *, grid_size, width, height,
                     interpret=False):
    """Cell states for a batch of per-pixel coordinate queries.

    ``queries``: list of (coords [H, W, 3] int32 (pre-clamped ≥ 0),
    active [H, W] bool).  Returns one int32 [H, W] state image per query
    with the reference's clamp-then-wrap addressing.  All queries run in
    ONE kernel launch per brick (grid = len(queries)·tiles); states OR
    over bricks (cells outside a brick contribute 0).
    """
    n = grid_size
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
    nq = len(queries)
    blk_i32 = jax.ShapeDtypeStruct((nq * tiles * SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((SUB, LANE), lambda t: (t, 0))

    cols = [[] for _ in range(4)]
    for coords, active in queries:
        parts = [
            _to_blocks(coords[..., 0], width, height),
            _to_blocks(coords[..., 1], width, height),
            _to_blocks(coords[..., 2], width, height),
            _to_blocks(active.astype(jnp.int32), width, height),
        ]
        for c, p in zip(cols, parts):
            c.append(p)
    args = [jnp.concatenate(c, axis=0) for c in cols]

    states = jnp.zeros((nq * tiles * SUB, LANE), jnp.int32)
    kernels = {}
    for zext, xw, vol2d, col, c2, zrange in prepped:
        key = (zext, xw)
        if key not in kernels:
            kernels[key] = _make_cellstate_kernel(n, zext, xw)
        st = pl.pallas_call(
            kernels[key],
            grid=(nq * tiles,),
            out_shape=blk_i32,
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec((SUB, LANE), lambda t: (t, 0))] * 4
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
            ),
            out_specs=out_spec,
            interpret=interpret,
            compiler_params=_SLAB_PARAMS,
        )(zrange, *args, vol2d)
        states = states | st
    per_q = states.reshape(nq, tiles * SUB, LANE)
    return [_from_blocks(per_q[i], width, height) for i in range(nq)]


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


def _slab_occupancy(coarse_full, z0, zext, n, x0w=None, x_words=None):
    """(column rows, supercolumn rows, zrange) for one brick; zrange is
    [zmin, zmax, z0(, x0w)] with slab-local column indices and the
    brick's global z / x-word offsets as runtime scalars
    (render_fast._make_traversal).  Dilation runs on the FULL rows
    before chunk extraction so cross-chunk carries are kept."""
    yc = n // 8
    sl = coarse_full[z0 // 8 : (z0 + zext) // 8]
    col = dilate_occupancy(sl, dilate_z=False, yc=yc, dilate_y=False)
    nc_groups = (zext // 8) // 4
    c4 = sl[: nc_groups * 4].reshape(nc_groups, 4, -1)
    c2 = c4[:, 0] | c4[:, 1] | c4[:, 2] | c4[:, 3]
    c2 = dilate_occupancy(c2, yc=yc)
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
    """Per-brick kernel operands (packed layout + occupancy structures),
    computed once per frame and shared across every occlusion pass.
    ``bricks``: (z0, zext) pairs or (z0, zext, gi) triples (gi = x-group,
    None = full-x)."""
    coarse_full = coarse_occupancy(vol)
    out = []
    for brick in bricks:
        z0, zext = brick[:2]
        gi = brick[2] if len(brick) > 2 else None
        x0w = None if gi is None else gi * x_words
        xw = None if gi is None else x_words
        vol2d = _vol2d_slab(vol, z0, zext, grid_size, x0w, xw)
        col, c2, zrange = _slab_occupancy(
            coarse_full, z0, zext, grid_size, x0w, xw
        )
        out.append((zext, xw, vol2d, col, c2, zrange))
    return out


def shadow_occlusion_batch(cam, queries, prepped, *, grid_size, width,
                           height, interpret=False):
    """Cell-exact occlusion for a BATCH of per-pixel ray queries.

    ``queries``: list of (start [H,W,3], target [H,W,3], excl [H,W,3] int,
    active [H,W] bool) — e.g. the k jittered soft-shadow samples, or the
    4 indirect-bounce slots.  All queries run in ONE kernel launch per
    slab (grid = len(queries)·tiles): batching amortizes the launch and
    the per-sweep fixed machinery that dominated per-query launches.
    Returns list of bool [H, W] occlusion masks (ORed over slabs).
    """
    n = grid_size
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
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
            _to_blocks(start[..., 0], width, height),
            _to_blocks(start[..., 1], width, height),
            _to_blocks(start[..., 2], width, height),
            _to_blocks(sd[..., 0], width, height, fill=1),
            _to_blocks(sd[..., 1], width, height, fill=1),
            _to_blocks(sd[..., 2], width, height, fill=1),
            _to_blocks(sh_tf, width, height),
            _to_blocks(excl[..., 0], width, height),
            _to_blocks(excl[..., 1], width, height),
            _to_blocks(excl[..., 2], width, height),
            _to_blocks(active.astype(jnp.int32), width, height),
        ]
        for c, p in zip(cols, parts):
            c.append(p)
    args = [jnp.concatenate(c, axis=0) for c in cols]

    occluded = jnp.zeros((nq * tiles * SUB, LANE), jnp.int32)
    kernels = {}  # (zext, xw) → kernel; equal-shape bricks share a compile
    for zext, xw, vol2d, col, c2, zrange in prepped:
        key = (zext, xw)
        if key not in kernels:
            kernels[key] = _make_shadow_kernel(n, zext, xw)
        kernel = kernels[key]
        occ = pl.pallas_call(
            kernel,
            grid=(nq * tiles,),
            out_shape=blk_i32,
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                + [pl.BlockSpec((SUB, LANE), lambda t: (t, 0))] * 11
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            ),
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((SUB, LANE), jnp.float32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
            ] + list(ray_scratch),
            interpret=interpret,
            compiler_params=_SLAB_PARAMS,
        )(cam, zrange, *args, vol2d, col, c2)
        occluded = occluded | occ
    per_q = occluded.reshape(nq, tiles * SUB, LANE)
    return [_from_blocks(per_q[i], width, height) == 1 for i in range(nq)]


def soft_shadow_jitter(cam, kk, width, height):
    """Jittered area-light offset for soft-shadow sample ``kk`` — the
    reference's sin-fract hash over global-window UVs (n1rand,
    wgsl:171-180; renderer.py:218-222).  Returns [H, W, 3]."""
    win_w = cam[P_WIN]
    win_h = cam[P_WIN + 1]
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

    rad2 = 2.0 * cam[P_LRAD]
    return jnp.stack(
        [
            j1(jnp.float32(0.17 * kk + 0.05)),
            j1(jnp.float32(0.29 * kk + 0.11)),
            j1(jnp.float32(0.41 * kk + 0.23)),
        ],
        axis=-1,
    ) * rad2


def direct_occlusion(cam, q, coords, found, prepped, *,
                     grid_size, width, height, soft_k=1, interpret=False):
    """Direct-light occlusion quotient [H, W]: hard (one kernel ray per
    pixel) or soft (``soft_k`` jittered area-light samples averaged,
    renderer.py:212-224); all samples batched into one launch."""
    light = cam[P_LIGHT : P_LIGHT + 3]
    queries = []
    for kk in range(max(1, soft_k)):
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
                    grid_size, width, height, interpret=False, bounces=1):
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
    frame on `get_cell_state`'s `jnp.take` over 2M pixels × 4 slots."""
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

    def indirect_from(point, porigin, pcoords, viewer, active, depth_left):
        face = _face_index(cube_face_normal(point, porigin))
        # All 4 slots' target coords are known here (face + layer
        # offsets), so their states ride ONE batched in-kernel lookup.
        slot_cl = []
        for i in range(4):
            off = jnp.take(layers[:, i, :], face, axis=0)   # [H, W, 3] i32
            slot_cl.append(jnp.maximum(pcoords + off, 0))
        slot_states = cell_state_batch(
            [(cl, active) for cl in slot_cl], prepped, grid_size=n,
            width=width, height=height, interpret=interpret,
        )
        slots = []
        queries = []
        for i in range(4):
            off = jnp.take(layers[:, i, :], face, axis=0)   # [H, W, 3] i32
            n_coords = pcoords + off
            n_cl = slot_cl[i]
            n_state = slot_states[i]
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
        return total

    return indirect_from(q, origin, coords, o, found, max(1, int(bounces)))


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
):
    """Trace all pixels of an n > 256 volume via z-slab decomposition.
    Returns (light_rgb [H,W,3], depth [H,W], hit_idx [H,W]) — the same
    contract as render_fast.raytrace_tiles.  Emissive radiance is NOT
    added here (the wrapper owns it, renderer_fast.trace_shaded)."""
    from . import brdf

    n = grid_size
    if n > MAX_SLICED_GRID:
        raise ValueError(f"sliced fast path supports grid_size ≤ {MAX_SLICED_GRID}")
    bricks, bxw = brick_layout(n, slab_planes, x_chunk_cells)
    age_bits = 0 if ages is None else int(ages.shape[0])

    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
    coarse_full = coarse_occupancy(vol)

    blk_f32 = jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32)
    blk_i32 = jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.int32)
    out_spec = pl.BlockSpec((SUB, LANE), lambda t: (t, 0))
    ray_scratch = [
        pltpu.VMEM((SUB, LANE), jnp.float32) for _ in range(8)
    ] + [pltpu.VMEM((SUB, LANE), jnp.int32)]  # r_flags

    # ---- primary pass: one launch per brick (equal-shape bricks share a
    # single compiled kernel — z0/x0w are runtime scalars), min-t composite
    t_parts, idx_parts, age_parts = [], [], []
    primary_kernels = {}
    for z0, zext, gi in bricks:
        x0w = None if gi is None else gi * bxw
        xw = None if gi is None else bxw
        vol2d = _vol2d_slab(vol, z0, zext, n, x0w, xw)
        col, c2, zrange = _slab_occupancy(coarse_full, z0, zext, n, x0w, xw)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs = [cam, zrange, vol2d, col, c2]
        out_shape = [blk_f32, blk_i32]
        out_specs = [out_spec, out_spec]
        scratch = [
            pltpu.VMEM((SUB, LANE), jnp.int32),    # f_a
            pltpu.VMEM((SUB, LANE), jnp.float32),  # t_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hx_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hy_a
            pltpu.VMEM((SUB, LANE), jnp.int32),    # hz_a
        ] + list(ray_scratch)
        if age_bits:
            a = ages[:, :, z0 : z0 + zext, :]
            words = n // 32
            if x0w is not None:
                a = a[:, x0w : x0w + xw]
                words = xw
                if a.shape[1] < xw:
                    a = jnp.pad(
                        a, ((0, 0), (0, xw - a.shape[1]), (0, 0), (0, 0))
                    )
            y_pad = -(-n // LANE) * LANE
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, y_pad - n)))
            a = a.transpose(0, 2, 1, 3).reshape(
                age_bits * zext, words * (y_pad // LANE), LANE
            )
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            inputs.append(a)
            out_shape.append(blk_i32)
            out_specs.append(out_spec)
            scratch.append(pltpu.VMEM((SUB, LANE), jnp.int32))  # age_ref
        key = (zext, xw)
        if key not in primary_kernels:
            primary_kernels[key] = _make_primary_kernel(
                n, zext, width, height, age_bits, xw
            )
        kernel = primary_kernels[key]
        outs = pl.pallas_call(
            kernel,
            grid=(tiles,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=_SLAB_PARAMS,
        )(*inputs)
        t_parts.append(outs[0])
        idx_parts.append(outs[1])
        if age_bits:
            age_parts.append(outs[2])

    t_all = jnp.stack(t_parts)      # [S, tiles·SUB, LANE]
    idx_all = jnp.stack(idx_parts)
    t_sel = jnp.where(idx_all >= 0, t_all, jnp.float32(jnp.inf))
    best = jnp.argmin(t_sel, axis=0)
    t_hit = jnp.take_along_axis(t_all, best[None], axis=0)[0]
    idx = jnp.take_along_axis(idx_all, best[None], axis=0)[0]
    found_blk = jnp.any(idx_all >= 0, axis=0)
    idx = jnp.where(found_blk, idx, -1)
    if age_bits:
        age_all = jnp.stack(age_parts)
        age_blk = jnp.take_along_axis(age_all, best[None], axis=0)[0]

    # ---- geometry + shadows + shading in XLA ---------------------------
    idx_img = _from_blocks(idx, width, height)
    t_img = _from_blocks(t_hit, width, height)
    q, origin, coords, found, tf_miss = hit_geometry(
        cam, idx_img, t_img, grid_size=n, width=width, height=height
    )
    depth = jnp.where(found, t_img, tf_miss)

    prepped = None
    if shadow or indirect:
        prepped = prep_slabs(vol, bricks, n, bxw)
    if shadow:
        occl = direct_occlusion(
            cam, q, coords, found, prepped,
            grid_size=n, width=width, height=height,
            soft_k=soft_shadow_samples, interpret=interpret,
        )
    else:
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
        out = out + indirect_bounce(
            vol, cam, q, origin, coords, found, prepped,
            grid_size=n, width=width, height=height,
            interpret=interpret, bounces=indirect_bounces,
        )
    rgb = jnp.where(found[..., None], out, 0.0)
    return rgb, depth, idx_img
