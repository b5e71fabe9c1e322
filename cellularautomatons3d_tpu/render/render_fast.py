"""Fast path: fused Pallas render kernel (two-level DDA + empty-space skip).

This is the TPU-native redesign of the fragment shader's hot loop — not a
translation.  Where pathtraced_fragment_clustered.wgsl:682-741 marches each
pixel with 35 stochastic samples and per-sample random buffer loads (which
on TPU would be 70M+ unvectorizable gathers per 1080p frame), this kernel:

* keeps the whole bit-packed volume (≤ 2 MiB at 256³) resident in VMEM;
* traverses **exact z-plane DDA** columns instead of stochastic samples —
  deterministic first hits, no noise to accumulate away;
* skips empty space with the 8× coarse occupancy mip (`ops/occupancy.py`)
  — one 32-entry lane-gather per coarse column — and only on occupied
  blocks refines through the fine volume (the "per-cluster occupancy
  skipping" the reference never implemented, SURVEY.md §5);
* resolves shadows with a second exact DDA sweep toward the light
  (replacing rayMarchShadow's 30 stochastic samples, wgsl:635-680) —
  cell-exact occlusion including the visible-cube test and start-cell
  exclusion (wgsl:665-674);
* evaluates the identical Cook-Torrance BRDF (wgsl:537-633) on hit lanes.

All data-dependent reads go through ``tpu.dynamic_gather`` (vreg-local
``take_along_axis`` along lanes), with slab rows broadcast across
sublanes; per-word fetches and the fine refinement are gated on scalar
any-reductions so untouched chunks cost nothing.

Known deviations from the reference renderer (use `renderer.py` for exact
reference behaviour): exact DDA instead of the stochastic march (denser,
noise-free sampling along z; rays nearly parallel to the z-planes probe
only one (x, y) cell per crossed column); hard shadows without the
stochastic start offset; temporal accumulation validates against the
stored hit-cell id rather than a reprojected-depth cell lookup
(equivalent for a static camera).

Restrictions (v1): grid_size ≤ 256 (volume must fit in VMEM); pixel count
padded to a multiple of 1024 by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["raytrace_tiles", "P_LEN", "pack_cam"]

import os as _os

# Tile shape: SUB×LANE pixel lanes per kernel invocation.  256×128 is the
# measured sweet spot (512 exceeds 16M scoped vmem); the env override
# exists for perf experiments only.
SUB = int(_os.environ.get("CA3D_SUB", "256"))
LANE = 128
TILE = SUB * LANE
# Screen-space tile footprint: pixels map to BW×BH blocks (not full-width
# strips) so rays within a tile are angularly coherent — tighter refinement
# triggers and gather windows.
BW = int(_os.environ.get("CA3D_BW", "256"))
BH = TILE // BW
assert BW * BH == TILE

# Sticky any-ray-alive group gating (see _make_traversal.sweep docstring):
# measured a net loss on the production scenes — opt-in only.
_ALIVE_GATE = _os.environ.get("CA3D_ALIVE_GATE", "0") == "1"

# cam/params vector layout (f32)
P_R00 = 0       # view rotation, row-major 3x3 (camera→world)
P_O = 9         # camera origin xyz
P_WIN = 12      # window w, h
P_LIGHT = 14    # light pos xyz
P_LMAG = 17     # light magnitude
P_CELLMUL = 18  # visible-cube fraction (uCellSize)
P_ROUGH = 19
P_REFL = 20     # base reflectivity rgb
P_MATC = 23     # material color rgb
P_LRAD = 26     # area-light radius (soft shadows)
P_EMIS = 27     # emissive color rgb
P_EMISS = 30    # emissive strength
P_TIME = 31     # elapsed time (jitter RNG seed)
P_ROW0 = 32     # global row of this shard's first pixel row (mesh render)
P_ALPHA = 33    # temporal EMA alpha (in-kernel composition)
P_GAMMA = 34    # gamma (presentation = pow(light, 1/gamma))
P_OVERLAY = 35  # 1.0 = left-half depth debug overlay
P_LEN = 40

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

COT_HALF_FOV = 1.3032254  # 1/tan(37.5°), wgsl:69
PI = 3.14159265359


def _any(mask) -> jnp.ndarray:
    return jnp.max(mask.astype(_I32)) > 0


def _or_fold_scalar(m) -> jnp.ndarray:
    """Bitwise OR of every element of an i32 [SUB, LANE] array as a traced
    scalar.  log2 strided sublane folds + lane rotations, then a max-reduce
    of the now-uniform array — one cheap reduction instead of one `_any`
    per tested bit (a full-tile reduction + branch costs ~hundreds of
    cycles; the sweep used to pay ~100 of them per tile)."""
    s = m.shape[0]
    while s > 1:
        h = s // 2
        m = m[:h] | m[h:s]
        s = h
    sh = LANE // 2
    while sh >= 1:
        m = m | pltpu.roll(m, sh, 1)
        sh //= 2
    return jnp.max(m)


def _all(mask) -> jnp.ndarray:
    return jnp.min(mask.astype(_I32)) > 0


def _lane_gather(chunk_2d, idx):
    """out[i, j] = chunk_2d[i, idx[i, j]] — vreg-local dynamic gather."""
    return jnp.take_along_axis(chunk_2d, idx, axis=1)


def _bcast_row(row_1xL, sub=None):
    # Mosaic only broadcasts a row across one vreg's sublanes (8 for 32-bit);
    # wider tiles replicate by concatenation.
    sub = SUB if sub is None else sub
    b = jnp.broadcast_to(row_1xL, (8, LANE))
    if sub == 8:
        return b
    return jnp.concatenate([b] * (sub // 8), axis=0)


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _to_blocks(x, width, height, fill=0):
    """[H, W] → tile-blocked [tiles·SUB, LANE] (inverse of _from_blocks)."""
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    x = jnp.pad(
        x, ((0, nby * BH - height), (0, nbx * BW - width)),
        constant_values=fill,
    )
    x = x.reshape(nby, BH, nbx, BW).transpose(0, 2, 1, 3)
    return x.reshape(nby * nbx * SUB, LANE)


def _from_blocks(x, width, height):
    """Tile-blocked [tiles·SUB, LANE] → [H, W] (BW×BH screen blocks in
    row-major block order)."""
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    x = x.reshape(nby, nbx, BH, BW).transpose(0, 2, 1, 3)
    return x.reshape(nby * BH, nbx * BW)[:height, :width]


def _fetch_coarse_bit_impl(row_b, bxc, byc, valid, nbk, ncy):
    """Occupancy of coarse block (bxc, byc) in a pre-broadcast row.

    Rows hold XG x-block groups of 32 blocks each, group-major along
    the lane axis (ops.occupancy.coarse_occupancy): lane index =
    (bxc >> 5)·ncy + byc, bit = bxc & 31.  For n ≤ 256 (one group)
    this degenerates to lane = byc, bit = bxc.
    """
    bxc = jnp.clip(bxc, 0, nbk - 1)
    byc = jnp.clip(byc, 0, nbk - 1)
    if nbk <= 32:
        idx = byc
    else:
        idx = jax.lax.shift_right_logical(bxc, 5) * ncy + byc
    g = _lane_gather(row_b, idx)
    bit = jnp.bitwise_and(
        jax.lax.shift_right_logical(
            g, jnp.bitwise_and(bxc, 31).astype(_U32)
        ),
        _U32(1),
    )
    return (bit.astype(_I32) == 1) & valid


def _store_ray(rayrefs, ox, oy, oz, dx, dy, dz, t0, t1, active):
    """Write a ray into the VMEM ray-state refs consumed by ``sweep``.

    Exactness thresholds (see column_occ): the supercolumn's 3-point probe
    over a 4-column (32-plane) span is conservative for |dxy/dz| ≤ 1; the
    per-column probe for |dxy/dz| ≤ 2 — steeper rays carry force-descend
    flags.
    """
    r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags = rayrefs
    r_ox[:] = ox
    r_oy[:] = oy
    r_oz[:] = oz
    r_dx[:] = dx
    r_dy[:] = dy
    r_dz[:] = dz
    r_t0[:] = t0
    r_t1[:] = t1
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    steep_super = (adx > adz) | (ady > adz)
    steep_col = (adx > 2.0 * adz) | (ady > 2.0 * adz)
    r_flags[:] = (
        active.astype(_I32)
        | (steep_super.astype(_I32) << 1)
        | (steep_col.astype(_I32) << 2)
    )


def pack_cam(view_mat, width, height, light_pos, light_magnitude, cell_size,
             roughness, base_reflectivity, material_color,
             light_radius=0.0, emissive_color=(0.0, 0.0, 0.0),
             emissive_strength=0.0, elapsed_time=0.0, row0=0.0,
             temporal_alpha=0.1, gamma=2.0, show_overlay=0.0):
    """Host-side packing of the kernel's parameter vector.  ``width`` /
    ``height`` are the FULL window dims (mesh shards pass their local
    extent as the pallas grid but global dims + ``row0`` here)."""
    import numpy as np

    cam = np.zeros((P_LEN,), np.float32)
    cam[P_R00 : P_R00 + 9] = np.asarray(view_mat, np.float32)[:3, :3].reshape(-1)
    cam[P_O : P_O + 3] = np.asarray(view_mat, np.float32)[:3, 3]
    cam[P_WIN : P_WIN + 2] = (width, height)
    cam[P_LIGHT : P_LIGHT + 3] = light_pos
    cam[P_LMAG] = light_magnitude
    cam[P_CELLMUL] = cell_size
    cam[P_ROUGH] = roughness
    cam[P_REFL : P_REFL + 3] = base_reflectivity
    cam[P_MATC : P_MATC + 3] = material_color
    cam[P_LRAD] = light_radius
    cam[P_EMIS : P_EMIS + 3] = emissive_color
    cam[P_EMISS] = emissive_strength
    cam[P_TIME] = elapsed_time
    cam[P_ROW0] = row0
    cam[P_ALPHA] = temporal_alpha
    cam[P_GAMMA] = gamma
    cam[P_OVERLAY] = show_overlay
    return cam


def _make_traversal(n: int, zext: int | None = None,
                    age_bits: int = 0, x_words: int | None = None,
                    slice_gate: bool = False, sub: int | None = None):
    """DDA traversal closures over a z-slab [z0, z0+zext) of an n³ volume.

    The fused single-kernel path uses the full volume (z0=0, zext=n); the
    sliced path for n > 256 runs one traversal per slab and composites
    in XLA (see render_slab.py).  Plane indices inside the closures are
    slab-local (static unrolled); all geometry uses the global z = z0 + k,
    where z0 is a RUNTIME scalar (``zrange[2]``) — so every slab of the
    same extent shares one compiled kernel regardless of its z offset.

    ``x_words``: words per x-chunk when the volume is additionally
    decomposed along x (grids > 512, render_slab brick decomposition —
    the fine-fetch where-chain scales as x_words·y_chunks slices per
    probe, compile/runtime-prohibitive at full x for n = 1024).  The
    brick's word offset rides in ``zrange[3]`` as a runtime scalar
    (every brick of one shape shares a compile); probes outside the
    chunk read empty — exact, because bricks partition the cells and
    the caller composites by min-t (disjoint cells ⇒ global first hit).
    Coarse rows are then per-chunk [R, ncy] slices of the globally
    dilated rows: cross-chunk carries are already in the dilation, and
    out-of-chunk probe points clamp to the chunk edge whose dilated
    bits cover every in-chunk block within 1 of the probe — the 3-probe
    covering argument survives unchanged (see column_occ).

    ``sub``: tile sublane count of the FETCH closures (default: module
    SUB).  The cellstate kernel runs on finer tiles than the sweep —
    its z-group bitmask gate tightens with screen footprint — while the
    sweep itself always uses (SUB, LANE) tiles.
    Returns (sweep, fetch_fine_bit, fetch_fine_bits_multi).
    """
    fsub = SUB if sub is None else sub
    zext = n if zext is None else zext
    w_words = n // 32
    chunk_words = w_words if x_words is None else x_words
    chunked = chunk_words < w_words
    nbk = n // 8                  # blocks along x and y (coordinate space)
    ncy = n // 8                  # blocks along y per x-group row segment
    nc = zext // 8                # slab-local coarse column count
    y_chunks = -(-n // LANE)      # fine slab lane chunks (Y padded to 128k)
    inv_n = 1.0 / n
    half = 0.5

    def fetch_fine_bit(vol, k_plane: int, cx, cy, valid, x0w=None):
        """Bit of cell (cx, cy, slab plane k_plane); vol VMEM ref [Z, C, 128]
        (z-major, chunk-major; k_plane is a *static* unrolled plane index so
        every load is a static lane-aligned slice).  ``x0w``: runtime word
        offset of the brick's x-chunk (None = chunk 0 / unchunked); words
        outside the chunk read 0 — empty space, exact under min-t
        compositing.

        Unconditional where-chain over the packed words: plain vector ops
        beat scalar-gated branches on this hardware (a reduction + branch
        costs ~hundreds of cycles; a gather is ~tens).
        """
        wsel = jax.lax.shift_right_logical(cx, 5)
        if x0w is not None:
            wsel = wsel - x0w
        yl = jnp.bitwise_and(cy, LANE - 1)
        word = jnp.zeros((fsub, LANE), dtype=_U32)
        for wi in range(chunk_words):
            g = jnp.zeros((fsub, LANE), dtype=_U32)
            for c in range(y_chunks):
                row = _bcast_row(vol[k_plane, wi * y_chunks + c : wi * y_chunks + c + 1, :], fsub)
                gc = _lane_gather(row, yl)
                if y_chunks == 1:
                    g = gc
                else:
                    g = jnp.where((cy // LANE) == c, gc, g)
            word = jnp.where(wsel == wi, g, word)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(word, jnp.bitwise_and(cx, 31).astype(_U32)),
            _U32(1),
        )
        return bit.astype(_I32)

    def fetch_fine_bits_multi(vol, k_plane: int, qs, x0w=None):
        """`fetch_fine_bit` for SEVERAL (cx, cy) queries of one plane with
        the packed-word row loads shared: the GI slot lookups need 4
        coordinates per pixel whose z's sit within ±1 of the hit cell, so
        one plane's rows serve all 4 slots (render_slab.cell_state_batch).
        Returns one i32 bit array per query."""
        pre = []
        for cx, cy in qs:
            wsel = jax.lax.shift_right_logical(cx, 5)
            if x0w is not None:
                wsel = wsel - x0w
            pre.append((wsel, jnp.bitwise_and(cy, LANE - 1), cy // LANE, cx))
        words = [jnp.zeros((fsub, LANE), dtype=_U32) for _ in qs]
        for wi in range(chunk_words):
            for c in range(y_chunks):
                row = _bcast_row(
                    vol[k_plane, wi * y_chunks + c : wi * y_chunks + c + 1, :],
                    fsub,
                )
                for qi, (wsel, yl, ych, _cx) in enumerate(pre):
                    gc = _lane_gather(row, yl)
                    sel = (wsel == wi) if y_chunks == 1 else (
                        (wsel == wi) & (ych == c)
                    )
                    words[qi] = jnp.where(sel, gc, words[qi])
        return [
            jnp.bitwise_and(
                jax.lax.shift_right_logical(
                    w, jnp.bitwise_and(cx, 31).astype(_U32)
                ),
                _U32(1),
            ).astype(_I32)
            for w, (_, _, _, cx) in zip(words, pre)
        ]

    def fetch_coarse_bit(row_b, bxc, byc, valid, x0b=None):
        if x0b is None:
            return _fetch_coarse_bit_impl(row_b, bxc, byc, valid, nbk, ncy)
        # Chunked: per-brick single-group rows [R, ncy] (bit = local
        # x-block, lane = y-block).  Out-of-chunk probe x-blocks clamp to
        # the chunk edge (conservative-exact, see module docstring).
        bxl = jnp.clip(bxc - x0b, 0, chunk_words * 4 - 1)
        byl = jnp.clip(byc, 0, ncy - 1)
        g = _lane_gather(row_b, byl)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(g, bxl.astype(_U32)), _U32(1)
        )
        return (bit.astype(_I32) == 1) & valid

    def sweep(vol, coarse, coarse2, zrange, refs, rayrefs, cell_half,
              exclude, accept_far: bool, ages=None, age_ref=None,
              scalar_origin=None, colmask=None, mip1=None, w_ref=None,
              alive_ref=None):
        """Two-direction coarse→fine DDA, fully unrolled.

        The coarse-column loop is a *python* loop: every plane index — and
        therefore every VMEM access — is static.  Early exit is expressed
        purely through pl.when predicates (a Mosaic while_loop costs ~2.3 µs
        per iteration in loop machinery alone, dwarfing the actual work).

        Ray state (origin, direction, t-range, active/steep flags) lives in
        VMEM scratch refs and is RELOADED inside every conditional region:
        values live across a branch get spilled/filled around it (~4-5 K
        cycles per branch at this tile size), so regions keep an empty live
        set and pay only their own loads.

        ``exclude``: (hx, hy, hz) refs of a prior sweep's hit cell to ignore
        (shadow start cell, wgsl:665) or None.  ``accept_far``: primary
        accept rule tN≤tF ∧ tF≥t_start (wgsl:722-724); else the shadow rule
        tN≥0 (wgsl:669).  Returns (found, t_hit, hx, hy, hz) values.

        ``colmask``: optional VMEM ref of per-pixel i32 column masks from
        the patch prepass (``_make_prepass``): bit c set ⇒ slab column c
        may contain occupancy along this pixel's ray.  When given, the
        column and supercolumn gates become bit tests — zero occupancy
        gathers on this sweep — plus tile-level scalar skip gates from
        the OR-folded mask.  The mask is a conservative superset
        (patch-bundle dilation), so exactness is unchanged.

        ``mip1``: optional VMEM ref of the plane-level block mip
        (ops.occupancy.plane_occupancy, x/y-dilated): full z resolution,
        8×8 blocks in x/y.  Descended columns prefilter their 8 fine
        planes against it — one midpoint block probe per plane, folded to
        a tile-level 8-bit scalar — so the expensive fine fetches run
        only on planes whose probed block is actually occupied
        (conservative-exact by the same midpoint±1-block covering
        argument; steep rays force every overlapped plane).

        ``zrange`` is [zmin_col, zmax_col, z0]: occupied coarse-column
        range (slab-local) plus the slab's global z offset, all runtime
        scalars.  Chunked traversals (x_words < n/32) carry the brick's
        x word offset in ``zrange[3]``.

        ``alive_ref``: optional (1,) i32 SMEM scratch enabling the sticky
        any-ray-alive gate (CA3D_ALIVE_GATE=1; default OFF — measured a
        net LOSS on the real workload): within one direction pass
        aliveness (pass-active ∧ ¬found) only ever decreases, so once a
        descended group's post-latch fold finds no lane alive, later
        groups skip at a pure SMEM-scalar test.  Measured r05 on the
        gen-230 dense scene: 24.84 → 26.39 ms, pinned gen-85 ≈ +1.2 ms —
        the scene is a ~10%-density sponge, rays stay alive across most
        groups, and the extra fold per descended group never pays
        (bench_out/r05_dense_alivegate.txt).  Kept as an opt-in for
        genuinely solid scenes.
        """
        found_ref, t_ref, hx_ref, hy_ref, hz_ref = refs
        r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags = rayrefs
        if not _ALIVE_GATE:
            alive_ref = None  # see docstring: measured net loss, opt-in
        z0 = zrange[2]
        z0f = z0.astype(_F32)
        if chunked:
            assert mip1 is None and colmask is None  # fused-path only
            x0w = zrange[3]
            x0b = x0w * 4
        else:
            x0w = x0b = None

        def load_ray():
            flags = r_flags[:]
            if scalar_origin is None:
                ox, oy, oz = r_ox[:], r_oy[:], r_oz[:]
            else:
                # Primary rays share one camera origin: splat the scalars
                # instead of re-reading three 128 KiB refs in every
                # conditional region.
                ox = jnp.full((SUB, LANE), scalar_origin[0], _F32)
                oy = jnp.full((SUB, LANE), scalar_origin[1], _F32)
                oz = jnp.full((SUB, LANE), scalar_origin[2], _F32)
            return (
                ox, oy, oz, r_dx[:], r_dy[:], r_dz[:],
                r_t0[:], r_t1[:],
                (flags & 1) == 1,            # active
                (flags & 2) == 2,            # steep_super (skip supercolumn gate)
                (flags & 4) == 4,            # steep_col (force fine descent)
            )

        def plane_geo(k_plane: int, ray, pass_active):
            """(seg_ok, cx, cy) of a plane's midpoint probe — the first
            half of probe_fine, shared with the slice-gate one-hot pass
            (identical ops on identical inputs ⇒ identical values)."""
            ox, oy, oz, dx, dy, dz, t_start, t_end = ray[:8]
            inv_dz = 1.0 / dz
            found = found_ref[:] == 1
            gzf = z0f + k_plane
            ta = (gzf * inv_n - half - oz) * inv_dz
            tb = ((gzf + 1.0) * inv_n - half - oz) * inv_dz
            lo = jnp.maximum(jnp.minimum(ta, tb), t_start)
            hi = jnp.minimum(jnp.maximum(ta, tb), t_end)
            seg_ok = (lo < hi) & ~found & pass_active
            tm = 0.5 * (lo + hi)
            cx = jnp.clip(
                jnp.floor((ox + tm * dx + half) * n), 0, n - 1
            ).astype(_I32)
            cy = jnp.clip(
                jnp.floor((oy + tm * dy + half) * n), 0, n - 1
            ).astype(_I32)
            return seg_ok, cx, cy

        def probe_fine(k_plane: int, ray, pass_active, word=None):
            ox, oy, oz, dx, dy, dz, t_start, t_end = ray[:8]
            inv_dx = 1.0 / dx
            inv_dy = 1.0 / dy
            inv_dz = 1.0 / dz
            gz = z0 + k_plane        # global z of this slab-local plane (i32)
            gzf = z0f + k_plane      # float form for geometry
            seg_ok, cx, cy = plane_geo(k_plane, ray, pass_active)
            if word is None:
                bit = fetch_fine_bit(vol, k_plane, cx, cy, seg_ok, x0w)
            else:
                # Slice-gate path: the word was prefetched under the
                # column's slice mask (descend_gated); extract the bit.
                bit = jnp.bitwise_and(
                    jax.lax.shift_right_logical(
                        word, jnp.bitwise_and(cx, 31).astype(_U32)
                    ),
                    _U32(1),
                ).astype(_I32)
            cand = seg_ok & (bit == 1)
            if exclude is not None and len(exclude) == 3:
                cand = cand & ~(
                    (cx == exclude[0][:])
                    & (cy == exclude[1][:])
                    & (gz == exclude[2][:])
                )
            elif exclude is not None:
                # Packed-id form (x + y·n + z·n²): one scratch ref instead
                # of three.  CALLER CONTRACT: out-of-range excluded coords
                # must be packed as the -1 sentinel — naive packing
                # aliases (x == n packs to the id of the REAL cell
                # (0, y+1, z)), unlike the component compare above which
                # can never match out-of-range coords.
                cand = cand & ~(
                    (cx + cy * n + gz * (n * n)) == exclude[0][:]
                )
            # Visible-cube intersection + snap (wgsl:712-729).
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
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            if accept_far:
                ok = (tn <= tf) & (tf >= t_start)
            else:
                ok = (tn <= tf) & (tn >= 0.0)
            hit = cand & ok
            if ages is not None:
                age = jnp.zeros((SUB, LANE), dtype=_I32)
                for b_ in range(age_bits):
                    abit = fetch_fine_bit(
                        ages, b_ * zext + k_plane, cx, cy, hit, x0w
                    )
                    age = age | (abit << b_)
                age_ref[:] = jnp.where(hit, age, age_ref[:])
            found_ref[:] = jnp.where(hit, 1, found_ref[:])
            t_ref[:] = jnp.where(hit, tn, t_ref[:])
            hx_ref[:] = jnp.where(hit, cx, hx_ref[:])
            hy_ref[:] = jnp.where(hit, cy, hy_ref[:])
            hz_ref[:] = jnp.where(
                hit, jnp.broadcast_to(gz, (SUB, LANE)), hz_ref[:]
            )

        def pass_dir_active(ray, direction):
            dz, act = ray[5], ray[8]
            return act & ((dz > 0) if direction > 0 else (dz < 0))

        found_ref[:] = jnp.zeros((SUB, LANE), dtype=_I32)
        t_ref[:] = jnp.zeros((SUB, LANE), dtype=_F32)
        hx_ref[:] = jnp.zeros((SUB, LANE), dtype=_I32)
        hy_ref[:] = jnp.zeros((SUB, LANE), dtype=_I32)
        hz_ref[:] = jnp.zeros((SUB, LANE), dtype=_I32)

        GROUP = 4
        zmin = zrange[0]
        zmax = zrange[1]

        # Start-column gating for secondary sweeps (shadow/GI rays start
        # mid-volume at the lit surface): columns entirely behind every
        # active lane's origin along the pass direction can never produce
        # a hit — two scalar reductions kill roughly half the column
        # probes of each shadow sweep.
        if accept_far:
            smin_c = smax_c = None
        else:
            act = (r_flags[:] & 1) == 1
            ozv = r_oz[:]
            big = jnp.float32(1e9)
            start_gz = jnp.floor((jnp.where(act, ozv, big).min() + half) * n)
            smin_c = start_gz.astype(_I32) // 8 - z0 // 8 - 1
            end_gz = jnp.floor((jnp.where(act, ozv, -big).max() + half) * n)
            smax_c = end_gz.astype(_I32) // 8 - z0 // 8 + 1
            # (z0 is a multiple of 8, so traced floor-division is exact.)

        def column_occ(c_plane: int, ray, pass_active, found):
            """Coarse occupancy candidates for one column (pure vector).

            Conservative-exact: ``coarse`` rows are x-dilated (one block)
            and probed at 3 points.  For |dxy/dz| ≤ 2 the spacing between
            adjacent probes is ≤ 1 block per xy coordinate, so any block
            the segment touches between two probes shares its y-block with
            one of them and sits within one x-block of it — covered by the
            x dilation.  Rays steeper than that carry the ``steep_col``
            flag and descend unconditionally.  With a prepass ``colmask``
            the occupancy test is one per-lane bit test — zero gathers.
            """
            ox, oy, oz, dx, dy, dz, t_start, t_end = ray[:8]
            steep_col = ray[10]
            inv_dz = 1.0 / dz
            gz = z0f + c_plane * 8
            ta = (gz * inv_n - half - oz) * inv_dz
            tb = ((gz + 8.0) * inv_n - half - oz) * inv_dz
            lo = jnp.maximum(jnp.minimum(ta, tb), t_start)
            hi = jnp.minimum(jnp.maximum(ta, tb), t_end)
            seg_ok = (lo < hi) & ~found & pass_active
            if colmask is not None:
                bit = (
                    jax.lax.shift_right_logical(
                        colmask[:].astype(_U32), _U32(c_plane)
                    )
                    & _U32(1)
                ).astype(_I32) == 1
                return (bit | steep_col) & seg_ok
            row_b = _bcast_row(coarse[c_plane : c_plane + 1, :])
            occ = steep_col & seg_ok
            for tprobe in (lo, 0.5 * (lo + hi), hi):
                bxc = jnp.floor((ox + tprobe * dx + half) * nbk).astype(_I32)
                byc = jnp.floor((oy + tprobe * dy + half) * nbk).astype(_I32)
                occ = occ | fetch_coarse_bit(row_b, bxc, byc, seg_ok, x0b)
            return occ

        # Tile-level column bitmask (primary sweep only): one cheap OR-fold
        # of the per-pixel prepass masks.  Purely additive scalar gates —
        # groups/columns no lane's patch flagged are skipped without any
        # full-tile reduction; flagged ones still go through the per-lane,
        # hit-progress-aware `_any` gates below (which is what keeps fine
        # descent from running after every lane has latched).
        tile_mask = _or_fold_scalar(colmask[:]) if colmask is not None else None

        def descend_gated(c_plane: int, direction: int):
            """Fine descent with slice-gated fetches (CA3D_SLICEGATE=1).

            The unconditional fetch chain costs chunk_words·y_chunks
            gather+select slices per plane probe (16 at 256³), but a
            coherent tile's probes touch only 2-4 distinct
            (x-word, y-chunk) slices per column.  One OR-fold of the 8
            planes' slice one-hots yields a scalar mask; only flagged
            slices execute (8 gathers each, one per plane, into a word
            scratch), then the hit pass consumes the prefetched words.
            Exact: an unflagged slice means NO lane's probe targets it —
            exactly the lanes whose where-chain select would have
            discarded it.  Values never live across the gated regions
            (the geometry is recomputed from the ray refs inside each,
            see the sweep docstring's spill note).
            """
            nslices = chunk_words * y_chunks
            assert nslices <= 31 and x0w is None  # fused path only
            base = c_plane * 8
            ray = load_ray()
            pass_active = pass_dir_active(ray, direction)
            onehot = jnp.zeros((SUB, LANE), dtype=_I32)
            for f in range(8):
                seg, cx, cy = plane_geo(base + f, ray, pass_active)
                sel = jax.lax.shift_right_logical(cx, 5) * y_chunks + (
                    cy // LANE
                )
                onehot = onehot | jnp.where(seg, _I32(1) << sel, _I32(0))
            smask = _or_fold_scalar(onehot)

            for f in range(8):
                w_ref[f * SUB : (f + 1) * SUB] = jnp.zeros(
                    (SUB, LANE), dtype=_U32
                )
            for s in range(nslices):
                wi, c = divmod(s, y_chunks)

                @pl.when(((smask >> s) & 1) != 0)
                def _(wi=wi, c=c):
                    ray2 = load_ray()
                    pa = pass_dir_active(ray2, direction)
                    for f in range(8):
                        k = base + f
                        seg, cx, cy = plane_geo(k, ray2, pa)
                        match = (
                            seg
                            & (jax.lax.shift_right_logical(cx, 5) == wi)
                            & ((cy // LANE) == c)
                        )
                        row = _bcast_row(
                            vol[k, wi * y_chunks + c : wi * y_chunks + c + 1, :]
                        )
                        gc = _lane_gather(row, jnp.bitwise_and(cy, LANE - 1))
                        cur = w_ref[f * SUB : (f + 1) * SUB]
                        w_ref[f * SUB : (f + 1) * SUB] = jnp.where(
                            match, gc, cur
                        )

            for f in range(8):
                fo = f if direction > 0 else 7 - f
                ray3 = load_ray()
                probe_fine(
                    base + fo, ray3, pass_dir_active(ray3, direction),
                    word=w_ref[fo * SUB : (fo + 1) * SUB],
                )

        def group_body(cols, direction):
            ray = load_ray()
            pass_active = pass_dir_active(ray, direction)
            found_g = found_ref[:] == 1
            # Per-column candidate masks, packed into one vector and
            # OR-folded ONCE: a single reduction yields both the group
            # gate and every column's scalar gate bit (vs one `_any` per
            # column plus a group reduction — reductions cost ~hundreds
            # of cycles each and dominated the sweep's fixed floor).
            # Columns are gated on group-entry occupancy; lanes that
            # latch mid-group are still masked out of every probe, so
            # exactness is unchanged — only ≤3 stale prefilter probes
            # can run in a group where all lanes latched early.
            gmask_v = jnp.zeros((SUB, LANE), dtype=_I32)
            for j, c in enumerate(cols):
                occ = column_occ(c, ray, pass_active, found_g)
                gmask_v = gmask_v | jnp.where(occ, _I32(1 << j), _I32(0))
            gmask = _or_fold_scalar(gmask_v)

            @pl.when(gmask != 0)
            def _(cols=cols, direction=direction):
                for j, c_plane in enumerate(cols):
                    def col_work(c_plane=c_plane, direction=direction):
                        ray = load_ray()
                        pass_active = pass_dir_active(ray, direction)
                        if slice_gate:
                            descend_gated(c_plane, direction)
                            return
                        if mip1 is None:
                            for f in range(8):
                                k = c_plane * 8 + (
                                    f if direction > 0 else 7 - f
                                )
                                probe_fine(k, ray, pass_active)
                            return
                        # Plane-level prefilter: one midpoint block
                        # probe per fine plane against the dilated
                        # plane mip, folded to a tile scalar — fine
                        # fetches run only on occupied planes.
                        ox, oy, oz, dx, dy, dz, t_start, t_end = ray[:8]
                        steep_col = ray[10]
                        found_l = found_ref[:] == 1
                        inv_dz = 1.0 / dz
                        pmask = jnp.zeros((SUB, LANE), dtype=_I32)
                        for f in range(8):
                            k = c_plane * 8 + f
                            gzf = z0f + k
                            ta = (gzf * inv_n - half - oz) * inv_dz
                            tb = (
                                (gzf + 1.0) * inv_n - half - oz
                            ) * inv_dz
                            lo = jnp.maximum(
                                jnp.minimum(ta, tb), t_start
                            )
                            hi = jnp.minimum(
                                jnp.maximum(ta, tb), t_end
                            )
                            seg = (lo < hi) & ~found_l & pass_active
                            tm = 0.5 * (lo + hi)
                            bxc = jnp.floor(
                                (ox + tm * dx + half) * nbk
                            ).astype(_I32)
                            byc = jnp.floor(
                                (oy + tm * dy + half) * nbk
                            ).astype(_I32)
                            row_b = _bcast_row(mip1[k : k + 1, :])
                            pb = fetch_coarse_bit(
                                row_b, bxc, byc, seg, x0b
                            ) | (steep_col & seg)
                            pmask = pmask | (pb.astype(_I32) << f)
                        tm8 = _or_fold_scalar(pmask)
                        for f in range(8):
                            fo = f if direction > 0 else 7 - f
                            k = c_plane * 8 + fo

                            @pl.when(((tm8 >> fo) & 1) != 0)
                            def _(k=k, direction=direction):
                                ray2 = load_ray()
                                probe_fine(
                                    k, ray2,
                                    pass_dir_active(ray2, direction),
                                )

                    gate = ((gmask >> j) & 1) != 0
                    if tile_mask is not None:
                        # Skip columns no lane's patch flagged.
                        gate = gate & (((tile_mask >> c_plane) & 1) != 0)
                    pl.when(gate)(col_work)

        for direction in (1, -1):
            ray0 = load_ray()
            pass_possible = pass_dir_active(ray0, direction) & ~(
                found_ref[:] == 1
            )
            if alive_ref is not None:
                alive_ref[0] = _I32(1)

            @pl.when(_any(pass_possible))
            def _(direction=direction):
                for g0 in range(0, nc, GROUP):
                    cols = [
                        (g0 + j) if direction > 0 else (nc - 1 - (g0 + j))
                        for j in range(GROUP)
                    ]
                    lo_c, hi_c = min(cols), max(cols)

                    # Scalar gates: global occupied z-range, the tile's
                    # folded column-mask bits (primary), (secondary
                    # sweeps) columns fully behind the rays' start for
                    # this direction, and the sticky alive scalar.
                    gate = (zmax >= lo_c) & (zmin <= hi_c)
                    if alive_ref is not None:
                        gate = gate & (alive_ref[0] != 0)
                    if tile_mask is not None:
                        gate = gate & (((tile_mask >> lo_c) & 0xF) != 0)
                    if smin_c is not None:
                        gate = gate & (
                            (hi_c >= smin_c)
                            if direction > 0
                            else (lo_c <= smax_c)
                        )

                    @pl.when(gate)
                    def _(cols=cols, lo_c=lo_c, hi_c=hi_c, direction=direction):
                        ray = load_ray()
                        ox, oy, oz, dx, dy, dz, t_start, t_end = ray[:8]
                        steep = ray[9]
                        pass_active = pass_dir_active(ray, direction)
                        found_g = found_ref[:] == 1
                        # Supercolumn gate over the 4-column span: segment
                        # overlap × occupancy.  With a prepass mask the
                        # occupancy test is 4 bits of the mask; otherwise
                        # probe the z-OR'd, xy-dilated coarse2 rows — exact
                        # thanks to the dilation + steep-ray force-descend.
                        inv_dz = 1.0 / dz
                        ta = ((z0f + lo_c * 8) * inv_n - half - oz) * inv_dz
                        tb = (
                            (z0f + hi_c * 8 + 8) * inv_n - half - oz
                        ) * inv_dz
                        lo_t = jnp.maximum(jnp.minimum(ta, tb), t_start)
                        hi_t = jnp.minimum(jnp.maximum(ta, tb), t_end)
                        seg2 = (lo_t < hi_t) & ~found_g & pass_active
                        if colmask is not None:
                            gbits = (
                                jax.lax.shift_right_logical(
                                    colmask[:].astype(_U32), _U32(lo_c)
                                )
                                & _U32(0xF)
                            ).astype(_I32)
                            occ2 = gbits != 0
                        else:
                            row2 = _bcast_row(
                                coarse2[lo_c // 4 : lo_c // 4 + 1, :]
                            )
                            occ2 = jnp.zeros_like(seg2)
                            for tp in (lo_t, 0.5 * (lo_t + hi_t), hi_t):
                                bxc = jnp.floor(
                                    (ox + tp * dx + half) * nbk
                                ).astype(_I32)
                                byc = jnp.floor(
                                    (oy + tp * dy + half) * nbk
                                ).astype(_I32)
                                occ2 = occ2 | fetch_coarse_bit(
                                    row2, bxc, byc, seg2, x0b
                                )
                        descend = seg2 & (occ2 | steep)

                        @pl.when(_any(descend))
                        def _(cols=cols, direction=direction):
                            group_body(cols, direction)
                            if alive_ref is not None:
                                # Latching only happens in descended
                                # groups — refresh the sticky scalar here
                                # (fresh loads, the no-spill discipline).
                                rayu = load_ray()
                                alive_u = pass_dir_active(
                                    rayu, direction
                                ) & ~(found_ref[:] == 1)
                                alive_ref[0] = _any(alive_u).astype(_I32)

        return found_ref[:] == 1, t_ref[:], hx_ref[:], hy_ref[:], hz_ref[:]

    return sweep, fetch_fine_bit, fetch_fine_bits_multi


PATCH = 8          # prepass patch edge (pixels)
_PRE_DEV = 0.0075  # per-unit-t bound on patch-bundle ray deviation
                   # (8×8-pixel patch at 75° FOV/1080p: half-diagonal
                   # ≈ 5 px ≈ 0.006 rad; 0.0075 leaves slack)


def _make_prepass(n: int, width: int, height: int):
    """Patch prepass kernel: one conservative column-occupancy mask per
    PATCH×PATCH pixel patch.

    Probes the patch CENTER ray against doubly-x-/singly-y-dilated coarse
    rows over an expanded volume box.  Covering argument: any cell a patch
    ray touches at plane z lies within `_PRE_DEV·t` (≤ 1 block for
    t ≤ ~4.3 at 256³) of the center ray's position at that z; the per-ray
    3-probe/x±1 covering then bounds it within x±2/y±1 of a center-ray
    probe — exactly the extra dilation.  Patches that are steep
    (|dxy/dz| > 2 possible for any bundle ray), distant (deviation bound
    > 7 cells) or degenerate get an all-ones mask (force fine descent),
    so the mask is always a superset of per-ray coarse probing and the
    sweep stays conservative-exact.

    Output: i32 mask per patch, bit c = descend column c.  The whole
    1080p patch grid (240×135 = 32 400 patches) fits one kernel tile.
    """
    nbk = n // 8
    ncy = n // 8
    nc = n // 8
    inv_n = 1.0 / n
    half = 0.5
    m = 0.035  # expanded-box margin ≥ max bundle deviation at max t
    pw_n = -(-width // PATCH)
    ph_n = -(-height // PATCH)
    npatch = pw_n * ph_n

    def kernel(cam, coarse_pre, out_mask):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 1)
        sub = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 0)
        p = t * TILE + sub * LANE + lane
        pvalid = p < npatch
        pc = jnp.minimum(p, npatch - 1)
        px = jnp.mod(pc, pw_n) * PATCH + PATCH // 2
        py = (pc // pw_n) * PATCH + PATCH // 2
        win_w = cam[P_WIN]
        win_h = cam[P_WIN + 1]
        ux = px.astype(_F32) / win_w
        uy = 1.0 - (py.astype(_F32) + cam[P_ROW0]) / win_h
        rx = (ux - 0.5) * (win_w / win_h)
        ry = uy - 0.5
        rx, ry, rz = _normalize3(
            rx, ry, jnp.full_like(rx, -0.5 * COT_HALF_FOV)
        )
        dx = cam[P_R00 + 0] * rx + cam[P_R00 + 1] * ry + cam[P_R00 + 2] * rz
        dy = cam[P_R00 + 3] * rx + cam[P_R00 + 4] * ry + cam[P_R00 + 5] * rz
        dz = cam[P_R00 + 6] * rx + cam[P_R00 + 7] * ry + cam[P_R00 + 8] * rz
        ox = jnp.full((SUB, LANE), cam[P_O + 0], _F32)
        oy = jnp.full((SUB, LANE), cam[P_O + 1], _F32)
        oz = jnp.full((SUB, LANE), cam[P_O + 2], _F32)

        def slab(o, d):
            inv = 1.0 / d
            t1 = (-(half + m) - o) * inv
            t2 = ((half + m) - o) * inv
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        nx_, fx_ = slab(ox, dx)
        ny_, fy_ = slab(oy, dy)
        nz_, fz_ = slab(oz, dz)
        tn = jnp.maximum(jnp.maximum(nx_, ny_), nz_)
        tf = jnp.minimum(jnp.minimum(fx_, fy_), fz_)
        active = (tn <= tf) & (tf >= 0.0) & pvalid
        t0 = jnp.maximum(tn, 0.0)
        t1 = tf
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        # Patch-steep: some bundle ray may exceed |dxy/dz| > 2 (3·0.01
        # margin on the per-component deviation bound).
        steep = (adx > 2.0 * adz - 0.03) | (ady > 2.0 * adz - 0.03)
        far = t1 * (_PRE_DEV * n) > 7.0
        force = (steep | far) & active

        inv_dz = 1.0 / dz
        mask = jnp.zeros((SUB, LANE), _I32)
        for c in range(nc):
            gz = c * 8
            ta = (gz * inv_n - half - oz) * inv_dz
            tb = ((gz + 8) * inv_n - half - oz) * inv_dz
            lo = jnp.maximum(jnp.minimum(ta, tb), t0)
            hi = jnp.minimum(jnp.maximum(ta, tb), t1)
            seg = (lo < hi) & active
            row_b = _bcast_row(coarse_pre[c : c + 1, :])
            occ = jnp.zeros((SUB, LANE), jnp.bool_)
            for tp in (lo, 0.5 * (lo + hi), hi):
                bxc = jnp.floor((ox + tp * dx + half) * nbk).astype(_I32)
                byc = jnp.floor((oy + tp * dy + half) * nbk).astype(_I32)
                occ = occ | _fetch_coarse_bit_impl(
                    row_b, bxc, byc, seg, nbk, ncy
                )
            mask = mask | (occ.astype(_I32) << c)
        mask = jnp.where(force, jnp.full((SUB, LANE), -1, _I32), mask)
        out_mask[:] = jnp.where(pvalid & active, mask, 0)

    return kernel, npatch, pw_n, ph_n


def _prepass_mask(vol_coarse, cam, n, width, height, interpret):
    """Run the patch prepass and upsample its masks to a tile-blocked
    per-pixel i32 image for the main kernel."""
    from ..ops.occupancy import dilate_occupancy

    coarse_pre = dilate_occupancy(vol_coarse, dilate_z=False, dilate_y=True)
    coarse_pre = dilate_occupancy(coarse_pre, dilate_z=False, dilate_y=False)
    if coarse_pre.shape[1] < LANE:
        coarse_pre = jnp.pad(
            coarse_pre, ((0, 0), (0, LANE - coarse_pre.shape[1]))
        )
    kernel, npatch, pw_n, ph_n = _make_prepass(n, width, height)
    np_tiles = pl.cdiv(npatch, TILE)
    mask_blk = pl.pallas_call(
        kernel,
        grid=(np_tiles,),
        out_shape=jax.ShapeDtypeStruct((np_tiles * SUB, LANE), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda t: (t, 0)),
        interpret=interpret,
    )(cam, coarse_pre)
    mask_img = mask_blk.reshape(-1)[:npatch].reshape(ph_n, pw_n)
    mask_pix = jnp.repeat(jnp.repeat(mask_img, PATCH, 0), PATCH, 1)[
        :height, :width
    ]
    return _to_blocks(mask_pix, width, height)


def _make_kernel(n: int, shadow: bool, width: int, height: int,
                 age_bits: int = 0, total_states: int = 2,
                 debug_no_sweep: bool = False, compose: bool = False,
                 use_colmask: bool = True, use_mip1: bool = True,
                 use_slicegate: bool = False):
    """Fused full-volume kernel: primary + hard shadow sweep, Cook-Torrance
    shading, age fade.  Soft shadows / one-bounce GI live in the
    decomposed path (renderer_fast.trace_shaded + render_slab helpers): the
    in-kernel variants at 256³ unrolled past what Mosaic can compile in
    reasonable time.

    ``compose``: full in-kernel frame composition (emissive + temporal EMA
    against blocked f32 history + light-source cube + depth overlay +
    gamma) — the static-camera production path, replacing the XLA
    composition whose HBM round trips cost ~4 ms/frame at 1080p.  Extra
    inputs: prev color (3× f32) + prev hit-idx blocks; extra outputs: new
    history color (3× f32).  out_r/g/b become the gamma-corrected
    presentation (render_frame_fast semantics, wgsl:429-471,866-888)."""
    inv_n = 1.0 / n
    half = 0.5
    sweep, _, _ = _make_traversal(n, n, age_bits, None, use_slicegate)

    def kernel(cam, zrange, vol, coarse, coarse2, *rest):
        rest = list(rest)
        mip1 = rest.pop(0) if use_mip1 else None
        colmask = rest.pop(0) if use_colmask else None
        if compose:
            prev_r, prev_g, prev_b, prev_idx = rest[:4]
            rest = rest[4:]
        ages = rest.pop(0) if age_bits else None
        nouts = 8 if compose else 5
        outs = rest[:nouts]
        rest = rest[nouts:]
        out_r, out_g, out_b, out_depth, out_idx = outs[:5]
        hist_out = outs[5:] if compose else None
        (f_a, t_a, hx_a, hy_a, hz_a, f_b, t_b, hx_b, hy_b, hz_b,
         r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1,
         r_flags) = rest[:19]
        rest = rest[19:]
        age_ref = rest.pop(0) if age_bits else None
        w_ref = rest.pop(0) if use_slicegate else None
        alive_ref = rest.pop(0)  # (1,) i32 SMEM: sticky any-alive scalar
        rayrefs = (r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_t0, r_t1, r_flags)
        t = pl.program_id(0)
        nbx = (width + BW - 1) // BW
        bx = jnp.mod(t, nbx)
        by = t // nbx
        win_w = cam[P_WIN]
        win_h = cam[P_WIN + 1]

        def pixel_rays():
            """Recompute the per-pixel camera ray from iotas + scalars.

            Pure vector math with an empty live set — called after each
            sweep instead of keeping ray values live across the sweep's
            conditional regions (which would spill/fill around every
            branch)."""
            lane = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 1)
            sub = jax.lax.broadcasted_iota(_I32, (SUB, LANE), 0)
            l = sub * LANE + lane
            px = bx * BW + jnp.mod(l, BW)
            py = by * BH + l // BW
            onscreen = (px < width) & (py < height)
            px = jnp.minimum(px, width - 1)
            py = jnp.minimum(py, height - 1)
            ux = (px.astype(_F32) + 0.5) / win_w
            # row0 ≠ 0 when this invocation renders a row shard of a larger
            # window (mesh mode): uv must be global.
            uy = 1.0 - (py.astype(_F32) + cam[P_ROW0] + 0.5) / win_h
            rx = (ux - 0.5) * (win_w / win_h)
            ry = uy - 0.5
            rx, ry, rz = _normalize3(
                rx, ry, jnp.full_like(rx, -0.5 * COT_HALF_FOV)
            )
            dx = cam[P_R00 + 0] * rx + cam[P_R00 + 1] * ry + cam[P_R00 + 2] * rz
            dy = cam[P_R00 + 3] * rx + cam[P_R00 + 4] * ry + cam[P_R00 + 5] * rz
            dz = cam[P_R00 + 6] * rx + cam[P_R00 + 7] * ry + cam[P_R00 + 8] * rz
            return ux, uy, dx, dy, dz, onscreen

        def cam_origin():
            return (
                jnp.full((SUB, LANE), cam[P_O + 0], _F32),
                jnp.full((SUB, LANE), cam[P_O + 1], _F32),
                jnp.full((SUB, LANE), cam[P_O + 2], _F32),
            )

        def hit_point():
            """Primary hit point from the sweep-A refs (recompute, no spills)."""
            _, _, dx, dy, dz, _ = pixel_rays()
            ox, oy, oz = cam_origin()
            th = t_ref_a()
            return ox + th * dx, oy + th * dy, oz + th * dz

        def t_ref_a():
            return t_a[:]

        def vol_slab(o, d):
            inv = 1.0 / d
            t1 = (-half - o) * inv
            t2 = (half - o) * inv
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        mcr, mcg, mcb = cam[P_MATC], cam[P_MATC + 1], cam[P_MATC + 2]
        use_mat = (mcr != 0.0) | (mcg != 0.0) | (mcb != 0.0)

        def albedo_from(cxv, cyv):
            """Position-derived rainbow unless materialColor ≠ 0 (wgsl:598-603)."""
            cxn = cxv * inv_n
            cyn = cyv * inv_n
            return (
                jnp.where(use_mat, mcr, cxn),
                jnp.where(use_mat, mcg, cyn),
                jnp.where(use_mat, mcb, 1.0 - cxn),
            )

        def shade(qx, qy, qz, cox, coy, coz, alr, alg, alb,
                  vwx, vwy, vwz, lpx, lpy, lpz, lr, lg, lb):
            """Cook-Torrance direct lighting (wgsl:537-633) at surface point
            q of the cell centered at co, viewed from vw, lit by a point
            source at lp with per-channel radiance (lr, lg, lb)."""
            fxo, fyo, fzo = qx - cox, qy - coy, qz - coz
            ax_, ay_, az_ = jnp.abs(fxo), jnp.abs(fyo), jnp.abs(fzo)
            m = jnp.maximum(jnp.maximum(ax_, ay_), az_)
            is_x = ax_ == m
            is_y = (ay_ == m) & ~is_x
            is_z = ~is_x & ~is_y
            nxn = jnp.where(is_x, jnp.sign(fxo), 0.0)
            nyn = jnp.where(is_y, jnp.sign(fyo), 0.0)
            nzn = jnp.where(is_z, jnp.sign(fzo), 0.0)
            ldx, ldy, ldz = _normalize3(lpx - qx, lpy - qy, lpz - qz)
            vx, vy, vz = _normalize3(vwx - qx, vwy - qy, vwz - qz)
            hwx, hwy, hwz = _normalize3(ldx + vx, ldy + vy, ldz + vz)
            rough = cam[P_ROUGH]
            a2 = rough * rough
            noh = nxn * hwx + nyn * hwy + nzn * hwz
            fterm = noh * noh * (a2 - 1.0) + 1.0
            dterm = a2 / (PI * fterm * fterm)
            kd = (rough + 1.0) * (rough + 1.0) / 8.0
            nov = jnp.maximum(0.0, nxn * vx + nyn * vy + nzn * vz)
            nol_c = jnp.maximum(0.0, nxn * ldx + nyn * ldy + nzn * ldz)
            gterm = (nov / (nov * (1.0 - kd) + kd)) * (
                nol_c / (nol_c * (1.0 - kd) + kd)
            )
            hv = hwx * vx + hwy * vy + hwz * vz
            p5 = (1.0 - hv) ** 5
            fr = cam[P_REFL] + (1.0 - cam[P_REFL]) * p5
            fg = cam[P_REFL + 1] + (1.0 - cam[P_REFL + 1]) * p5
            fb = cam[P_REFL + 2] + (1.0 - cam[P_REFL + 2]) * p5
            denom = 4.0 * (vx * nxn + vy * nyn + vz * nzn) * (
                ldx * nxn + ldy * nyn + ldz * nzn
            )
            nol = ldx * nxn + ldy * nyn + ldz * nzn  # un-clamped (wgsl:623)
            spec = dterm * gterm / denom
            return (
                jnp.maximum(0.0, (alr / PI + spec * fr) * lr * nol),
                jnp.maximum(0.0, (alg / PI + spec * fg) * lg * nol),
                jnp.maximum(0.0, (alb / PI + spec * fb) * lb * nol),
            )

        def store_ray(ox, oy, oz, dx, dy, dz, t0, t1, active):
            _store_ray(rayrefs, ox, oy, oz, dx, dy, dz, t0, t1, active)

        cell_half = inv_n * cam[P_CELLMUL] * 0.5
        lpx, lpy, lpz = cam[P_LIGHT], cam[P_LIGHT + 1], cam[P_LIGHT + 2]

        def cell_center(hxv, hyv, hzv):
            return (
                (hxv.astype(_F32) + 0.5) * inv_n - half,
                (hyv.astype(_F32) + 0.5) * inv_n - half,
                (hzv.astype(_F32) + 0.5) * inv_n - half,
            )

        def shadow_sweep(sx, sy, sz, tox, toy, toz, active_m):
            """One occlusion sweep from point s toward point `to` using the
            B refs; exclusion cells must already be in the ex refs (or the
            primary-hit refs when ``exclude_primary``).  Returns the 0.0095
            occlusion quotient (wgsl:635-680)."""
            sdx, sdy, sdz = _normalize3(tox - sx, toy - sy, toz - sz)
            _, sfx = vol_slab(sx, sdx)
            _, sfy = vol_slab(sy, sdy)
            _, sfz = vol_slab(sz, sdz)
            sh_tf = jnp.minimum(jnp.minimum(sfx, sfy), sfz)
            store_ray(sx, sy, sz, sdx, sdy, sdz, jnp.zeros_like(sh_tf),
                      sh_tf, active_m)

        # ---- primary sweep ------------------------------------------------
        ux0, uy0, dx0, dy0, dz0, onscreen = pixel_rays()
        ox0, oy0, oz0 = cam_origin()
        nx_, fx_ = vol_slab(ox0, dx0)
        ny_, fy_ = vol_slab(oy0, dy0)
        nz_, fz_ = vol_slab(oz0, dz0)
        tn = jnp.maximum(jnp.maximum(nx_, ny_), nz_)
        tf = jnp.minimum(jnp.minimum(fx_, fy_), fz_)
        active = (tn <= tf) & (tf >= 0.0) & onscreen
        t_start = jnp.maximum(tn, 0.0)
        # Volume exit distance for missed rays — written to out_depth right
        # after the primary sweep so it does not stay live across the
        # shadow/GI sweeps.
        tf_miss = jnp.where(active, tf, 0.0)

        if age_ref is not None:
            age_ref[:] = jnp.full((SUB, LANE), 1, _I32)
        store_ray(ox0, oy0, oz0, dx0, dy0, dz0, t_start, tf, active)
        if debug_no_sweep:
            # Perf attribution only: skip all traversal — isolates the
            # harness + ray setup + shading floor.
            for r in (f_a, hx_a, hy_a, hz_a):
                r[:] = jnp.zeros((SUB, LANE), _I32)
            t_a[:] = jnp.zeros((SUB, LANE), _F32)
            found, t_hit = f_a[:] == 1, t_a[:]
            hx, hy, hz = hx_a[:], hy_a[:], hz_a[:]
        else:
            found, t_hit, hx, hy, hz = sweep(
                vol, coarse, coarse2, zrange, (f_a, t_a, hx_a, hy_a, hz_a),
                rayrefs, cell_half, None, True, ages=ages, age_ref=age_ref,
                scalar_origin=(cam[P_O], cam[P_O + 1], cam[P_O + 2]),
                colmask=colmask, mip1=mip1, w_ref=w_ref,
                alive_ref=alive_ref,
            )
        out_depth[:] = jnp.where(found, t_hit, tf_miss)
        out_idx[:] = jnp.where(
            found, hx + hy * n + hz * n * n, jnp.full((SUB, LANE), -1, _I32)
        )

        # ---- direct shadow (hard, cell-exact) -----------------------------
        if debug_no_sweep or not shadow:
            occl = jnp.ones((SUB, LANE), _F32)
        else:
            qx, qy, qz = (
                ox0 + t_hit * dx0, oy0 + t_hit * dy0, oz0 + t_hit * dz0
            )
            shadow_sweep(qx, qy, qz, lpx, lpy, lpz, found)
            occluded, _, _, _, _ = sweep(
                vol, coarse, coarse2, zrange, (f_b, t_b, hx_b, hy_b, hz_b),
                rayrefs, cell_half, (hx_a, hy_a, hz_a), False, mip1=mip1,
                w_ref=w_ref, alive_ref=alive_ref,
            )
            occl = jnp.where(occluded, jnp.float32(0.0095), jnp.float32(1.0))

        # ---- direct lighting + composition --------------------------------
        uxf, _, dxf, dyf, dzf, _ = pixel_rays()
        oxf, oyf, ozf = cam_origin()
        found = f_a[:] == 1
        thf = t_ref_a()
        qx, qy, qz = oxf + thf * dxf, oyf + thf * dyf, ozf + thf * dzf
        hxv, hyv, hzv = hx_a[:], hy_a[:], hz_a[:]
        cox, coy, coz = cell_center(hxv, hyv, hzv)
        alr, alg, alb = albedo_from(hxv.astype(_F32), hyv.astype(_F32))
        lmag = cam[P_LMAG]
        out_rv, out_gv, out_bv = shade(
            qx, qy, qz, cox, coy, coz, alr, alg, alb,
            oxf, oyf, ozf, lpx, lpy, lpz, lmag, lmag, lmag,
        )

        if age_bits:
            # Age-mapped fade for multi-state rules (matches the reference
            # pipeline's extension: dying cells dim linearly with age);
            # fades the direct term only, like renderer.py:249-256.
            fade = jnp.clip(
                (total_states - age_ref[:]).astype(_F32)
                / jnp.float32(total_states - 1),
                0.0,
                1.0,
            )
            occl = occl * fade
        rgb_r = jnp.where(found, out_rv * occl, 0.0)
        rgb_g = jnp.where(found, out_gv * occl, 0.0)
        rgb_b = jnp.where(found, out_bv * occl, 0.0)
        if not compose:
            out_r[:] = rgb_r
            out_g[:] = rgb_g
            out_b[:] = rgb_b
            return

        # ---- in-kernel frame composition (render_frame_fast semantics) ----
        # Emissive cells add their own radiance, neither shadowed nor
        # age-faded (renderer.py:263-264).
        emis_s = cam[P_EMISS]
        rgb_r = jnp.where(found, rgb_r + cam[P_EMIS] * emis_s, rgb_r)
        rgb_g = jnp.where(found, rgb_g + cam[P_EMIS + 1] * emis_s, rgb_g)
        rgb_b = jnp.where(found, rgb_b + cam[P_EMIS + 2] * emis_s, rgb_b)

        # Temporal EMA against blocked history, cell-id validated
        # (wgsl:429-471; static camera ⇒ same-pixel reprojection).
        idx_val = jnp.where(
            found, hxv + hyv * n + hzv * n * n,
            jnp.full((SUB, LANE), -1, _I32),
        )
        same = (idx_val == prev_idx[:]) & found
        alpha = cam[P_ALPHA]

        def mix(p16, c):
            p = p16.astype(_F32)
            return jnp.where(
                same, jnp.clip(p + (c - p) * alpha, 0.0, 1.0), c
            )

        lr = mix(prev_r[:], rgb_r)
        lg = mix(prev_g[:], rgb_g)
        lb = mix(prev_b[:], rgb_b)

        # Light-source cube (wgsl:866-874): small white cube at the light,
        # drawn only over black pixels.
        lrad = jnp.float32(0.005)
        inv_dxf, inv_dyf, inv_dzf = 1.0 / dxf, 1.0 / dyf, 1.0 / dzf
        lt1x = (lpx - lrad - oxf) * inv_dxf
        lt2x = (lpx + lrad - oxf) * inv_dxf
        lt1y = (lpy - lrad - oyf) * inv_dyf
        lt2y = (lpy + lrad - oyf) * inv_dyf
        lt1z = (lpz - lrad - ozf) * inv_dzf
        lt2z = (lpz + lrad - ozf) * inv_dzf
        ltn = jnp.maximum(
            jnp.maximum(jnp.minimum(lt1x, lt2x), jnp.minimum(lt1y, lt2y)),
            jnp.minimum(lt1z, lt2z),
        )
        ltf = jnp.minimum(
            jnp.minimum(jnp.maximum(lt1x, lt2x), jnp.maximum(lt1y, lt2y)),
            jnp.maximum(lt1z, lt2z),
        )
        black = (lr == 0.0) & (lg == 0.0) & (lb == 0.0)
        lc = (ltn <= ltf) & (ltf >= 0.0) & black
        lr = jnp.where(lc, 1.0, lr)
        lg = jnp.where(lc, 1.0, lg)
        lb = jnp.where(lc, 1.0, lb)

        # History snapshots the scene (incl. light cube), not the overlay.
        # Carried as f32 inside the loop (Mosaic has no f16 type; the extra
        # HBM traffic is ~0.1 ms at 1080p); quantized to the f16
        # FastHistory only at loop exit (renderer_fast.make_fused_loop).
        hist_out[0][:] = lr
        hist_out[1][:] = lg
        hist_out[2][:] = lb

        # Presentation: left-half depth overlay, THEN gamma — the wgsl
        # overwrites `out` with the depth view and gamma-corrects the
        # result (wgsl:880-888), as render_frame_fast does.
        ovm = (cam[P_OVERLAY] == 1.0) & (uxf < 0.5)
        depth_val = out_depth[:]
        base_r = jnp.where(ovm, depth_val, lr)
        base_g = jnp.where(ovm, 0.0, lg)
        base_b = jnp.where(ovm, 0.0, lb)
        inv_g = 1.0 / cam[P_GAMMA]
        out_r[:] = jnp.power(base_r, inv_g)
        out_g[:] = jnp.power(base_g, inv_g)
        out_b[:] = jnp.power(base_b, inv_g)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "width", "height", "shadow", "interpret", "total_states",
        "_column_dilate", "_debug_no_sweep", "use_prepass", "return_blocked",
    ),
)
def raytrace_tiles(
    vol,      # uint32 [W, Z, Y] canonical packed volume (visibility)
    coarse,   # uint32 [Zc, Yc] occupancy (ops.occupancy.coarse_occupancy)
    cam,      # f32 [P_LEN] packed camera/material params
    ages=None,  # optional uint32 [B, W, Z, Y] age bit-planes (multi-state)
    compose_history=None,  # (r, g, b f32, idx i32) tile-blocked history
    *,
    grid_size: int,
    width: int,
    height: int,
    shadow: bool = True,
    interpret: bool = False,
    total_states: int = 2,
    _column_dilate: bool = True,    # perf-attribution toggle; True = exact
    _debug_no_sweep: bool = False,  # perf-attribution toggle; skips traversal
    use_prepass: bool = False,      # patch prepass column masks (exact either
                                    # way; measured net LOSS at bench density —
                                    # its bundle dilation must be one block
                                    # looser than per-ray probes, which
                                    # triggers ~2.6 ms of extra fine descent
                                    # at 256³/1080p.  Kept for sparse scenes.
    return_blocked: bool = False,   # skip the image-layout conversion:
                                    # return (rgb [T·SUB, LANE, 3], depth,
                                    # idx) tile-blocked — the extended-
                                    # lighting loop stays blocked end to end.
):
    """Trace all pixels: (light_rgb [H,W,3], depth [H,W], hit_idx [H,W]).

    With ``compose_history`` (the static-camera production path), the
    kernel instead composes the full frame on-chip and everything stays
    tile-blocked: returns (pres_r, pres_g, pres_b f32, depth f32, idx
    i32, hist_r, hist_g, hist_b f32), each [tiles·SUB, LANE] — convert
    with ``_from_blocks`` when an image is needed."""
    if grid_size > 256:
        raise ValueError("fast path supports grid_size ≤ 256 (VMEM resident)")
    n = grid_size
    y_pad = -(-n // LANE) * LANE
    # z-major 2D layout: slab loads become leading-dim dynamic slices.
    vol2d = jnp.pad(vol, ((0, 0), (0, 0), (0, y_pad - n))).transpose(1, 0, 2)
    vol2d = vol2d.reshape(n, (n // 32) * (y_pad // LANE), LANE)
    # The kernel probes per-column occupancy against x-dilated rows with
    # 3 probe points — conservative-exact for |dxy/dz| ≤ 2; steeper rays
    # carry a force-descend flag (see column_occ / _store_ray).  The
    # undilated rows still feed coarse2 and the z-range gate below.
    from ..ops.occupancy import dilate_occupancy

    coarse_col = (
        dilate_occupancy(coarse, dilate_z=False, dilate_y=False)
        if _column_dilate
        else coarse
    )
    if coarse_col.shape[1] < LANE:
        coarse_col = jnp.pad(coarse_col, ((0, 0), (0, LANE - coarse_col.shape[1])))
    # Plane-level block mip for the per-column fine-plane prefilter
    # (x/y-dilated so a midpoint probe per plane is conservative).
    # Measured on 1×v5e (bench scene, composed frame): mip1 ON 21.44 ms
    # vs OFF 19.23 ms — the 8 coarse gathers + fold per descended column
    # cost more than the skipped fine planes save, so the default is OFF;
    # CA3D_MIP1=1 re-enables it for sparse scenes (exact either way).
    use_mip1 = _os.environ.get("CA3D_MIP1", "0") == "1"
    # CA3D_SLICEGATE=1: slice-gated fine fetches (descend_gated).
    # Measured on 1×v5e (tools/bench_dense.py, gen-230 dense scene,
    # 1.63M cells): 37.1 ms vs 25.0 ms default — a clear LOSS at
    # density (a dense tile's probes flag most slices anyway, so the
    # one-hot prepass + 16 gated regions outweigh the saved gathers),
    # and its Mosaic compile runs ~10× longer.  Kept opt-in for sparse
    # scenes; exact either way.
    use_slicegate = _os.environ.get("CA3D_SLICEGATE", "0") == "1"
    if use_slicegate:
        use_mip1 = False  # descent path is replaced wholesale
    if use_mip1:
        from ..ops.occupancy import plane_occupancy

        mip1 = dilate_occupancy(
            plane_occupancy(vol), dilate_z=False, yc=n // 8, dilate_y=True
        )
        if mip1.shape[1] < LANE:
            mip1 = jnp.pad(mip1, ((0, 0), (0, LANE - mip1.shape[1])))
    age_bits = 0 if ages is None else int(ages.shape[0])
    if ages is not None:
        ages2d = jnp.pad(ages, ((0, 0), (0, 0), (0, 0), (0, y_pad - n)))
        # (y_pad is already a multiple of LANE)
        ages2d = ages2d.transpose(0, 2, 1, 3).reshape(
            age_bits * n, (n // 32) * (y_pad // LANE), LANE
        )
    nbx = pl.cdiv(width, BW)
    nby = pl.cdiv(height, BH)
    tiles = nbx * nby
    compose = compose_history is not None
    kernel = _make_kernel(
        grid_size, shadow, width, height, age_bits, total_states,
        debug_no_sweep=_debug_no_sweep, compose=compose,
        use_colmask=use_prepass, use_mip1=use_mip1,
        use_slicegate=use_slicegate,
    )

    out_shape = [
        jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.int32),
    ]
    if compose:
        out_shape += [
            jax.ShapeDtypeStruct((tiles * SUB, LANE), jnp.float32)
        ] * 3
    out_spec = pl.BlockSpec((SUB, LANE), lambda t: (t, 0))
    scratch = [
        pltpu.VMEM((SUB, LANE), jnp.int32),    # f_a
        pltpu.VMEM((SUB, LANE), jnp.float32),  # t_a
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hx_a
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hy_a
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hz_a
        pltpu.VMEM((SUB, LANE), jnp.int32),    # f_b
        pltpu.VMEM((SUB, LANE), jnp.float32),  # t_b
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hx_b
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hy_b
        pltpu.VMEM((SUB, LANE), jnp.int32),    # hz_b
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_ox
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_oy
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_oz
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_dx
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_dy
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_dz
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_t0
        pltpu.VMEM((SUB, LANE), jnp.float32),  # r_t1
        pltpu.VMEM((SUB, LANE), jnp.int32),    # r_flags
    ]
    # Supercolumn occupancy: z-OR of each 4 coarse rows, dilated one block
    # in x/y (see dilate_occupancy) so the kernel's 3-point probe over a
    # 4-column span stays conservative-exact for |dxy/dz| ≤ 1 rays
    # (steeper rays skip this gate via the steep_super flag).
    nc_groups = (grid_size // 8) // 4
    c4 = coarse[: nc_groups * 4].reshape(nc_groups, 4, -1)
    coarse2 = c4[:, 0] | c4[:, 1] | c4[:, 2] | c4[:, 3]
    coarse2 = dilate_occupancy(coarse2)
    if coarse2.shape[1] < LANE:
        coarse2 = jnp.pad(coarse2, ((0, 0), (0, LANE - coarse2.shape[1])))

    # Global occupied z-range (coarse rows): lets the kernel skip whole
    # column groups with one scalar compare.  Empty volume → inverted range.
    row_any = jnp.any(coarse != 0, axis=1)
    nc_ = grid_size // 8
    idxs = jnp.arange(nc_, dtype=jnp.int32)
    any_any = jnp.any(row_any)
    zmin = jnp.where(any_any, jnp.min(jnp.where(row_any, idxs, nc_)), nc_)
    zmax = jnp.where(any_any, jnp.max(jnp.where(row_any, idxs, -1)), -1)
    # [zmin, zmax, z0]: the fused path is always the full volume (z0 = 0).
    zrange = jnp.stack([zmin, zmax, jnp.zeros_like(zmin)]).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    inputs = [cam, zrange, vol2d, coarse_col, coarse2]
    if use_mip1:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(mip1)
    if use_prepass:
        # Patch prepass: per-8×8-patch conservative column masks — removes
        # every coarse-occupancy gather from the primary sweep.
        if _debug_no_sweep:
            mask_in = jnp.zeros((tiles * SUB, LANE), jnp.int32)
        else:
            mask_in = _prepass_mask(coarse, cam, n, width, height, interpret)
        in_specs.append(pl.BlockSpec((SUB, LANE), lambda t: (t, 0)))
        inputs.append(mask_in)
    if compose:
        in_specs += [pl.BlockSpec((SUB, LANE), lambda t: (t, 0))] * 4
        inputs += list(compose_history)
    if age_bits:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(ages2d)
        scratch.append(pltpu.VMEM((SUB, LANE), jnp.int32))  # age_ref
    if use_slicegate:
        # Per-plane prefetched words for descend_gated (8 planes/column).
        scratch.append(pltpu.VMEM((8 * SUB, LANE), jnp.uint32))
    scratch.append(pltpu.SMEM((1,), jnp.int32))  # sticky any-alive scalar
    # Default SUB=256 fits Mosaic's 16 MiB scoped-vmem cap; tile-size
    # experiments (CA3D_SUB=512 doubles every tile ref) need it raised —
    # v5e has 128 MiB, and this kernel streams only the pixel blocks.
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        if SUB > 256 else None
    )
    outs = pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=[out_spec] * len(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )(*inputs)

    if compose:
        return outs  # blocked (see docstring)
    r, g, b, depth, idx = outs
    if return_blocked:
        return jnp.stack([r, g, b], axis=-1), depth, idx

    def unflat(x):
        return _from_blocks(x, width, height)

    rgb = jnp.stack([unflat(r), unflat(g), unflat(b)], axis=-1)
    return rgb, unflat(depth), unflat(idx)
