"""Sliced (z-slab) fast path vs the fused kernel: exact differential tests.

The sliced path exists for grids > 256³, but its math is grid-size
independent — running it on a 64³ scene with forced 32-plane slabs
exercises slab-local traversal, min-t compositing, the XLA shading path
and the per-slab shadow kernels, all comparable bit-for-bit(ish) against
the fused kernel's output.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.render.render_fast import raytrace_tiles, pack_cam
from cellularautomatons3d_tpu.render.render_slab import raytrace_sliced, slab_extent
from cellularautomatons3d_tpu.utils import mat4


import jax as _jax
import pytest as _pytest


@_pytest.fixture(autouse=True)
def _eager_interpret():
    """Run every test in this module under disable_jit: the one-module
    jitted-interpret compiles of these render graphs crash the CPU XLA
    compiler nondeterministically (stack-limit-adjacent recursive pass);
    eager execution compiles each interpreted kernel as its own bounded
    module.  Semantics are unchanged (jit == eager by construction); the
    jitted composition runs on-chip in tests/test_tpu_kernel.py."""
    with _jax.disable_jit():
        yield

N = 64
W_IMG, H_IMG = 128, 64


def cam_for(view, **kw):
    args = dict(
        width=W_IMG, height=H_IMG,
        light_pos=(0.721, 1.0, 1.0), light_magnitude=5.0,
        cell_size=0.85, roughness=0.29,
        base_reflectivity=(0.17, 0.17, 0.17), material_color=(0.0, 0.0, 0.0),
    )
    args.update(kw)
    return jnp.asarray(pack_cam(view, **args))


def both(dense, shadow, view=None, **extra):
    view = mat4.initial_view_matrix() if view is None else view
    vol = jnp.asarray(ca.pack_grid(dense))
    cam = cam_for(view, **extra)
    fused = raytrace_tiles(
        vol, coarse_occupancy(vol), cam,
        grid_size=N, width=W_IMG, height=H_IMG, shadow=shadow, interpret=True,
    )
    sliced = raytrace_sliced(
        vol, cam, grid_size=N, width=W_IMG, height=H_IMG, shadow=shadow,
        interpret=True, slab_planes=32,
    )
    return [np.asarray(x) for x in fused], [np.asarray(x) for x in sliced]


@pytest.mark.heavy
def test_sliced_matches_fused_random_scene():
    rng = np.random.default_rng(9)
    dense = (rng.random((N, N, N)) < 0.02).astype(np.uint8)
    (f_rgb, f_d, f_i), (s_rgb, s_d, s_i) = both(dense, shadow=False)
    np.testing.assert_array_equal(s_i, f_i)
    np.testing.assert_allclose(s_d, f_d, atol=2e-5)
    np.testing.assert_allclose(s_rgb, f_rgb, rtol=2e-3, atol=2e-4)


@pytest.mark.heavy
def test_sliced_matches_fused_with_shadows():
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 24:40, 24:40] = 1     # wall
    dense[44:46, 34:44, 30:34] = 1  # occluder toward the light
    (f_rgb, f_d, f_i), (s_rgb, s_d, s_i) = both(dense, shadow=True)
    np.testing.assert_array_equal(s_i, f_i)
    np.testing.assert_allclose(s_rgb, f_rgb, rtol=2e-3, atol=2e-4)


@pytest.mark.heavy
def test_sliced_shadow_crosses_slab_boundary():
    """Occluders in a different slab than the lit surface must still cast
    shadows: the shadow kernels OR occlusion across all slabs."""
    dense = np.zeros((N, N, N), np.uint8)
    dense[20, 31, 31] = 1    # target in slab 0 (z < 32)
    dense[40, 38:48, 31] = 1  # occluder column in slab 1 (z ≥ 32)
    (f_rgb, _, f_i), (s_rgb, _, s_i) = both(dense, shadow=True)
    np.testing.assert_array_equal(s_i, f_i)
    target = 31 + 31 * N + 20 * N * N
    np.testing.assert_allclose(
        s_rgb[s_i == target], f_rgb[f_i == target], rtol=2e-3, atol=2e-4
    )


@pytest.mark.heavy
def test_sliced_rotated_camera():
    rng = np.random.default_rng(3)
    dense = (rng.random((N, N, N)) < 0.03).astype(np.uint8)
    view = mat4.translate(
        mat4.rotate(mat4.initial_view_matrix(), (0, 1, 0), 1.1), (0, 0, 0.2)
    )
    (f_rgb, f_d, f_i), (s_rgb, s_d, s_i) = both(dense, shadow=False, view=view)
    np.testing.assert_array_equal(s_i, f_i)
    np.testing.assert_allclose(s_rgb, f_rgb, rtol=2e-3, atol=2e-4)


def test_slab_extent_sizing():
    assert slab_extent(512) == 256   # 8 MiB of packed words
    assert slab_extent(320) == 320   # whole volume fits one slab
    assert slab_extent(64) == 64


@pytest.mark.heavy
def test_sliced_multigroup_320_matches_oracle():
    """N=320 exercises the multi-x-group coarse layout that 512³ uses and
    64³ tests cannot reach: group-major coarse rows (nbk = 40 > 32,
    render_fast.fetch_coarse_bit's group branch), cross-group dilation
    carries (ops/occupancy.dilate_occupancy xg=2) and the 10-word
    fine-fetch chain with 3 y-lane chunks.  Verified pixel-exact against
    the per-pixel DDA oracle on a small window."""
    from tests.test_render_fast import COT_HALF_FOV  # noqa: F401

    n = 320
    w_img, h_img = 64, 32
    rng = np.random.default_rng(17)
    dense = np.zeros((n, n, n), np.uint8)
    # Cells clustered near the camera axis plus sprinkles crossing the
    # x-group boundary (x = 256) and the lane-chunk boundaries (y = 128,
    # 256) so every layout branch carries live occupancy.
    pts = rng.integers(100, 220, (40, 3))
    dense[pts[:, 0], pts[:, 1], pts[:, 2]] = 1
    dense[160, 160, 252:260] = 1   # straddles x-group boundary
    dense[160, 124:132, 160] = 1   # straddles y lane-chunk boundary
    dense[42, 200, 300] = 1        # high-x, group 1
    # A solid block so the tiny window is guaranteed visible hits (single
    # cells at 1/320 pitch can fall between 64×32 pixel centers).
    dense[150:170, 150:170, 150:170] = 1

    view = mat4.initial_view_matrix()
    vol = jnp.asarray(ca.pack_grid(dense))
    cam = jnp.asarray(pack_cam(
        view, width=w_img, height=h_img,
        light_pos=(0.721, 1.0, 1.0), light_magnitude=5.0,
        cell_size=0.85, roughness=0.29,
        base_reflectivity=(0.17, 0.17, 0.17), material_color=(0.0, 0.0, 0.0),
    ))
    # disable_jit + 32-plane slabs: at n = 320 a jitted interpret-mode
    # graph (slab launches × 10-word × 3-chunk unrolled fetch chains in
    # one module) is deep enough to crash the CPU XLA compiler (stack
    # overflow in a recursive pass); eager execution compiles each
    # interpreted kernel as its own bounded module.  TPU runs are
    # unaffected (each kernel is a separate Mosaic compile).
    import jax

    with jax.disable_jit():
        rgb, depth, idx = raytrace_sliced(
            vol, cam, grid_size=n, width=w_img, height=h_img, shadow=False,
            interpret=True, slab_planes=32,
        )
    idx = np.asarray(idx)

    # --- per-pixel DDA oracle (spec of the kernel; test_render_fast) ----
    o = view[:3, 3].astype(np.float64)
    rot = view[:3, :3]
    half, cell_half = 0.5, 0.85 / n * 0.5
    o_idx = np.full((h_img, w_img), -1, np.int64)
    occupied_z = np.nonzero(dense.any(axis=(1, 2)))[0]
    for py in range(h_img):
        for px in range(w_img):
            ux = (px + 0.5) / w_img
            uy = 1.0 - (py + 0.5) / h_img
            r = np.array(
                [(ux - 0.5) * (w_img / h_img), uy - 0.5, -0.5 * COT_HALF_FOV]
            )
            r /= np.linalg.norm(r)
            d = rot @ r
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (-half - o) / d
                t2 = (half - o) / d
            tn, tf = np.minimum(t1, t2).max(), np.maximum(t1, t2).min()
            if not (tn <= tf and tf >= 0):
                continue
            t_start = max(tn, 0.0)
            ks = occupied_z if d[2] > 0 else occupied_z[::-1]
            for k in ks:  # only occupied planes can produce a hit
                with np.errstate(divide="ignore", invalid="ignore"):
                    ta = (k / n - half - o[2]) / d[2]
                    tb = ((k + 1) / n - half - o[2]) / d[2]
                lo, hi = max(min(ta, tb), t_start), min(max(ta, tb), tf)
                if not lo < hi:
                    continue
                tm = 0.5 * (lo + hi)
                cx = int(np.clip(np.floor((o[0] + tm * d[0] + half) * n), 0, n - 1))
                cy = int(np.clip(np.floor((o[1] + tm * d[1] + half) * n), 0, n - 1))
                if not dense[k, cy, cx]:
                    continue
                cc = (np.array([cx, cy, k]) + 0.5) / n - half
                with np.errstate(divide="ignore", invalid="ignore"):
                    a = (cc - cell_half - o) / d
                    b = (cc + cell_half - o) / d
                tnn, tff = np.minimum(a, b).max(), np.maximum(a, b).min()
                if tnn <= tff and tff >= t_start:
                    o_idx[py, px] = cx + cy * n + k * n * n
                    break
    np.testing.assert_array_equal(idx, o_idx)
    assert (idx >= 0).sum() > 0  # scene is visible


def test_cell_state_batch_matches_gather_oracle():
    """The in-kernel cell-state lookups must equal intersect's
    clamp-then-wrap gather lookups (the GI path's former implementation)
    for arbitrary target coords — including edge-diagonal GI layer slots,
    volume edges and out-of-range clamped bases — across slabs."""
    from cellularautomatons3d_tpu.render.intersect import get_cell_state
    from cellularautomatons3d_tpu.render.render_slab import (
        cell_state_batch,
        prep_slabs,
    )

    n = N
    rng = np.random.default_rng(21)
    dense = (rng.random((n, n, n)) < 0.2).astype(np.uint8)
    vol = jnp.asarray(ca.pack_grid(dense))
    h, w = 16, 32
    prepped = prep_slabs(vol, [(0, 32), (32, 32)], n)
    packed_flat = vol.reshape(-1)

    # Four queries mirroring GI slot shapes: random bases plus diagonal
    # offsets, biased to edges (0, n-1) and one clamped base (y = n).
    queries = []
    wants = []
    for qi, off in enumerate([(1, 0, 1), (-1, 0, 1), (0, 1, -1), (0, 0, 0)]):
        coords = rng.integers(0, n, (h, w, 3)).astype(np.int32)
        coords[0, :5] = [0, 0, 0]
        coords[1, :5] = [n - 1, n - 1, n - 1]
        coords[2, 0] = [5, n, 7]
        n_cl = np.maximum(coords + np.asarray(off, np.int32), 0)
        active = rng.random((h, w)) < 0.9
        queries.append((jnp.asarray(n_cl), jnp.asarray(active)))
        wants.append(
            (np.asarray(get_cell_state(packed_flat, jnp.asarray(n_cl), n)),
             active)
        )
    got = cell_state_batch(
        queries, prepped, grid_size=n, width=w, height=h, interpret=True
    )
    for qi, (g, (want, active)) in enumerate(zip(got, wants)):
        np.testing.assert_array_equal(
            np.asarray(g)[active], want[active], err_msg=f"query {qi}"
        )



# ------------------------------------------------------ x-chunked bricks --
#
# Grids > 512 decompose along x as well as z (render_slab.brick_layout):
# the traversal's fine-fetch where-chain and coarse rows then cover one
# 8-word x-chunk per brick, with the brick's word offset as a runtime
# scalar (render_fast._make_traversal x_words).  The brick math is
# grid-size independent — forcing 32-cell chunks on a 64³ scene exercises
# chunk-local fetches, out-of-chunk probe clamping, cross-chunk dilation
# carries and the min-t composite, comparable against the unchunked
# sliced path (itself differential-tested against the fused kernel).


def _bricked(dense, shadow, view=None, x_cells=32, **extra):
    view = mat4.initial_view_matrix() if view is None else view
    vol = jnp.asarray(ca.pack_grid(dense))
    cam = cam_for(view, **extra)
    plain = raytrace_sliced(
        vol, cam, grid_size=N, width=W_IMG, height=H_IMG, shadow=shadow,
        interpret=True, slab_planes=32,
    )
    bricked = raytrace_sliced(
        vol, cam, grid_size=N, width=W_IMG, height=H_IMG, shadow=shadow,
        interpret=True, slab_planes=32, x_chunk_cells=x_cells,
    )
    return [np.asarray(x) for x in plain], [np.asarray(x) for x in bricked]


@pytest.mark.heavy
def test_bricked_matches_sliced_random_scene():
    rng = np.random.default_rng(13)
    dense = (rng.random((N, N, N)) < 0.02).astype(np.uint8)
    dense[20:24, 28:36, 30:34] = 1  # block straddling the x=32 chunk seam
    (p_rgb, p_d, p_i), (b_rgb, b_d, b_i) = _bricked(dense, shadow=False)
    np.testing.assert_array_equal(b_i, p_i)
    np.testing.assert_allclose(b_d, p_d, atol=2e-5)
    np.testing.assert_allclose(b_rgb, p_rgb, rtol=2e-3, atol=2e-4)


@pytest.mark.heavy
def test_bricked_shadow_crosses_chunk_boundary():
    """Occluders in a different x-chunk than the lit surface must still
    cast shadows (occlusion ORs over bricks), and a surface adjacent to
    the chunk seam must not lose its hit (out-of-chunk probe clamping)."""
    dense = np.zeros((N, N, N), np.uint8)
    dense[20, 31, 10] = 1      # target in x-chunk 0
    dense[24:34, 38, 50] = 1   # occluder bar in x-chunk 1
    dense[22, 30, 31:33] = 1   # pair straddling the seam
    view = mat4.translate(
        mat4.rotate(mat4.initial_view_matrix(), (0, 1, 0), 0.8), (0, 0, 0.1)
    )
    (p_rgb, _, p_i), (b_rgb, _, b_i) = _bricked(dense, shadow=True, view=view)
    np.testing.assert_array_equal(b_i, p_i)
    np.testing.assert_allclose(b_rgb, p_rgb, rtol=2e-3, atol=2e-4)


def test_brick_layout_shapes():
    from cellularautomatons3d_tpu.render.render_slab import brick_layout

    bricks, xw = brick_layout(1024)
    assert xw == 8                      # 256-cell chunks
    zs = sorted({b[0] for b in bricks})
    gis = sorted({b[2] for b in bricks})
    assert gis == [0, 1, 2, 3] and len(bricks) == len(zs) * 4
    assert all(z % 32 == 0 for z in zs)
    # ≤ 512 stays unchunked.
    bricks512, xw512 = brick_layout(512)
    assert xw512 is None and all(b[2] is None for b in bricks512)
