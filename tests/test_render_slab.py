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


def test_sliced_matches_fused_random_scene():
    rng = np.random.default_rng(9)
    dense = (rng.random((N, N, N)) < 0.02).astype(np.uint8)
    (f_rgb, f_d, f_i), (s_rgb, s_d, s_i) = both(dense, shadow=False)
    np.testing.assert_array_equal(s_i, f_i)
    np.testing.assert_allclose(s_d, f_d, atol=2e-5)
    np.testing.assert_allclose(s_rgb, f_rgb, rtol=2e-3, atol=2e-4)


def test_sliced_matches_fused_with_shadows():
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 24:40, 24:40] = 1     # wall
    dense[44:46, 34:44, 30:34] = 1  # occluder toward the light
    (f_rgb, f_d, f_i), (s_rgb, s_d, s_i) = both(dense, shadow=True)
    np.testing.assert_array_equal(s_i, f_i)
    np.testing.assert_allclose(s_rgb, f_rgb, rtol=2e-3, atol=2e-4)


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
