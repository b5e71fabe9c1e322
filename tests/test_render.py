"""Renderer tests: pure-function math (SURVEY.md §4 item 4) plus
deterministic full-frame golden checks at pinned time/camera."""

import numpy as np
import jax.numpy as jnp
import pytest

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.render import (
    ray_cube_intersect,
    sd_box,
    cube_face_normal,
    cell_from_sample_point,
    get_cell_state,
    nrand,
    pixel_uvs,
    get_ray,
    RenderStatic,
    RenderParams,
    render_frame,
    init_history,
)
from cellularautomatons3d_tpu.utils import mat4

N = 32
W, H = 64, 48


def make_params(view=None, t=0.1, **kw):
    if view is None:
        view = mat4.initial_view_matrix()
    proj = mat4.initial_projection_matrix(W, H)
    proj_view = mat4.multiply(proj, mat4.inverse(view))
    defaults = dict(
        view_mat=jnp.asarray(view),
        prev_view_mat=jnp.asarray(view),
        prev_proj_view=jnp.asarray(proj_view),
        elapsed_time=jnp.float32(t),
        cell_size=jnp.float32(0.85),
        temporal_alpha=jnp.float32(0.1),
        gamma=jnp.float32(2.0),
        roughness=jnp.float32(0.29),
        base_reflectivity=jnp.full((3,), 0.17, jnp.float32),
        material_color=jnp.zeros((3,), jnp.float32),
        light_pos=jnp.asarray([0.721, 1.0, 1.0], jnp.float32),
        light_magnitude=jnp.float32(5.0),
        show_depth_overlay=jnp.float32(0.0),
    )
    defaults.update(kw)
    return RenderParams(**defaults)


def center_block_grid(lo=12, hi=20):
    dense = np.zeros((N, N, N), np.uint8)
    dense[lo:hi, lo:hi, lo:hi] = 1
    return jnp.asarray(ca.pack_grid(dense))


# --- pure functions ---------------------------------------------------------


def test_ray_cube_intersect_through_center():
    tn, tf = ray_cube_intersect(
        jnp.array([0.0, 0.0, 2.0]),
        jnp.array([0.0, 0.0, -1.0]),
        jnp.float32(0.0),
        jnp.float32(0.5),
    )
    np.testing.assert_allclose(tn, 1.5, atol=1e-6)
    np.testing.assert_allclose(tf, 2.5, atol=1e-6)


def test_ray_cube_intersect_miss():
    tn, tf = ray_cube_intersect(
        jnp.array([2.0, 2.0, 2.0]),
        jnp.array([0.0, 0.0, -1.0]),
        jnp.float32(0.0),
        jnp.float32(0.5),
    )
    assert tn > tf  # miss ⇒ empty interval


def test_sd_box_inside_outside():
    b = jnp.full((3,), 0.5, jnp.float32)
    assert sd_box(jnp.array([0.0, 0.0, 0.0]), b) < 0
    np.testing.assert_allclose(sd_box(jnp.array([0.0, 0.0, 1.0]), b), 0.5, atol=1e-6)
    np.testing.assert_allclose(sd_box(jnp.array([0.5, 0.0, 0.0]), b), 0.0, atol=1e-6)


def test_cube_face_normal_priority():
    o = jnp.zeros((3,))
    np.testing.assert_allclose(
        cube_face_normal(jnp.array([0.5, 0.1, 0.1]), o), [1, 0, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        cube_face_normal(jnp.array([0.0, -0.5, 0.1]), o), [0, -1, 0], atol=1e-6
    )
    # Tie x == y: x wins (reference if/else order, wgsl:239-251).
    np.testing.assert_allclose(
        cube_face_normal(jnp.array([0.5, 0.5, 0.0]), o), [1, 0, 0], atol=1e-6
    )


def test_cell_from_sample_point():
    coords, origin, idx = cell_from_sample_point(jnp.array([0.0, 0.0, 0.0]), N)
    # Point at volume center: cell N/2 on each axis.
    np.testing.assert_array_equal(coords, [16, 16, 16])
    np.testing.assert_allclose(origin, (16 + 0.5) / N - 0.5, atol=1e-6)
    assert int(idx) == 16 + 16 * N + 16 * N * N


def test_get_cell_state_wraps():
    dense = np.zeros((N, N, N), np.uint8)
    dense[0, 0, 0] = 1
    flat = jnp.asarray(ca.pack_grid(dense)).reshape(-1)
    assert int(get_cell_state(flat, jnp.array([0, 0, 0]), N)) == 1
    # Coordinate N wraps to 0 on every axis (wgsl:268-290).
    assert int(get_cell_state(flat, jnp.array([N, N, N]), N)) == 1
    assert int(get_cell_state(flat, jnp.array([1, 0, 0]), N)) == 0


def test_nrand_deterministic_and_in_range():
    uv = pixel_uvs(W, H).reshape(-1, 2)
    r1 = np.asarray(nrand(uv))
    r2 = np.asarray(nrand(uv))
    np.testing.assert_array_equal(r1, r2)
    assert (r1 >= 0).all() and (r1 < 1).all()
    # The sin-fract hash is low quality (many collisions in f32) but must
    # still vary across pixels.
    assert np.unique(r1).size > 100


def test_get_ray_center_pixel_points_forward():
    ray = np.asarray(get_ray(jnp.array([0.5, 0.5]), jnp.array([W, H], jnp.float32)))
    np.testing.assert_allclose(ray, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(ray), 1.0, rtol=1e-6)


# --- full frame --------------------------------------------------------------


def test_frame_deterministic():
    packed = center_block_grid()
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=20, shadow_samples=10)
    f1, _ = render_frame(s, packed, make_params(), init_history(W, H))
    f2, _ = render_frame(s, packed, make_params(), init_history(W, H))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_frame_hits_block_with_expected_depth():
    packed = center_block_grid()
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=60, shadow_samples=10)
    frame, hist = render_frame(s, packed, make_params(), init_history(W, H))
    frame = np.asarray(frame)
    depth = np.asarray(hist.depth)[..., 0]
    cy, cx = H // 2, W // 2
    assert frame[cy, cx].sum() > 0.01  # center pixel lit
    # Camera at z=0.75; block front face at z = 20/32 - 0.5 = 0.125 with the
    # visible cube inset (cell*0.85) ⇒ depth ≈ 0.625 + small inset.
    assert 0.6 < depth[cy, cx] < 0.66
    # Corners: empty space, depth = distance to volume exit or 0 if missed.
    assert frame[0, 0].sum() == 0.0


def test_empty_grid_renders_black_volume():
    packed = jnp.zeros((N // 32, N, N), jnp.uint32)
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=20, shadow_samples=10)
    frame, _ = render_frame(s, packed, make_params(), init_history(W, H))
    f = np.asarray(frame)
    # No cells, light cube behind camera ⇒ fully black.
    assert f.max() == 0.0


def test_light_cube_drawn_when_visible():
    packed = jnp.zeros((N // 32, N, N), jnp.uint32)
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=20, shadow_samples=10)
    # The light cube is tiny (0.005 half extents, wgsl:866) — sub-pixel at
    # this resolution unless placed exactly on a pixel-center ray.
    cy, cx = H // 2, W // 2
    uv = np.asarray(pixel_uvs(W, H))[cy, cx]
    ray = np.asarray(get_ray(jnp.asarray(uv), jnp.array([W, H], jnp.float32)))
    cam = np.array([0.0, 0.0, 0.75], np.float32)
    light_pos = cam + ray * 1.5
    p = make_params(light_pos=jnp.asarray(light_pos))
    frame, _ = render_frame(s, packed, p, init_history(W, H))
    f = np.asarray(frame)
    np.testing.assert_allclose(f[cy, cx], 1.0, atol=1e-6)  # white light cube
    assert (f.sum(-1) > 0).sum() < 20  # only a few pixels


def test_depth_overlay():
    packed = center_block_grid()
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=20, shadow_samples=10)
    p = make_params(show_depth_overlay=jnp.float32(1.0))
    frame, hist = render_frame(s, packed, p, init_history(W, H))
    f = np.asarray(frame)
    d = np.asarray(hist.depth)[..., 0]
    # Left half shows pow(depth, 1/γ) in the red channel, g=b=0.
    left = f[:, : W // 2]
    assert (left[..., 1:] == 0).all()
    cy = H // 2
    np.testing.assert_allclose(
        left[cy, 5, 0], np.float32(d[cy, 5]) ** 0.5, rtol=2e-2, atol=1e-3
    )


def test_temporal_accumulation_mixes_history():
    packed = center_block_grid()
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=60, shadow_samples=10)
    p = make_params()
    f1, h1 = render_frame(s, packed, p, init_history(W, H))
    f2, h2 = render_frame(s, packed, p, h1)
    # Static camera + same rnd: frame 2 = clamp(mix(prev, cur, α)) with
    # prev ≈ cur ⇒ nearly identical but not byte-identical (f16 history).
    a, b = np.asarray(f1), np.asarray(f2)
    assert np.abs(a - b).max() < 5e-2
    cy, cx = H // 2, W // 2
    assert b[cy, cx].sum() > 0.01


def test_moving_camera_rejects_out_of_view_history():
    packed = center_block_grid()
    s = RenderStatic(width=W, height=H, grid_size=N, depth_samples=30, shadow_samples=10)
    p1 = make_params()
    _, h1 = render_frame(s, packed, p1, init_history(W, H))
    # Rotate the camera 90°: reprojected uv leaves [0,1] ⇒ current sample
    # only — must not crash and must still produce a valid frame.
    view2 = mat4.rotate(mat4.initial_view_matrix(), (0, 1, 0), np.pi / 2)
    p2 = make_params(view=view2)
    f2, _ = render_frame(s, packed, p2, h1)
    assert np.isfinite(np.asarray(f2)).all()
