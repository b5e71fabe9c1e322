"""mat4 vs wgpu-matrix semantics (libs/wgpu-matrix.module.js) and the app's
startup camera (main_pathtraced.js:207-220)."""

import numpy as np

from cellularautomatons3d_tpu.utils import mat4


def test_look_at_is_view_matrix():
    # wgpu-matrix lookAt (module.js:3339-3364): rows are camera axes,
    # translation is -axis·eye.
    m = mat4.look_at((0, 0, 1), (0, 0, 0), (0, 1, 0))
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(m[:3, 3], [0, 0, -1], atol=1e-7)


def test_initial_view_matrix_position():
    # lookAt then translate(+1.75 z): net camera-to-world with the camera at
    # (0, 0, 0.75) — just outside the [-0.5, 0.5]³ volume.
    m = mat4.initial_view_matrix()
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(m[:3, 3], [0, 0, 0.75], atol=1e-6)


def test_perspective_webgpu_depth():
    # wgpu-matrix perspective (module.js:3140-3167): 0..1 clip depth.
    p = mat4.perspective(np.deg2rad(75.0), 16 / 9, 0.01, 1000.0)
    f = 1.0 / np.tan(np.deg2rad(75.0) / 2)
    np.testing.assert_allclose(p[0, 0], f / (16 / 9), rtol=1e-6)
    np.testing.assert_allclose(p[1, 1], f, rtol=1e-6)
    assert p[3, 2] == -1.0
    # Point on the near plane (z = -near) maps to depth 0.
    v = p @ np.array([0, 0, -0.01, 1], dtype=np.float32)
    np.testing.assert_allclose(v[2] / v[3], 0.0, atol=1e-6)


def test_translate_is_local_space():
    # translate post-multiplies (module.js:3400-3440): translation happens
    # in the matrix's local axes.
    m = mat4.rotate(mat4.identity(), (0, 1, 0), np.pi / 2)
    t = mat4.translate(m, (0, 0, 1.0))
    # Local -z... local z axis after +90° yaw points along world +x.
    np.testing.assert_allclose(t[:3, 3], [1, 0, 0], atol=1e-6)


def test_rotate_axis_angle():
    r = mat4.axis_rotation((0, 0, 1), np.pi / 2)
    v = r @ np.array([1, 0, 0, 1], dtype=np.float32)
    np.testing.assert_allclose(v[:3], [0, 1, 0], atol=1e-6)


def test_flat_roundtrip():
    m = mat4.initial_projection_matrix(1920, 1080)
    np.testing.assert_array_equal(mat4.from_flat(mat4.to_flat(m)), m)


def test_inverse_multiply():
    m = mat4.translate(mat4.rotate(mat4.identity(), (1, 2, 3), 0.7), (1, 2, 3))
    ident = mat4.multiply(m, mat4.inverse(m))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)
