"""Camera: per-pixel UV/ray generation and the interactive camera rig.

Replicates the reference's camera model exactly:

* the fragment shader's fixed 75° FOV ray from UV
  (pathtraced_fragment_clustered.wgsl:69,188-197), with the aspect ratio
  from the window size;
* UV convention of the fullscreen quad: ``(0,0)`` at the bottom-left, y up
  (pathtraced_vertex.wgsl + quad vertices, main_pathtraced.js:971-996) —
  pixel row 0 (top) has uv.y ≈ 1;
* the startup camera (main_pathtraced.js:207-213) and the WASD/arrow/mouse
  rig (main_pathtraced.js:858-968) as a host-side :class:`CameraRig`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import mat4

__all__ = ["COT_HALF_FOV", "pixel_uvs", "get_ray", "CameraRig"]

# COT_HALF_FOV: 1/tan(37.5°) — the shader hard-codes the half angle
# (pathtraced_fragment_clustered.wgsl:68-69).
PI_OVER_180 = np.float32(np.pi / 180.0)
COT_HALF_FOV = np.float32(1.0) / np.float32(np.tan(np.float32(37.5) * PI_OVER_180))

TRANSLATION_SPEED = 1.0   # main_pathtraced.js:6
ROTATION_SPEED = 1.25     # main_pathtraced.js:7
MIN_SPEED_MUL = 0.001     # main_pathtraced.js:8
MAX_SPEED_MUL = 100.0     # main_pathtraced.js:9


def pixel_uvs(width: int, height: int):
    """Per-pixel quad UVs, shape [H, W, 2], row 0 = top of screen.

    Rasterized fragment at pixel (i, j) samples the interpolated vUv at the
    pixel centre: uv.x = (i+0.5)/W, uv.y = 1 - (j+0.5)/H (clip-space y up).
    """
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u, v = jnp.meshgrid(xs, ys)  # [H, W]
    return jnp.stack([u, v], axis=-1)


def get_ray(uv, window_size):
    """Camera-space ray from UV (pathtraced_fragment_clustered.wgsl:188-197).

    uv: [..., 2]; window_size: (w, h) f32. Returns normalized [..., 3].
    """
    r = window_size[0] / window_size[1]
    xy = uv - 0.5
    x = xy[..., 0] * r
    y = xy[..., 1]
    z = jnp.full_like(x, 0.5 * COT_HALF_FOV)
    ray = jnp.stack([x, y, -z], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class CameraRig:
    """Host-side interactive camera: the WASD/R/F translate, arrows/Q/E and
    mouse-look rotate, wheel speed-multiplier model of the reference
    (main_pathtraced.js:858-968,799-806).

    ``view_mat`` is the camera-to-world matrix consumed by the renderer
    (column 3 = camera position, pathtraced_fragment_clustered.wgsl:812).
    """

    def __init__(self):
        self.view_mat = mat4.initial_view_matrix()
        self.prev_view_mat = mat4.identity()
        self.prev_proj_view = mat4.identity()
        self.translation_speed_mul = 0.2  # main_pathtraced.js:115

    # -- input --------------------------------------------------------------
    def translate(self, direction, dt_seconds: float):
        """direction: (x, y, z) in camera-local axes, each in {-1, 0, 1}
        (W/S = ∓z, A/D = ∓x, R/F = ±y: main_pathtraced.js:864-892)."""
        v = np.asarray(direction, dtype=np.float32) * np.float32(
            TRANSLATION_SPEED * self.translation_speed_mul * dt_seconds
        )
        self.view_mat = mat4.translate(self.view_mat, v)

    def rotate(self, axis, dt_seconds: float, magnitude: float = ROTATION_SPEED):
        """Local-axis rotate (arrows/Q/E: main_pathtraced.js:894-942)."""
        self.view_mat = mat4.rotate(self.view_mat, axis, magnitude * dt_seconds)

    def mouse_look(self, dx: float, dy: float):
        """Pointer-lock mouse look (main_pathtraced.js:945-968)."""
        if dx == 0 and dy == 0:
            return
        magnitude = 0.001 * float(np.sqrt(dx * dx + dy * dy))
        self.view_mat = mat4.rotate(self.view_mat, (-dy, -dx, 0.0), magnitude)

    def wheel(self, delta_y: float):
        """Speed multiplier, clamped [0.001, 100] (main_pathtraced.js:799-806)."""
        mul = self.translation_speed_mul * float(np.sign(-delta_y)) * 0.1
        self.translation_speed_mul = float(
            np.clip(self.translation_speed_mul + mul, MIN_SPEED_MUL, MAX_SPEED_MUL)
        )

    # -- per-frame ----------------------------------------------------------
    def matrices(self, width: int, height: int):
        """(view, prev_view, proj_view, prev_proj_view) float32 [4,4].

        "projViewMatInv" in the reference is projection × inverse(view), a
        standard view-projection matrix (main_pathtraced.js:506-507).
        ``prev_proj_view`` is the value *saved at the end of the previous
        frame* (main_pathtraced.js:513-524), not recomputed — they differ
        only across a resize.
        """
        proj = mat4.initial_projection_matrix(width, height)
        proj_view = mat4.multiply(proj, mat4.inverse(self.view_mat))
        self._proj_view = proj_view
        return self.view_mat, self.prev_view_mat, proj_view, self.prev_proj_view

    def end_frame(self):
        """Save current as previous (main_pathtraced.js:520-524)."""
        self.prev_view_mat = self.view_mat.copy()
        if hasattr(self, "_proj_view"):
            self.prev_proj_view = self._proj_view.copy()
