"""Geometry primitives of the volume renderer, vectorized over pixels.

Exact math ports of the pure functions in
pathtraced_fragment_clustered.wgsl: slab ray/box intersection (:212-225),
box SDF (:182-186), cube face normal (:227-254), cell addressing
(:258-304) and the packed-word cell-state fetch (:268-290).

All functions are shape-polymorphic: inputs broadcast over leading pixel
axes; vectors live on the trailing axis of size 3.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "HALF_CUBE_SIZE",
    "FULL_CUBE_SIZE",
    "ray_cube_intersect",
    "sd_box",
    "cube_face_normal",
    "cell_from_sample_point",
    "get_cell_state",
    "nrand",
    "n1rand",
]

HALF_CUBE_SIZE = 0.5   # pathtraced_fragment_clustered.wgsl:70
FULL_CUBE_SIZE = 1.0


def ray_cube_intersect(ray_origin, ray_dir, cube_center, cube_half_extents):
    """Slab test (pathtraced_fragment_clustered.wgsl:212-225).

    Returns (t_near, t_far), each [...]-shaped.  Division by zero follows
    IEEE (±inf), as in WGSL.
    """
    inv = 1.0 / ray_dir
    t_min = (cube_center - cube_half_extents - ray_origin) * inv
    t_max = (cube_center + cube_half_extents - ray_origin) * inv
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    return t_near, t_far


def sd_box(p, b):
    """Signed distance to a box of half extents b at the origin
    (pathtraced_fragment_clustered.wgsl:182-186)."""
    q = jnp.abs(p) - b
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def cube_face_normal(intersection_point, cube_origin):
    """Axis-aligned face normal from the dominant offset component
    (pathtraced_fragment_clustered.wgsl:227-254)."""
    d = intersection_point - cube_origin
    ad = jnp.abs(d)
    d_max = jnp.max(ad, axis=-1, keepdims=True)
    # Reference if/else chain priority: x, then y, else z.
    is_x = ad[..., 0:1] == d_max
    is_y = (ad[..., 1:2] == d_max) & ~is_x
    is_z = ~is_x & ~is_y
    n = jnp.concatenate(
        [
            jnp.where(is_x, d[..., 0:1], 0.0),
            jnp.where(is_y, d[..., 1:2], 0.0),
            jnp.where(is_z, d[..., 2:3], 0.0),
        ],
        axis=-1,
    )
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def cell_from_sample_point(sample_point, grid_size: int):
    """(cell_coords int32 [...,3], cell_origin f32 [...,3], cell_idx int32).

    pathtraced_fragment_clustered.wgsl:292-304.  ``cell_idx`` is the raw
    x + y·N + z·N² *identifier* (no wrap — used only for equality tests,
    see the NOTE at :256-257).  Float→uint conversion saturates at 0 in
    WGSL; we clamp coords below at 0 to match.
    """
    cell_size = FULL_CUBE_SIZE / grid_size
    coords_f = jnp.floor((sample_point + HALF_CUBE_SIZE) / cell_size)
    cell_origin = coords_f * cell_size + cell_size * 0.5 - HALF_CUBE_SIZE
    coords = jnp.maximum(coords_f, 0.0).astype(jnp.int32)
    n = jnp.int32(grid_size)
    idx = coords[..., 0] + coords[..., 1] * n + coords[..., 2] * n * n
    return coords, cell_origin, idx


def get_cell_state(packed_flat, coords, grid_size: int):
    """Cell state (0/1 int32) from non-negative int32 coords [..., 3].

    Packed layout: flat view of ``uint32[W, Z, Y]``; the bit mapping and
    modulo wrap match getCellState/getClusterIdxFromGridCoordinates
    (pathtraced_fragment_clustered.wgsl:268-290).
    """
    n = jnp.int32(grid_size)
    w_count = jnp.int32(grid_size // 32)
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    w = (x // 32) % w_count
    bit = (x % 32).astype(jnp.uint32)
    yy = y % n
    zz = z % n
    flat = (w * n + zz) * n + yy  # [W, Z, Y] row-major
    words = jnp.take(packed_flat, flat)
    return ((words >> bit) & jnp.uint32(1)).astype(jnp.int32)


def nrand(n):
    """Deterministic hash RNG (pathtraced_fragment_clustered.wgsl:171-175):
    fract(sin(dot(n, (12.9898, 78.233))) * 43758.5453)."""
    d = n[..., 0] * jnp.float32(12.9898) + n[..., 1] * jnp.float32(78.233)
    v = jnp.sin(d) * jnp.float32(43758.5453)
    return v - jnp.floor(v)


def n1rand(uv, elapsed_time):
    """Time-seeded variant (pathtraced_fragment_clustered.wgsl:177-180)."""
    t = elapsed_time - jnp.floor(elapsed_time)
    return nrand(jnp.float32(0.07) * t + uv)
