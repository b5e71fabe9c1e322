"""Coarse occupancy mip for empty-space skipping.

The reference's 32-cell "clusters" could skip empty words but never do
(SURVEY.md §5 last bullet — the march samples cell-by-cell,
pathtraced_fragment_clustered.wgsl:703-736).  Here we build the intended
acceleration structure: an 8× downsampled occupancy bitmap — one bit per
8³-cell block, packed 32 blocks per uint32 word along x — recomputed on
device from the packed grid in a handful of vector ops.

Input:  packed ``uint32[W, Z, Y]`` (W = N/32).
Output: coarse ``uint32[Zc, Yc]`` with Zc = Z/8, Yc = Y/8; bit ``xc`` of
``coarse[zc, yc]`` = any live cell in block (xc, yc, zc).  Valid for
N ≤ 256 (W ≤ 8 ⇒ ≤ 32 x-blocks per word).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["coarse_occupancy", "dilate_occupancy", "BLOCK"]

BLOCK = 8  # downsample factor per axis

_U32 = jnp.uint32


def coarse_occupancy(packed: jnp.ndarray) -> jnp.ndarray:
    """8× occupancy mip; see module docstring."""
    w, z, y = packed.shape
    n = w * 32
    if z % BLOCK or y % BLOCK:
        raise ValueError(f"grid extents must be multiples of {BLOCK}")
    if w > BLOCK:
        raise ValueError("coarse_occupancy supports grids up to 256³")
    zc, yc = z // BLOCK, y // BLOCK

    # OR together the 8×8 (z, y) cells of each block, per word.
    v = packed.reshape(w, zc, BLOCK, yc, BLOCK)
    v = jnp.bitwise_or.reduce(v, axis=4)
    v = jnp.bitwise_or.reduce(v, axis=2)  # [W, Zc, Yc] u32

    # Compress each 8-bit x-group to 1 bit: g has group-occupancy at bit 8k.
    g = v
    for s in (1, 2, 4):  # after 1+2+4, bit i = OR of bits i..i+7
        g = g | (g >> _U32(s))
    g = g & _U32(0x01010101)
    # Nibble of 4 block-bits per word: bits 0,8,16,24 → 0,1,2,3.
    nib = (
        (g & _U32(1))
        | ((g >> _U32(7)) & _U32(2))
        | ((g >> _U32(14)) & _U32(4))
        | ((g >> _U32(21)) & _U32(8))
    )
    # Assemble words: word w contributes its 4 block-bits at offset 4w.
    coarse = jnp.zeros((zc, yc), dtype=_U32)
    for wi in range(w):
        coarse = coarse | (nib[wi] << _U32(4 * wi))
    return coarse


def dilate_occupancy(coarse: jnp.ndarray, dilate_z: bool = True) -> jnp.ndarray:
    """OR each block with its neighbourhood (one-block dilation).

    Lets the render kernel probe a ray segment's occupancy at a few
    sample points only: any block the segment crosses within one block
    (Chebyshev) of a probe point's block is covered, so dilation keeps
    the skip test conservative (never misses occupancy) as long as probe
    spacing stays ≤ 2 blocks per xy coordinate.

    ``dilate_z=False`` dilates in x/y only — used for the per-z-row
    column probe, where z is already pinned to the row being probed.
    """
    d = coarse
    d = d | (d << _U32(1)) | (d >> _U32(1))          # x neighbours
    axes = (0, 1) if dilate_z else (1,)               # z (rows), y (lanes)
    for axis in axes:
        d = d | jnp.roll(d, 1, axis) | jnp.roll(d, -1, axis)
        # roll wraps; the wrapped rows only ADD conservative occupancy at
        # the opposite edge — harmless for a skip structure.
    return d
