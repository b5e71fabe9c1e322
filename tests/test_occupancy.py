"""Coarse occupancy mip vs a dense numpy reduction."""

import numpy as np
import jax.numpy as jnp

from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy, BLOCK
from cellularautomatons3d_tpu.ops.packing import pack_grid


def dense_occupancy(dense):
    z, y, x = dense.shape
    b = dense.reshape(z // BLOCK, BLOCK, y // BLOCK, BLOCK, x // BLOCK, BLOCK)
    return b.any(axis=(1, 3, 5))  # [Zc, Yc, Xc] bool


def unpack_coarse(coarse):
    zc, yc = coarse.shape
    bits = (coarse[..., None] >> np.arange(32, dtype=np.uint32)) & 1
    return bits.astype(bool)  # [Zc, Yc, 32]


def test_coarse_occupancy_random():
    rng = np.random.default_rng(0)
    for n, p in ((64, 0.01), (64, 0.3), (256, 0.001)):
        dense = (rng.random((n, n, n)) < p).astype(np.uint8)
        coarse = np.asarray(coarse_occupancy(jnp.asarray(pack_grid(dense))))
        want = dense_occupancy(dense)
        got = unpack_coarse(coarse)[:, :, : n // BLOCK]
        np.testing.assert_array_equal(
            got, want.transpose(0, 1, 2)
        )  # [Zc, Yc, Xc]


def test_coarse_occupancy_single_cell():
    n = 64
    dense = np.zeros((n, n, n), np.uint8)
    dense[13, 42, 57] = 1
    coarse = np.asarray(coarse_occupancy(jnp.asarray(pack_grid(dense))))
    got = unpack_coarse(coarse)
    assert got[13 // 8, 42 // 8, 57 // 8]
    assert got.sum() == 1


# ------------------------------------------------- multi-x-group layouts --
#
# Grids > 256 pack more than one 8-word x-group per coarse row: lane
# (xb >> 5)·Yc + yc, bit xb & 31 (ops/occupancy._compress_x_groups).  The
# reference allows grids to 1024 (main_pathtraced.js:274-277); these tests
# pin the group assembly, the partial final group (288-480) and the
# cross-group dilation carries that only execute for xg > 1.


def unpack_groups(rows, yc):
    """[R, XG·Yc] packed rows → [R, Yc, XG·32] bool block grid."""
    r, ytot = rows.shape
    xg = ytot // yc
    bits = (rows.reshape(r, xg, yc)[..., None]
            >> np.arange(32, dtype=np.uint32)) & 1
    return bits.astype(bool).transpose(0, 2, 1, 3).reshape(r, yc, xg * 32)


def test_coarse_occupancy_multigroup():
    rng = np.random.default_rng(3)
    for n in (320, 512):  # 320: partial final group (10 words); 512: 2 full
        dense = (rng.random((n, n, n)) < 0.002).astype(np.uint8)
        coarse = np.asarray(coarse_occupancy(jnp.asarray(pack_grid(dense))))
        yc = n // BLOCK
        assert coarse.shape == (yc, (-(-n // 256)) * yc)
        got = unpack_groups(coarse, yc)[:, :, : n // BLOCK]
        np.testing.assert_array_equal(got, dense_occupancy(dense))


def test_plane_occupancy_matches_dense():
    from cellularautomatons3d_tpu.ops.occupancy import plane_occupancy

    rng = np.random.default_rng(4)
    for n in (64, 320):
        dense = (rng.random((n, n, n)) < 0.01).astype(np.uint8)
        rows = np.asarray(plane_occupancy(jnp.asarray(pack_grid(dense))))
        yc = n // BLOCK
        assert rows.shape == (n, (-(-n // 256)) * yc)
        got = unpack_groups(rows, yc)[:, :, : n // BLOCK]
        want = (
            dense.reshape(n, yc, BLOCK, n // BLOCK, BLOCK)
            .any(axis=(2, 4))
        )
        np.testing.assert_array_equal(got, want)


def test_dilate_cross_group_carries():
    from cellularautomatons3d_tpu.ops.occupancy import dilate_occupancy

    n = 512  # xg = 2
    yc = n // BLOCK
    rng = np.random.default_rng(5)
    dense = np.zeros((n, n, n), np.uint8)
    # Cells straddling the x-group boundary (x-blocks 31 and 32) plus a
    # random sprinkle so the test covers both carry directions everywhere.
    dense[100, 100, 31 * 8 + 7] = 1   # block 31, group 0 → carries into g1
    dense[200, 200, 32 * 8] = 1       # block 32, group 1 → carries into g0
    dense |= (rng.random((n, n, n)) < 0.0005).astype(np.uint8)
    coarse = coarse_occupancy(jnp.asarray(pack_grid(dense)))
    got = unpack_groups(
        np.asarray(dilate_occupancy(coarse, dilate_z=True, yc=yc)), yc
    )[:, :, : n // BLOCK]

    blocks = dense_occupancy(dense)
    want = np.zeros_like(blocks)
    zc = n // BLOCK
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                # x clips at volume edges; z/y wrap (jnp.roll — harmless
                # conservative wrap, dilate_occupancy docstring).
                sh = np.roll(blocks, (dz, dy), axis=(0, 1))
                if dx == 0:
                    want |= sh
                elif dx == 1:
                    want[:, :, 1:] |= sh[:, :, :-1]
                else:
                    want[:, :, :-1] |= sh[:, :, 1:]
    np.testing.assert_array_equal(got, want)
    # The straddling cells specifically must appear across the boundary.
    assert got[100 // 8, 100 // 8, 32] and got[200 // 8, 200 // 8, 31]
