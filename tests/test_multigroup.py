"""Multi-x-group coarse occupancy layouts (grids > 256) and the 288-480
partial-group case.

Round-2 regression (ADVICE r2, high): grids 288-480 (packed word count
9-15, neither ≤ 8 nor a multiple of 8) crashed `coarse_occupancy`; and the
multi-x-group code paths that 512³ exercises — group assembly
(ops/occupancy.py), `dilate_occupancy`'s cross-group carries and
`fetch_coarse_bit`'s nbk > 32 branch (render_fast.py) — had no coverage.
These tests run the real layouts at N=320 with a tiny window.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.occupancy import (
    BLOCK,
    coarse_occupancy,
    dilate_occupancy,
)
from cellularautomatons3d_tpu.ops.packing import pack_grid


def dense_occupancy(dense):
    z, y, x = dense.shape
    b = dense.reshape(z // BLOCK, BLOCK, y // BLOCK, BLOCK, x // BLOCK, BLOCK)
    return b.any(axis=(1, 3, 5))  # [Zc, Yc, Xc] bool


def unpack_groups(coarse, yc):
    """[Zc, XG·Yc] u32 → [Zc, Yc, XG·32] bool (group-major x-blocks)."""
    zc, ytot = coarse.shape
    xg = ytot // yc
    g = np.asarray(coarse).reshape(zc, xg, yc)
    bits = (g[..., None] >> np.arange(32, dtype=np.uint32)) & 1
    # [Zc, XG, Yc, 32] → [Zc, Yc, XG·32]
    return bits.astype(bool).transpose(0, 2, 1, 3).reshape(zc, yc, xg * 32)


@pytest.mark.parametrize("n", [320, 512])
def test_coarse_occupancy_multigroup(n):
    rng = np.random.default_rng(1)
    dense = (rng.random((n, n, n)) < 0.0005).astype(np.uint8)
    dense[0, 0, n - 1] = 1  # last x-block: partial-group high word at 320
    coarse = coarse_occupancy(jnp.asarray(pack_grid(dense)))
    yc = n // BLOCK
    got = unpack_groups(coarse, yc)[:, :, : n // BLOCK]
    np.testing.assert_array_equal(got, dense_occupancy(dense))


def test_coarse_occupancy_320_no_crash():
    """The exact ADVICE r2 repro: a multiple-of-32 grid in 288-480."""
    packed = jnp.zeros((320 // 32, 320, 320), jnp.uint32)
    out = coarse_occupancy(packed)
    assert out.shape == (40, 2 * 40)  # XG=2 (partial second group)


@pytest.mark.parametrize("n", [320, 512])
def test_dilate_occupancy_cross_group_carries(n):
    """x-dilation must carry across the 32-block group-word boundary."""
    rng = np.random.default_rng(2)
    dense = np.zeros((n, n, n), np.uint8)
    # Live cells straddling the group boundary (x-blocks 31 and 32) plus
    # random fill.
    dense[8, 8, 31 * 8] = 1
    dense[64, 64, 32 * 8] = 1
    dense |= (rng.random((n, n, n)) < 0.0002).astype(np.uint8)
    yc = n // BLOCK
    coarse = coarse_occupancy(jnp.asarray(pack_grid(dense)))
    occ = dense_occupancy(dense)  # [Zc, Yc, Xc]

    for dz, dy in ((True, True), (False, False)):
        dil = dilate_occupancy(coarse, dilate_z=dz, yc=yc, dilate_y=dy)
        got = unpack_groups(dil, yc)[:, :, : n // BLOCK]
        # Exact (clipped) box dilation oracle; axis order is irrelevant.
        want = occ.copy()
        want[:, :, 1:] |= occ[:, :, :-1]
        want[:, :, :-1] |= occ[:, :, 1:]
        if dy:
            w2 = want.copy()
            want[:, 1:] |= w2[:, :-1]
            want[:, :-1] |= w2[:, 1:]
        if dz:
            w3 = want.copy()
            want[1:] |= w3[:-1]
            want[:-1] |= w3[1:]
        # The implementation wraps at z/y edges (documented conservative);
        # the interior must be exact — including the cross-group x carries.
        np.testing.assert_array_equal(
            got[1:-1, 1:-1, :], want[1:-1, 1:-1, :]
        )
        # Everywhere: never misses occupancy (conservativeness).
        assert not (~got & want).any()


# The end-to-end N=320 sliced-render oracle lives in
# tests/test_render_slab.py::test_sliced_multigroup_320_matches_oracle
# (with the interpret-mode compile-depth workaround).


def test_engine_config_320_keeps_fast_pipeline():
    cfg = ca.EngineConfig(grid_size=320)
    assert cfg.pipeline == "fast"
