"""Bit-packing round trips and seeding vs the reference's state initializer
(main_pathtraced.js:1241-1312) and cluster addressing
(main_pathtraced.js:1170-1178)."""

import numpy as np

from cellularautomatons3d_tpu.ops.packing import (
    pack_grid,
    unpack_grid,
    packed_shape,
    seed_center,
    seed_random_block,
    to_reference_order,
    from_reference_order,
)


def test_packed_shape():
    assert packed_shape(64) == (2, 64, 64)
    assert packed_shape((8, 16, 96)) == (3, 8, 16)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    dense = (rng.random((8, 16, 64)) > 0.7).astype(np.uint8)
    packed = pack_grid(dense)
    assert packed.shape == (2, 8, 16) and packed.dtype == np.uint32
    np.testing.assert_array_equal(unpack_grid(packed), dense)


def test_bit_mapping_lsb_first():
    # Cell x sits at bit x%32 of word x//32 (compute_clustered.wgsl:79-86,
    # masks table :21-54).
    dense = np.zeros((1, 1, 64), dtype=np.uint8)
    dense[0, 0, 0] = 1
    dense[0, 0, 31] = 1
    dense[0, 0, 33] = 1
    packed = pack_grid(dense)
    assert packed[0, 0, 0] == (1 | (1 << 31))
    assert packed[1, 0, 0] == 2


def test_reference_order_roundtrip():
    # Flat reference order: idx = w + y*W + z*W*N (main_pathtraced.js:1170-1178).
    rng = np.random.default_rng(1)
    dense = (rng.random((64, 64, 64)) > 0.5).astype(np.uint8)
    packed = pack_grid(dense)
    flat = to_reference_order(packed)
    assert flat.shape == (2 * 64 * 64,)
    # Check one specific word: cells x∈[32,64) at y=3, z=5 → idx = 1 + 3*2 + 5*2*64.
    w, y, z = 1, 3, 5
    assert flat[w + y * 2 + z * 2 * 64] == packed[w, z, y]
    np.testing.assert_array_equal(from_reference_order(flat, 64), packed)


def test_seed_center():
    dense = seed_center(64)
    assert dense.sum() == 1
    c = 64 // 2 - 1
    assert dense[c, c, c] == 1
    # Packed: matches the reference's "MID INDEX" word/bit
    # (main_pathtraced.js:1287-1295): word x//32 = 0 for c=31, bit 31.
    packed = pack_grid(dense)
    assert packed[c // 32, c, c] == np.uint32(1 << (c % 32))


def test_seed_random_block():
    dense = seed_random_block(64, rng=123)
    c = 64 // 2 - 1
    # All live cells inside the 5³ block at c-2..c+2 (main_pathtraced.js:1245-1270).
    live = np.argwhere(dense)
    assert len(live) > 0
    assert (live >= c - 2).all() and (live <= c + 2).all()
    # Deterministic given the seed.
    np.testing.assert_array_equal(dense, seed_random_block(64, rng=123))
