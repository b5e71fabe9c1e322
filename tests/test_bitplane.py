"""Bit-sliced arithmetic unit tests."""

import numpy as np
import jax.numpy as jnp

from cellularautomatons3d_tpu.ops import bitplane


def rand_planes(k, shape=(4, 8), seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.integers(0, 2**32, size=shape, dtype=np.uint32))
        for _ in range(k)
    ]


def expand_bits(plane):
    """uint32 array → per-bit 0/1 int array with a leading 32 axis."""
    p = np.asarray(plane)
    return ((p[None] >> np.arange(32, dtype=np.uint32).reshape((32,) + (1,) * p.ndim)) & 1).astype(np.int64)


def test_popcount_planes_matches_scalar_sum():
    for k in (1, 2, 3, 6, 12, 26):
        planes = rand_planes(k, seed=k)
        counts = bitplane.popcount_planes(planes)
        got = sum(expand_bits(c) << i for i, c in enumerate(counts))
        want = sum(expand_bits(p) for p in planes)
        np.testing.assert_array_equal(got, want)
        assert len(counts) == max(1, int(np.ceil(np.log2(k + 1))))


def test_eq_const():
    planes = rand_planes(5, seed=42)
    counts = bitplane.popcount_planes(rand_planes(20, seed=7))
    vals = sum(expand_bits(c) << i for i, c in enumerate(counts))
    for v in (0, 1, 5, 20):
        eq = expand_bits(bitplane.eq_const(counts, v))
        np.testing.assert_array_equal(eq, (vals == v).astype(np.int64))


def test_rule_hit():
    counts = bitplane.popcount_planes(rand_planes(26, seed=3))
    vals = sum(expand_bits(c) << i for i, c in enumerate(counts))
    mask = (1 << 0) | (1 << 3) | (1 << 25)
    hit = expand_bits(bitplane.rule_hit(counts, mask))
    want = np.isin(vals, [0, 3, 25]).astype(np.int64)
    np.testing.assert_array_equal(hit, want)
    # Empty mask → all zeros.
    assert np.asarray(bitplane.rule_hit(counts, 0)).sum() == 0


def test_select_planes():
    a = rand_planes(3, seed=1)
    b = rand_planes(3, seed=2)
    m = rand_planes(1, seed=9)[0]
    out = bitplane.select_planes(m, a, b)
    for i in range(3):
        want = np.where(expand_bits(m), expand_bits(a[i]), expand_bits(b[i]))
        np.testing.assert_array_equal(expand_bits(out[i]), want)


def test_increment_planes():
    planes = rand_planes(4, seed=5)
    vals = sum(expand_bits(p) << i for i, p in enumerate(planes))
    out = bitplane.increment_planes(planes)
    got = sum(expand_bits(p) << i for i, p in enumerate(out))
    np.testing.assert_array_equal(got, (vals + 1) % 16)


def test_int_planes_roundtrip():
    rng = np.random.default_rng(11)
    vals = jnp.asarray(rng.integers(0, 7, size=(32, 4, 8), dtype=np.int32))
    planes = bitplane.int_to_planes(vals, 3)
    back = bitplane.planes_to_int(planes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))
