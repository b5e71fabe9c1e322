"""Differential tests: bit-packed step vs the dense oracle, across boundary
modes, neighbourhoods, mixed rule groups and multi-state decay (SURVEY.md §4
item 3 — the variant-parity test the reference never wrote)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellularautomatons3d_tpu.models.automaton import AutomatonSpec
from cellularautomatons3d_tpu.ops.ca_reference import step_dense
from cellularautomatons3d_tpu.ops.ca_step import (
    step_packed,
    step_packed_multistate,
    shift_packed,
)
from cellularautomatons3d_tpu.ops.packing import pack_grid, unpack_grid
from cellularautomatons3d_tpu.ops import bitplane
from cellularautomatons3d_tpu.utils.config import BoundaryMode

N = 32
BOUNDARIES = [BoundaryMode.CLAMP_REF, BoundaryMode.WRAP, BoundaryMode.CLAMP]


def random_dense(p=0.3, seed=0, n=N):
    rng = np.random.default_rng(seed)
    return (rng.random((n, n, n)) < p).astype(np.uint8)


@pytest.mark.parametrize("boundary", BOUNDARIES)
@pytest.mark.parametrize(
    "offset",
    [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1),
     (1, -1, 1), (-1, 1, -1)],
)
def test_shift_packed_matches_dense(offset, boundary):
    from cellularautomatons3d_tpu.ops.ca_reference import shift_dense

    dense = random_dense(seed=hash((offset, boundary)) % 2**31)
    want = np.asarray(shift_dense(jnp.asarray(dense), offset, boundary))
    got = unpack_grid(
        np.asarray(shift_packed(jnp.asarray(pack_grid(dense)), offset, boundary))
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("boundary", BOUNDARIES)
@pytest.mark.parametrize("neighbourhood", ["von neumann", "moore", "moore 2D", "edges"])
def test_packed_step_matches_oracle(neighbourhood, boundary):
    spec = AutomatonSpec.from_rule_strings(
        grid_size=N, neighbourhood=neighbourhood,
        born="1,3", survive="0-6", boundary=boundary,
    )
    dense = random_dense(p=0.2, seed=1)
    want = np.asarray(step_dense(jnp.asarray(dense), spec))
    got = unpack_grid(np.asarray(step_packed(jnp.asarray(pack_grid(dense)), spec)))
    np.testing.assert_array_equal(got, want)


def test_packed_step_mixed_groups():
    spec = AutomatonSpec.from_rule_strings(
        grid_size=N, neighbourhood="von neumann",
        born="1,3", survive="0-6",
        born_edges="2,4", survive_edges="1-3",
        born_corners="3", survive_corners="0-2",
    )
    dense = random_dense(p=0.25, seed=2)
    want = np.asarray(step_dense(jnp.asarray(dense), spec))
    got = unpack_grid(np.asarray(step_packed(jnp.asarray(pack_grid(dense)), spec)))
    np.testing.assert_array_equal(got, want)


def test_packed_step_multiple_generations():
    spec = AutomatonSpec.from_rule_strings(grid_size=N)
    dense = np.zeros((N, N, N), dtype=np.uint8)
    dense[N // 2 - 1, N // 2 - 1, N // 2 - 1] = 1
    packed = jnp.asarray(pack_grid(dense))
    d = jnp.asarray(dense)
    for _ in range(6):
        d = step_dense(d, spec)
        packed = step_packed(packed, spec)
    np.testing.assert_array_equal(unpack_grid(np.asarray(packed)), np.asarray(d))


def ages_to_planes(dense_ages, nbits):
    """Dense uint8 ages [Z,Y,X] → packed age planes uint32[B,W,Z,Y]."""
    planes = [pack_grid((dense_ages >> i) & 1) for i in range(nbits)]
    return jnp.asarray(np.stack(planes))


def planes_to_ages(planes):
    planes = np.asarray(planes)
    return sum(
        unpack_grid(planes[i]).astype(np.uint8) << i for i in range(planes.shape[0])
    )


@pytest.mark.parametrize("total_states", [3, 5, 8])
def test_packed_multistate_matches_oracle(total_states):
    spec = AutomatonSpec.from_rule_strings(
        grid_size=N, neighbourhood="moore", born="4", survive="4",
        total_states=total_states,
    )
    rng = np.random.default_rng(7)
    dense = rng.integers(0, total_states, size=(N, N, N)).astype(np.uint8)
    d = jnp.asarray(dense)
    p = ages_to_planes(dense, spec.age_bits)
    for _ in range(3):
        d = step_dense(d, spec)
        p = step_packed_multistate(p, spec)
    np.testing.assert_array_equal(planes_to_ages(np.asarray(p)), np.asarray(d))


def test_packed_multistate_binary_agrees_with_binary_path():
    spec = AutomatonSpec.from_rule_strings(grid_size=N, total_states=2)
    dense = random_dense(p=0.3, seed=9)
    p1 = step_packed(jnp.asarray(pack_grid(dense)), spec)
    p2 = step_packed_multistate(ages_to_planes(dense, 1), spec)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2)[0])
