"""Correctness oracle: one CA generation on a dense (unpacked) grid.

This is the plain-``jnp`` reference implementation of the update that the
device shaders perform (compute_clustered.wgsl:192-247 for the clustered
semantics, compute.wgsl:49-175 for the toroidal variant).  It is the
differential-test oracle for the optimized bit-packed step (`ca_step.py`),
and also serves as the non-clustered pipeline equivalent
(BASELINE.json config 1).

State is a dense ``uint8[Z, Y, X]`` array of cell *ages* (0=dead, 1=alive,
2..S-1 dying; binary CA uses only {0, 1}).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.automaton import AutomatonSpec
from ..types import BoundaryMode

__all__ = ["step_dense", "shift_dense", "count_neighbours_dense"]

# Dense axes: 0 = z, 1 = y, 2 = x; offsets are (dx, dy, dz).
_AXIS_FOR_D = {0: 2, 1: 1, 2: 0}  # offset component index → array axis


def _shift_axis(a: jnp.ndarray, d: int, axis: int, boundary: str) -> jnp.ndarray:
    """out[c] = a[c + d] along ``axis`` under the boundary mode.

    CLAMP_REF replicates compute_clustered.wgsl:104's inclusive upper bound:
    coordinate N passes the check and then wraps to 0 in getCellState
    (compute_clustered.wgsl:56-66) — so positive offsets wrap at the far
    edge while negative offsets read zero past the near edge.
    """
    if d == 0:
        return a
    if boundary == BoundaryMode.WRAP:
        return jnp.roll(a, -d, axis=axis)
    if boundary == BoundaryMode.CLAMP_REF:
        if d > 0:
            return jnp.roll(a, -d, axis=axis)  # far edge aliases row/plane 0
        return _shift_zero(a, d, axis)
    if boundary == BoundaryMode.CLAMP:
        return _shift_zero(a, d, axis)
    raise ValueError(f"unknown boundary mode {boundary!r}")


def _shift_zero(a: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Zero-filling shift: out[c] = a[c+d] in-range else 0."""
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    idx = [slice(None)] * a.ndim
    if d > 0:
        pad[axis] = (0, d)
        idx[axis] = slice(d, d + n)
    else:
        pad[axis] = (-d, 0)
        idx[axis] = slice(0, n)
    return jnp.pad(a, pad)[tuple(idx)]


def shift_dense(a: jnp.ndarray, offset, boundary: str) -> jnp.ndarray:
    """out[z, y, x] = a[z+dz, y+dy, x+dx] under the boundary mode."""
    dx, dy, dz = offset
    out = a
    for comp, d in ((0, dx), (1, dy), (2, dz)):
        out = _shift_axis(out, d, _AXIS_FOR_D[comp], boundary)
    return out


def count_neighbours_dense(alive: jnp.ndarray, offsets, boundary: str) -> jnp.ndarray:
    """Live-neighbour count per cell for one offset set (int32)."""
    count = jnp.zeros(alive.shape, dtype=jnp.int32)
    for off in offsets:
        count = count + shift_dense(alive, off, boundary).astype(jnp.int32)
    return count


def _group_fire(alive_b, count, born_mask: int, survive_mask: int):
    """LUT evaluation for one group: stateLUT[state][count]
    (compute_clustered.wgsl:165-190) with masks as trace-time constants."""
    born_lut = jnp.array(
        [(born_mask >> c) & 1 for c in range(27)], dtype=jnp.bool_
    )
    survive_lut = jnp.array(
        [(survive_mask >> c) & 1 for c in range(27)], dtype=jnp.bool_
    )
    return jnp.where(alive_b, survive_lut[count], born_lut[count])


@functools.partial(jax.jit, static_argnums=1)
def step_dense(ages: jnp.ndarray, spec: AutomatonSpec) -> jnp.ndarray:
    """One generation on a dense ``uint8[Z, Y, X]`` age grid."""
    alive_b = ages == 1
    alive = alive_b.astype(jnp.uint8)

    fires = None
    for offs, born_mask, survive_mask in spec.active_groups():
        count = count_neighbours_dense(alive, offs, spec.boundary)
        f = _group_fire(alive_b, count, born_mask, survive_mask)
        fires = f if fires is None else (fires | f)
    if fires is None:  # all groups disabled: every cell dies/decays
        fires = jnp.zeros(ages.shape, dtype=jnp.bool_)

    if spec.total_states == 2:
        return fires.astype(ages.dtype)

    # Generations-style decay.
    s = spec.total_states
    dead = ages == 0
    next_from_dead = jnp.where(fires, 1, 0)
    next_from_alive = jnp.where(fires, 1, 2 % s)  # S=2 unreachable here
    aged = jnp.where(ages >= s - 1, 0, ages + 1)
    out = jnp.where(
        dead, next_from_dead, jnp.where(alive_b, next_from_alive, aged)
    )
    return out.astype(ages.dtype)


def run_dense(ages, spec: AutomatonSpec, steps: int):
    """Convenience: iterate ``steps`` generations (host loop)."""
    for _ in range(steps):
        ages = step_dense(ages, spec)
    return ages
