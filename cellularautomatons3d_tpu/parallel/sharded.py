"""Multi-chip scaling: z-axis domain decomposition with ICI halo exchange.

The reference is strictly single-device (SURVEY.md §2.3); this layer is the
new capability mandated by BASELINE.json config 5 (512³ sharded across
chips).  Design (SURVEY.md §5 "long-context" analogue):

* the packed grid ``uint32[W, Z, Y]`` is sharded along **Z** over a 1-D
  ``jax.sharding.Mesh`` — the packed x axis is deliberately never sharded,
  dodging sub-word halo exchange (SURVEY.md §7 "hard parts");
* every step exchanges one z *word-plane* per face via ``lax.ppermute``
  inside ``shard_map`` (a 256·256·4-byte plane at 256³ — a few hundred KB
  riding ICI), then runs the same bit-sliced local update on the haloed
  slab and slices the interior;
* boundary modes act only at the global edges: WRAP keeps the natural ring;
  CLAMP zeroes both outer halos; CLAMP_REF zeroes only the low-z halo (the
  reference's one-sided wrap keeps the high edge ring: see
  compute_clustered.wgsl:104 and types.BoundaryMode);
* rendering replicates the (small, bit-packed) grid and shards pixels —
  an ``all_gather`` of ≤ 16 MiB at 512³.

All neighbourhood presets have |dz| ≤ 1, so a 1-plane halo is exact
(asserted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.automaton import AutomatonSpec
from ..ops.ca_step import fires_plane, decay_update
from ..ops import bitplane
from ..types import BoundaryMode

__all__ = [
    "make_mesh",
    "shard_state",
    "make_sharded_step",
    "halo_exchange_z",
]

AXIS = "z"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (all by default)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices, dtype=object).reshape(-1), (AXIS,))


def state_sharding(mesh: Mesh, multistate: bool = False) -> NamedSharding:
    spec = P(None, None, AXIS, None) if multistate else P(None, AXIS, None)
    return NamedSharding(mesh, spec)


def shard_state(state, mesh: Mesh):
    """Place a packed state ([W,Z,Y] or [B,W,Z,Y]) sharded along Z."""
    return jax.device_put(state, state_sharding(mesh, state.ndim == 4))


def halo_exchange_z(local, boundary: str, axis: str = AXIS):
    """Return the local slab padded with one z word-plane per side.

    local: [W, local_z, Y] (inside shard_map).  Neighbour planes move via
    two ring ppermutes; global-edge halos are masked per boundary mode.
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    first = local[:, :1, :]
    last = local[:, -1:, :]
    if n > 1:
        fwd = [(i, (i + 1) % n) for i in range(n)]   # my last → right's left halo
        bwd = [(i, (i - 1) % n) for i in range(n)]   # my first → left's right halo
        left_halo = jax.lax.ppermute(last, axis, fwd)
        right_halo = jax.lax.ppermute(first, axis, bwd)
    else:
        left_halo, right_halo = last, first  # self-ring

    zero = jnp.zeros_like(first)
    if boundary == BoundaryMode.WRAP:
        pass  # natural ring
    elif boundary == BoundaryMode.CLAMP:
        left_halo = jnp.where(idx == 0, zero, left_halo)
        right_halo = jnp.where(idx == n - 1, zero, right_halo)
    elif boundary == BoundaryMode.CLAMP_REF:
        # One-sided: low edge reads zero, high edge aliases global plane 0
        # (delivered by the ring).
        left_halo = jnp.where(idx == 0, zero, left_halo)
    else:
        raise ValueError(f"unknown boundary mode {boundary!r}")
    return jnp.concatenate([left_halo, local, right_halo], axis=1)


def _local_step_binary(local, spec: AutomatonSpec):
    padded = halo_exchange_z(local, spec.boundary)
    return fires_plane(padded, spec)[:, 1:-1, :]


def _local_step_multistate(local_planes, spec: AutomatonSpec):
    nbits = spec.age_bits
    planes = [local_planes[i] for i in range(nbits)]
    alive = bitplane.eq_const(planes, 1, nbits)
    dead = bitplane.eq_const(planes, 0, nbits)
    # Only the alive plane crosses the boundary — counts need it; the age
    # update is pointwise.
    alive_padded = halo_exchange_z(alive, spec.boundary)
    fires = fires_plane(alive_padded, spec)[:, 1:-1, :]
    return jnp.stack(decay_update(planes, alive, dead, fires, spec.total_states))


def make_sharded_step(spec: AutomatonSpec, mesh: Mesh):
    """Jitted one-generation step over a Z-sharded packed state.

    Differential-equal to the single-device step (tested on a virtual CPU
    mesh, SURVEY.md §4 item 5).
    """
    max_dz = max(
        abs(off[2]) for offs, _, _ in spec.groups for off in offs
    )
    if max_dz > 1:
        raise NotImplementedError("halo width 1: neighbourhood |dz| must be ≤ 1")
    if spec.grid_size % mesh.devices.size != 0:
        raise ValueError(
            f"grid_size {spec.grid_size} not divisible by mesh size "
            f"{mesh.devices.size}"
        )

    multistate = spec.total_states > 2
    pspec = P(None, None, AXIS, None) if multistate else P(None, AXIS, None)
    local_fn = _local_step_multistate if multistate else _local_step_binary

    shard_mapped = jax.shard_map(
        functools.partial(local_fn, spec=spec),
        mesh=mesh,
        in_specs=pspec,
        out_specs=pspec,
    )
    return jax.jit(shard_mapped)
