"""Fused on-device loops: many CA generations (and sim+render ticks) inside
one jitted program — the north star's "zero host round-trips" loop replacing
the reference's per-frame command-buffer submission
(main_pathtraced.js:1833-1850)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.automaton import AutomatonSpec
from . import bitplane
from .ca_step import fires_plane, decay_update

__all__ = ["make_multi_step"]


def make_multi_step(spec: AutomatonSpec, steps: int):
    """Jitted ``state → state`` advancing ``steps`` generations in one
    on-device ``fori_loop`` with buffer donation."""

    if spec.total_states == 2:

        def body(_, s):
            return fires_plane(s, spec)

    else:
        nbits = spec.age_bits

        def body(_, s):
            planes = [s[i] for i in range(nbits)]
            alive = bitplane.eq_const(planes, 1, nbits)
            dead = bitplane.eq_const(planes, 0, nbits)
            fires = fires_plane(alive, spec)
            return jnp.stack(
                decay_update(planes, alive, dead, fires, spec.total_states)
            )

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state):
        return jax.lax.fori_loop(0, steps, body, state)

    return run
