#!/usr/bin/env python
"""CSE-proof attribution of the decomposed GI frame cost.

profile_gi.py unrolled REPS *identical* calls inside one jit — XLA's
common-subexpression elimination collapses those to a single call, so
its numbers read up to REPS× too fast.  Here every measurement runs a
``fori_loop`` whose body's inputs depend on the previous iteration's
output (a tiny data perturbation), which defeats CSE and loop-invariant
hoisting while keeping the compile small.  Run manually on TPU.
"""

import time

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.render import render_fast as RF
from cellularautomatons3d_tpu.render import render_slab as RS
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 256
WIDTH, HEIGHT = 1920, 1080
REPS = 10


def timed(label, fn, *args):
    r = fn(*args)
    device_sync(r)
    t0 = time.perf_counter()
    r = fn(*args)
    device_sync(r)
    ms = (time.perf_counter() - t0) * 1000.0 / REPS
    print(f"{label:44s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))
    state = make_multi_step(spec, 80)(state)
    device_sync(state)
    view = mat4.initial_view_matrix()
    cam = jnp.asarray(
        RF.pack_cam(
            view, WIDTH, HEIGHT, (0.721, 1.0, 1.0), 5.0, 0.85, 0.29,
            (0.17, 0.17, 0.17), (0.0, 0.0, 0.0), elapsed_time=0.1,
        )
    )

    rgb, depth, idx = jax.jit(
        lambda st, cv: RF.raytrace_tiles(
            st, coarse_occupancy(st), cv, grid_size=GRID,
            width=WIDTH, height=HEIGHT, shadow=False,
        )
    )(state, cam)
    device_sync(idx)

    @jax.jit
    def geom(cv, idx_img, t_img):
        return RS.hit_geometry(
            cv, idx_img, t_img, grid_size=GRID, width=WIDTH, height=HEIGHT
        )

    q, origin, coords, found, _ = geom(cam, idx, depth)
    device_sync(q)
    light = jnp.broadcast_to(cam[RF.P_LIGHT : RF.P_LIGHT + 3], q.shape)

    # -- primary trace (shadow off), chained on the state image ---------
    @jax.jit
    def prim(st, cv):
        co = coarse_occupancy(st)

        def body(i, acc):
            r, d, ii = RF.raytrace_tiles(
                st, co, cv + acc * 1e-12, grid_size=GRID,
                width=WIDTH, height=HEIGHT, shadow=False,
            )
            return acc + d[0, 0]

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    timed("primary trace (no shadow)", prim, state, cam)

    # -- one 4-query occlusion batch, chained on q ------------------------
    @jax.jit
    def occl(st, cv, qq, crd, fnd):
        pr = RS.prep_slabs(st, [(0, GRID)], GRID)

        def body(i, carry):
            acc, qi = carry
            queries = [
                (qi + 1e-6 * (kk + 1), light, crd, fnd) for kk in range(4)
            ]
            occs = RS.shadow_occlusion_batch(
                cv, queries, pr, grid_size=GRID, width=WIDTH, height=HEIGHT
            )
            s = jnp.zeros((HEIGHT, WIDTH), jnp.float32)
            for o in occs:
                s = s + o.astype(jnp.float32)
            return acc + s[0, 0], qi + 1e-9 * s[..., None]

        return jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), qq))

    timed("occlusion batch nq=4 (chained)", occl, state, cam, q, coords, found)

    # -- one 4-slot cell_state_batch, chained on coords --------------------
    @jax.jit
    def cstate(st, crd, fnd):
        pr = RS.prep_slabs(st, [(0, GRID)], GRID)

        def body(i, carry):
            acc, ci = carry
            queries = [
                (jnp.maximum(ci + kk, 0), fnd) for kk in range(4)
            ]
            states = RS.cell_state_batch(
                queries, pr, grid_size=GRID, width=WIDTH, height=HEIGHT
            )
            s = jnp.zeros((HEIGHT, WIDTH), jnp.int32)
            for o in states:
                s = s + o
            return acc + s[0, 0], ci + (s[..., None] & 1)

        return jax.lax.fori_loop(0, REPS, body, (jnp.int32(0), crd))

    timed("cell_state_batch nq=4 (chained)", cstate, state, coords, found)

    # -- full indirect_bounce, chained on q -------------------------------
    @jax.jit
    def full(st, cv, qq, org, crd, fnd):
        pr = RS.prep_slabs(st, [(0, GRID)], GRID)

        def body(i, carry):
            acc, qi = carry
            out = RS.indirect_bounce(
                st, cv, qi, org, crd, fnd, pr,
                grid_size=GRID, width=WIDTH, height=HEIGHT,
            )
            return acc + out[0, 0, 0], qi + 1e-9 * out

        return jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), qq))

    timed("full indirect_bounce (chained)", full, state, cam, q, origin,
          coords, found)


if __name__ == "__main__":
    main()
