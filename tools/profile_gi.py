#!/usr/bin/env python
"""Attribute the decomposed GI cost: occlusion kernels vs neighbour-state
gathers vs the double BRDF evaluation.  Run manually on TPU."""

import os
import time

import os as _os
import sys as _sys

# Runnable from anywhere: the package lives at the repo root, one
# level above tools/ (script dir is sys.path[0], not the root).
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax

# sitecustomize imports jax first; env var would be read too late.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.render import render_fast as RF
from cellularautomatons3d_tpu.render import render_slab as RS
from cellularautomatons3d_tpu.render.intersect import get_cell_state
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
    print(f"{label:44s} {ms:8.3f} ms")
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

    # Shared geometry: trace once, reuse the hit image.
    from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy

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

    # 1. bare neighbour-state gathers (4 slots × 2M pixels of jnp.take)
    @jax.jit
    def gathers(st, crd):
        flat = st.reshape(-1)
        out = jnp.zeros(crd.shape[:-1], jnp.int32)
        for i in range(4 * REPS):
            off = jnp.asarray([(i % 3) - 1, ((i // 3) % 3) - 1, 1], jnp.int32)
            out = out + get_cell_state(flat, jnp.maximum(crd + off, 0), GRID)
        return out

    ms = timed("neighbour get_cell_state x4", gathers, state, coords)
    print(f"  -> per 4-slot set: {ms / 1:.3f} ms (already /REPS)")

    # 2. occlusion kernel batch (4 queries, one launch)
    prepped = jax.jit(
        lambda st: RS.prep_slabs(st, [(0, GRID)], GRID)
    )(state)
    device_sync(prepped[0].vols)

    @jax.jit
    def occl(cv, qq, crd, fnd, st):
        pr = RS.prep_slabs(st, [(0, GRID)], GRID)
        out = jnp.zeros((HEIGHT, WIDTH), jnp.float32)
        for _ in range(REPS):
            queries = [(qq, qq + 0.5, crd, fnd)] * 4
            occs = RS.shadow_occlusion_batch(
                cv, queries, pr, grid_size=GRID, width=WIDTH, height=HEIGHT
            )
            for o in occs:
                out = out + o.astype(jnp.float32)
        return out

    timed("occlusion batch (4 queries)", occl, cam, q, coords, found, state)

    # 3. double BRDF eval (2 calls × 4 slots)
    from cellularautomatons3d_tpu.render import brdf

    @jax.jit
    def brdfs(cv, qq, org, crd):
        light = cv[RF.P_LIGHT : RF.P_LIGHT + 3]
        o = cv[RF.P_O : RF.P_O + 3]
        lmag3 = jnp.broadcast_to(cv[RF.P_LMAG], qq.shape)
        out = jnp.zeros_like(qq)
        for i in range(4 * REPS):
            npnt = qq + 0.01 * (i + 1)
            refl = brdf.calculate_lighting_at(
                npnt, org, crd, qq, lmag3, light,
                grid_size=GRID, roughness=cv[RF.P_ROUGH],
                material_color=cv[RF.P_MATC : RF.P_MATC + 3],
                base_reflectivity=cv[RF.P_REFL : RF.P_REFL + 3],
            )
            out = out + brdf.calculate_lighting_at(
                qq, org, crd, o, refl, npnt,
                grid_size=GRID, roughness=cv[RF.P_ROUGH],
                material_color=cv[RF.P_MATC : RF.P_MATC + 3],
                base_reflectivity=cv[RF.P_REFL : RF.P_REFL + 3],
            )
        return out

    timed("double BRDF x4 slots", brdfs, cam, q, origin, coords)

    # 4. full indirect_bounce
    @jax.jit
    def full(st, cv, qq, org, crd, fnd):
        pr = RS.prep_slabs(st, [(0, GRID)], GRID)
        out = jnp.zeros_like(qq)
        for _ in range(REPS):
            out = out + RS.indirect_bounce(
                st, cv, qq, org, crd, fnd, pr,
                grid_size=GRID, width=WIDTH, height=HEIGHT,
            )
        return out

    timed("full indirect_bounce", full, state, cam, q, origin, coords, found)


if __name__ == "__main__":
    main()
