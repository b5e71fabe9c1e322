#!/usr/bin/env python
"""Perf attribution for the fast render kernel on real TPU.

Times raytrace_tiles variants (full / no-shadow / no-sweep / prepass on-off)
on the bench scene so kernel changes can be attributed.  Not part of the
test suite; run manually: `python tools/profile_frame.py [variants...]`.
"""

import os
import sys
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
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.render import render_fast as RF
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 256
WIDTH, HEIGHT = 1920, 1080
REPS = 20


def bench_scene():
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))
    state = make_multi_step(spec, 80)(state)
    device_sync(state)
    return state


def cam_vec():
    view = mat4.initial_view_matrix()
    return jnp.asarray(
        RF.pack_cam(
            view, WIDTH, HEIGHT, (0.721, 1.0, 1.0), 5.0, 0.85, 0.29,
            (0.17, 0.17, 0.17), (0.0, 0.0, 0.0), elapsed_time=0.1,
        )
    )


def time_variant(state, cam, label, **kw):
    coarse = coarse_occupancy(state)

    @jax.jit
    def many(st, co, cv):
        # fori_loop: the kernel compiles once (an unrolled python loop of
        # 20 pallas calls blows the 10-min compile budget on this relay).
        def body(i, acc):
            rgb, depth, idx = RF.raytrace_tiles(
                st, co, cv + i.astype(jnp.float32) * 1e-6, grid_size=GRID,
                width=WIDTH, height=HEIGHT, **kw,
            )
            return acc + rgb
        acc = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
        )
        return acc

    r = many(state, coarse, cam)
    device_sync(r)
    t0 = time.perf_counter()
    r = many(state, coarse, cam)
    device_sync(r)
    ms = (time.perf_counter() - t0) * 1000.0 / REPS
    print(f"{label:40s} {ms:8.3f} ms")
    return ms


def main():
    which = set(sys.argv[1:]) or {"full", "noshadow", "nosweep", "nopre"}
    state = bench_scene()
    cam = cam_vec()
    if "full" in which:
        # Defaults: shadow on, prepass OFF (measured loss at bench density).
        time_variant(state, cam, "full (shadow, default gates)")
    if "noshadow" in which:
        time_variant(state, cam, "no shadow", shadow=False)
    if "nopre" in which:
        time_variant(state, cam, "no prepass", use_prepass=False)
    if "nopre-noshadow" in which:
        time_variant(state, cam, "no prepass, no shadow",
                     use_prepass=False, shadow=False)
    if "nosweep" in which:
        time_variant(state, cam, "no sweep (floor)", _debug_no_sweep=True)
    if "empty" in which:
        empty = jnp.zeros_like(state)
        time_variant(empty, cam, "empty volume (full)")


if __name__ == "__main__":
    main()
