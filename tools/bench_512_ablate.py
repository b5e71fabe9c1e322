#!/usr/bin/env python
"""512³ sliced-frame ablation: attribute the round-4 regression.

Chains k sliced frames (raytrace_sliced only, no composition) in one
jit.  Env toggles: CA3D_BD_SHADOW=0 drops the occlusion pass (isolates
the rewritten multi-query shadow kernel), CA3D_BRICK_SKIP=0 removes the
per-brick lax.cond wrappers.  Prints one JSON line.
"""

import json
import sys
import time

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.render.render_fast import pack_cam
from cellularautomatons3d_tpu.render.render_slab import raytrace_sliced
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 512
WIDTH, HEIGHT = 1920, 1080


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    shadow = _os.environ.get("CA3D_BD_SHADOW", "1") == "1"
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))
    state = make_multi_step(spec, 160)(state)
    device_sync(state)
    cam = jnp.asarray(pack_cam(
        mat4.initial_view_matrix(), WIDTH, HEIGHT, (0.721, 1.0, 1.0), 5.0,
        0.85, 0.29, (0.17,) * 3, (0.0,) * 3, elapsed_time=0.1,
    ))

    @jax.jit
    def run(st):
        def body(i, acc):
            # i-dependence defeats any loop-invariant hoisting (the time
            # perturbation is numerically inert for hard shadows).
            cam_i = cam.at[31].add(1e-12 * i.astype(jnp.float32))
            rgb, depth, idx = raytrace_sliced(
                st, cam_i, grid_size=GRID, width=WIDTH, height=HEIGHT,
                shadow=shadow,
            )
            return acc + rgb[0, 0, 0]

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    out = run(state)
    device_sync(out)
    t0 = time.perf_counter()
    out = run(state)
    device_sync(out)
    ms = (time.perf_counter() - t0) * 1000.0 / k
    print(json.dumps({
        "metric": "512^3 sliced 1080p frame (ablate)",
        "value": round(ms, 3), "unit": "ms",
        "shadow": shadow,
        "brick_skip": _os.environ.get("CA3D_BRICK_SKIP", "1"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
