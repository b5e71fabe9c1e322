#!/usr/bin/env python
"""Dense-scene frame ablation (manual; small program ⇒ fast compile).

The unpinned bench line densifies the scene to near grid-filling
(generation ~230 at K=150); this tool times JUST the composed frame on
that dense state, chained K× in one jit — no CA step, no reset logic —
so kernel variants (CA3D_SLICEGATE/CA3D_MIP1) can be compared without
paying the full fused-loop compile each time.

Usage: [CA3D_SLICEGATE=1] python tools/bench_dense.py [gen] [k]
Prints one JSON line.
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
from cellularautomatons3d_tpu.render import renderer_fast as RFW
from cellularautomatons3d_tpu.render.render_fast import _to_blocks, raytrace_tiles
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 256
WIDTH, HEIGHT = 1920, 1080


def main():
    gen = int(sys.argv[1]) if len(sys.argv) > 1 else 230
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))
    state = make_multi_step(spec, gen)(state)
    device_sync(state)
    pop = int(jnp.sum(jax.vmap(lambda w: jnp.sum(
        jnp.unpackbits(w.view(jnp.uint8)).astype(jnp.int32)))(
        state.reshape(-1, state.shape[-1])).astype(jnp.int64)))

    view = mat4.initial_view_matrix()
    import numpy as np

    from cellularautomatons3d_tpu.render.render_fast import pack_cam

    cam = jnp.asarray(pack_cam(
        view, WIDTH, HEIGHT, (0.721, 1.0, 1.0), 5.0, 0.85, 0.29,
        (0.17,) * 3, (0.0,) * 3, elapsed_time=0.1,
    ))

    hist0 = (
        _to_blocks(jnp.zeros((HEIGHT, WIDTH), jnp.float32), WIDTH, HEIGHT),
        _to_blocks(jnp.zeros((HEIGHT, WIDTH), jnp.float32), WIDTH, HEIGHT),
        _to_blocks(jnp.zeros((HEIGHT, WIDTH), jnp.float32), WIDTH, HEIGHT),
        _to_blocks(jnp.full((HEIGHT, WIDTH), -1, jnp.int32), WIDTH, HEIGHT,
                   fill=-1),
    )

    shadow = _os.environ.get("CA3D_BD_SHADOW", "1") == "1"
    no_sweep = _os.environ.get("CA3D_BD_NOSWEEP", "0") == "1"
    prepass = _os.environ.get("CA3D_PREPASS", "0") == "1"

    @jax.jit
    def run(st, hist):
        def body(i, carry):
            h, _ = carry
            outs = raytrace_tiles(
                st, coarse_occupancy(st), cam, None, h,
                grid_size=GRID, width=WIDTH, height=HEIGHT,
                shadow=shadow, _debug_no_sweep=no_sweep,
                use_prepass=prepass,
            )
            pr, pg, pb, d, idx, nr, ng, nb = outs
            return (nr, ng, nb, idx), (pr, pg, pb)

        return jax.lax.fori_loop(0, k, body, (hist, (hist[0],) * 3))

    hist, pres = run(state, hist0)
    device_sync(pres[0])
    t0 = time.perf_counter()
    hist, pres = run(state, hist0)
    device_sync(pres[0])
    ms = (time.perf_counter() - t0) * 1000.0 / k
    print(json.dumps({
        "metric": f"256^3 composed 1080p frame, generation-{gen} scene",
        "value": round(ms, 3), "unit": "ms", "population": pop,
        "slicegate": _os.environ.get("CA3D_SLICEGATE", "0"),
        "mip1": _os.environ.get("CA3D_MIP1", "0"),
        "prepass": prepass,
        "shadow": shadow, "no_sweep": no_sweep,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
