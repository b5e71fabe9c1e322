#!/usr/bin/env python
"""Benchmark: the BASELINE.json north-star metric on real hardware.

Measures the fused production loop — one 256³ CA generation plus one
path-traced 1080p frame per iteration, chained on-device — and reports the
combined per-iteration milliseconds against the 16 ms (60 FPS) target.

Timing methodology: this PJRT transport adds ~30-60 ms of per-dispatch
round-trip latency and `block_until_ready` returns early, so K iterations
run inside ONE jitted program and completion is forced with a 1-element
host readback; per-iteration time therefore amortizes at most one dispatch
(< 6 ms at K=10).  Prints exactly ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.ca_step import fires_plane
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.render import render_fast as RF
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 256
WIDTH, HEIGHT = 1920, 1080
K = 10


def main():
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))
    state = make_multi_step(spec, 80)(state)  # representative scene
    device_sync(state)

    cam = jnp.asarray(
        RF.pack_cam(
            mat4.initial_view_matrix(), WIDTH, HEIGHT,
            (0.721, 1.0, 1.0), 5.0, 0.85, 0.29, (0.17,) * 3, (0.0,) * 3,
        )
    )

    @jax.jit
    def sim_render_k(state, cam):
        def body(i, carry):
            st, acc = carry
            st = fires_plane(st, spec)  # one CA generation
            co = coarse_occupancy(st)
            rgb, depth, idx = RF.raytrace_tiles(
                st, co, cam.at[RF.P_LMAG].add(acc * 1e-12),
                grid_size=GRID, width=WIDTH, height=HEIGHT,
            )
            return st, acc + rgb[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, (state, jnp.float32(0.0)))

    out = sim_render_k(state, cam)  # compile + warm
    device_sync(out)
    t0 = time.perf_counter()
    out = sim_render_k(state, cam)
    device_sync(out)
    combined_ms = (time.perf_counter() - t0) * 1000.0 / K

    # CA step throughput alone (fused loop).
    run_steps = make_multi_step(spec, 1000)
    s2 = run_steps(state)
    device_sync(s2)
    t0 = time.perf_counter()
    s2 = run_steps(s2)
    device_sync(s2)
    step_ms = (time.perf_counter() - t0) * 1000.0 / 1000

    target_ms = 16.0
    print(
        json.dumps(
            {
                "metric": "256^3 CA step + 1080p path-traced frame",
                "value": round(combined_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / combined_ms, 3),
                "step_ms": round(step_ms, 4),
                "frame_ms": round(combined_ms - step_ms, 3),
                "ca_steps_per_sec": round(1000.0 / step_ms, 1),
                "fps": round(1000.0 / combined_ms, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
