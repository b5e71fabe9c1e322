#!/usr/bin/env python
"""Benchmark: the BASELINE.json north-star metric on real hardware.

Measures (1) CA generations/sec on a 256³ bit-packed grid (default rule,
clustered semantics) and (2) path-traced 1080p frame time over the same
volume, then reports the combined per-(step+frame) milliseconds against the
16 ms target.  Prints exactly ONE JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.render import renderer as R
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

GRID = 256
WIDTH, HEIGHT = 1920, 1080
STEP_REPS = 200
FRAME_REPS = 3


def main():
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=GRID))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(GRID)))

    # Grow a representative scene (the default rule's octahedral growth).
    grow = make_multi_step(spec, 80)
    state = grow(state)
    device_sync(state)

    # --- CA step throughput (fused loop, donation) -----------------------
    # NOTE: timings sync via a 1-element host readback (device_sync) —
    # block_until_ready is unreliable on this PJRT transport.
    run_steps = make_multi_step(spec, STEP_REPS)
    state = run_steps(state)  # compile + warm
    device_sync(state)
    t0 = time.perf_counter()
    state = run_steps(state)
    device_sync(state)
    step_ms = (time.perf_counter() - t0) * 1000.0 / STEP_REPS

    # --- 1080p render ------------------------------------------------------
    view = mat4.initial_view_matrix()
    proj = mat4.initial_projection_matrix(WIDTH, HEIGHT)
    proj_view = mat4.multiply(proj, mat4.inverse(view))
    s = R.RenderStatic(width=WIDTH, height=HEIGHT, grid_size=GRID)
    params = R.RenderParams(
        view_mat=jnp.asarray(view),
        prev_view_mat=jnp.asarray(view),
        prev_proj_view=jnp.asarray(proj_view),
        elapsed_time=jnp.float32(0.1),
        cell_size=jnp.float32(0.85),
        temporal_alpha=jnp.float32(0.1),
        gamma=jnp.float32(2.0),
        roughness=jnp.float32(0.29),
        base_reflectivity=jnp.full((3,), 0.17, jnp.float32),
        material_color=jnp.zeros((3,), jnp.float32),
        light_pos=jnp.asarray([0.721, 1.0, 1.0], jnp.float32),
        light_magnitude=jnp.float32(5.0),
        show_depth_overlay=jnp.float32(0.0),
    )
    history = R.init_history(WIDTH, HEIGHT)
    frame, history = R.render_frame(s, state, params, history)  # compile
    device_sync(frame)
    t0 = time.perf_counter()
    for i in range(FRAME_REPS):
        params = params._replace(elapsed_time=jnp.float32(0.1 + 0.0173 * i))
        frame, history = R.render_frame(s, state, params, history)
    device_sync(frame)
    frame_ms = (time.perf_counter() - t0) * 1000.0 / FRAME_REPS

    combined_ms = step_ms + frame_ms
    target_ms = 16.0
    print(
        json.dumps(
            {
                "metric": "256^3 CA step + 1080p path-traced frame",
                "value": round(combined_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / combined_ms, 3),
                "step_ms": round(step_ms, 3),
                "frame_ms": round(frame_ms, 3),
                "ca_steps_per_sec": round(1000.0 / step_ms, 1),
                "render_fps": round(1000.0 / frame_ms, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
