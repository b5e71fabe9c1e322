#!/usr/bin/env python
"""Scale/feature benchmarks on real TPU (manual; bench.py stays the one
driver-run JSON line).

Prints one JSON line per scenario:
  * 512³ step + sliced 1080p frame (BASELINE config 5 scale, single chip)
  * 1024³ sliced 1080p frame (reference grid ceiling, brick decomposition)
  * 256³ GI (one-bounce) + soft shadows(4) frame (BASELINE config 4)

Timing per bench.py's methodology: this transport has ~30-60 ms dispatch
latency, so every number chains K iterations inside one jit and syncs via
a 1-element readback.  Run: `python tools/bench_scale.py [names...]`
(default: all).  Names: 512, 1024, gi.
"""

import json
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
import jax.numpy as jnp

# sitecustomize imports jax before this script — set the cache via
# config, not the (too-late) env var.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.loop import make_multi_step
from cellularautomatons3d_tpu.render import renderer_fast as RFW
from cellularautomatons3d_tpu.render.renderer import RenderParams, RenderStatic
from cellularautomatons3d_tpu.utils import mat4
from cellularautomatons3d_tpu.utils.metrics import device_sync

WIDTH, HEIGHT = 1920, 1080


def _params():
    view = mat4.initial_view_matrix()
    proj = mat4.initial_projection_matrix(WIDTH, HEIGHT)
    proj_view = mat4.multiply(proj, mat4.inverse(view))
    return RenderParams(
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


def _scene(grid, steps=80):
    spec = ca.AutomatonSpec.from_config(ca.EngineConfig(grid_size=grid))
    state = jnp.asarray(ca.pack_grid(ca.seed_center(grid)))
    state = make_multi_step(spec, steps)(state)
    device_sync(state)
    return spec, state


def _timed_frames(s, spec, state, k=5):
    """Per-frame ms of render_frame_fast chained k× in one jit."""
    params = _params()

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def run(st, hist):
        def body(i, carry):
            h, _ = carry
            frame, _, h = RFW.render_frame_fast(
                s, st, params, h, True, None, 2, None, None,
                i.astype(jnp.int32) if s.gi_temporal else None,
            )
            return h, frame

        return jax.lax.fori_loop(
            0, k, body,
            (hist, jnp.zeros((s.height, s.width, 3), jnp.float32)),
        )

    hist = RFW.init_fast_history(s.width, s.height)
    h, frame = run(state, hist)  # compile + warm
    device_sync(frame)
    t0 = time.perf_counter()
    h, frame = run(state, RFW.init_fast_history(s.width, s.height))
    device_sync(frame)
    return (time.perf_counter() - t0) * 1000.0 / k


def bench_512():
    spec, state = _scene(512, steps=160)
    s = RenderStatic(width=WIDTH, height=HEIGHT, grid_size=512,
                     depth_samples=35, shadow_samples=30)
    frame_ms = _timed_frames(s, spec, state)
    run_steps = make_multi_step(spec, 50)
    st = run_steps(state)
    device_sync(st)
    t0 = time.perf_counter()
    st = run_steps(st)
    device_sync(st)
    step_ms = (time.perf_counter() - t0) * 1000.0 / 50
    print(json.dumps({
        "metric": "512^3 CA step + sliced 1080p frame",
        "value": round(frame_ms + step_ms, 3), "unit": "ms",
        "frame_ms": round(frame_ms, 3), "step_ms": round(step_ms, 3),
        "device": str(jax.devices()[0]),
    }))


def bench_1024():
    spec, state = _scene(1024, steps=200)
    s = RenderStatic(width=WIDTH, height=HEIGHT, grid_size=1024,
                     depth_samples=35, shadow_samples=30)
    frame_ms = _timed_frames(s, spec, state, k=3)
    print(json.dumps({
        "metric": "1024^3 sliced 1080p frame (brick decomposition)",
        "value": round(frame_ms, 3), "unit": "ms",
        "device": str(jax.devices()[0]),
    }))


def bench_gi():
    """Full-quality config 4: every soft sample and GI slot evaluated
    every frame, measured on the PRODUCTION fused loop (one CA step +
    one composed frame per iteration, blocked end-to-end pipeline, all
    8 occlusion queries in one multi-query launch)."""
    spec, state = _scene(256)
    s = RenderStatic(width=WIDTH, height=HEIGHT, grid_size=256,
                     depth_samples=35, shadow_samples=30,
                     indirect_lighting=True, soft_shadow_samples=4)
    k = 20
    run = RFW.make_fused_loop(s, spec, k, reset_every=10)
    params = _params()
    st, hist, frame = run(state + 0, params,
                          RFW.init_fast_history(WIDTH, HEIGHT))
    device_sync(frame)
    t0 = time.perf_counter()
    st, hist, frame = run(state + 0, params,
                          RFW.init_fast_history(WIDTH, HEIGHT))
    device_sync(frame)
    frame_ms = (time.perf_counter() - t0) * 1000.0 / k
    print(json.dumps({
        "metric": "256^3 step + GI(1-bounce)+soft(4) composed 1080p frame "
                  "(fused loop, every sample)",
        "value": round(frame_ms, 3), "unit": "ms",
        "target_ms": 33.3,
        "device": str(jax.devices()[0]),
    }))


def bench_gi_temporal():
    """The real-time GI mode: one rotating soft-shadow sample + one
    rotating GI slot per frame (RenderStatic.gi_temporal), converging to
    the full 4-sample lighting through the temporal EMA."""
    spec, state = _scene(256)
    s = RenderStatic(width=WIDTH, height=HEIGHT, grid_size=256,
                     depth_samples=35, shadow_samples=30,
                     indirect_lighting=True, soft_shadow_samples=4,
                     gi_temporal=True)
    frame_ms = _timed_frames(s, spec, state, k=20)
    print(json.dumps({
        "metric": "256^3 GI temporal (1 rotating sample/frame) 1080p frame",
        "value": round(frame_ms, 3), "unit": "ms",
        "target_ms": 33.3,
        "device": str(jax.devices()[0]),
    }))


def bench_gi_temporal_loop():
    """The PRODUCTION temporal-GI loop: make_fused_loop's blocked
    end-to-end path (step + primary kernel + one multi-query occlusion
    launch + blocked composition per frame, history carried blocked) —
    the real-time config-4 number."""
    spec, state = _scene(256)
    s = RenderStatic(width=WIDTH, height=HEIGHT, grid_size=256,
                     depth_samples=35, shadow_samples=30,
                     indirect_lighting=True, soft_shadow_samples=4,
                     gi_temporal=True)
    k = 50
    run = RFW.make_fused_loop(s, spec, k, reset_every=10)
    params = _params()
    hist = RFW.init_fast_history(WIDTH, HEIGHT)
    st, hist, frame = run(state + 0, params, hist)
    device_sync(frame)
    t0 = time.perf_counter()
    st, hist, frame = run(state + 0, params, RFW.init_fast_history(WIDTH, HEIGHT))
    device_sync(frame)
    frame_ms = (time.perf_counter() - t0) * 1000.0 / k
    print(json.dumps({
        "metric": "256^3 step + GI-temporal composed 1080p frame (fused loop)",
        "value": round(frame_ms, 3), "unit": "ms",
        "target_ms": 16.7,
        "device": str(jax.devices()[0]),
    }))


BENCHES = {"512": bench_512, "1024": bench_1024, "gi": bench_gi,
           "gi_temporal": bench_gi_temporal,
           "gi_temporal_loop": bench_gi_temporal_loop}


if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    for name in names:
        BENCHES[name]()
