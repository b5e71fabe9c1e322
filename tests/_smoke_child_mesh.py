"""Subprocess body for the mesh-mode flagship smoke tests.

Run by test_smoke_flagship.py with CA3D_SUB=8 / CA3D_BW=32 and 8 virtual
CPU devices: exercises the two round-4 flagship mesh compositions that
were otherwise only covered by `heavy`-marked tests —

1. `Engine.run_fused` on a mesh engine (k frames of sharded step +
   row-sharded frame in ONE fori_loop inside shard_map) vs the
   single-device fused loop.
2. The mesh + SLICED fast render (`raytrace_sliced` inside `shard_map`,
   forced at test scale) vs the single-device render.
3. The viewer serving a MESH engine end to end (config 5's interactive
   surface: `python -m …viewer --grid … --mesh 8`): tick → PNG frame,
   camera input, and the restart flow through ViewerServer.
"""

import dataclasses
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# See tests/conftest.py: the host pins jax_platforms to the TPU plugin at
# interpreter start; pin it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np

from cellularautomatons3d_tpu.engine import Engine

COMMON = dict(grid_size=32, width=64, height=32, depth_samples=8,
              shadow_samples=4)


def main():
    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    em.step(4)
    e1.step(4)
    fm = np.asarray(em.run_fused(2))
    f1 = np.asarray(e1.run_fused(2))
    assert em.simulation_step == e1.simulation_step == 6
    np.testing.assert_array_equal(em.state_dense(), e1.state_dense())
    assert fm.shape == f1.shape == (32, 64, 3)
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)
    print("smoke 1/2 ok: mesh run_fused == single-device", flush=True)

    # Sliced leg at grid 64: slab_planes must be a multiple of 32 (the
    # GROUP-of-4-columns sweep structure), so 64³ → 2 z-slabs × 2
    # x-chunks = 4 bricks, crossing both brick axes.
    em2 = Engine(mesh_devices=8, **{**COMMON, "grid_size": 64})
    e2 = Engine(**{**COMMON, "grid_size": 64})
    forced = dict(force_sliced=True, slab_planes=32, x_chunk_cells=32)
    em2.render_static = dataclasses.replace(em2.render_static, **forced)
    em2.step(4)
    e2.step(4)
    fm2 = np.asarray(em2.render())
    f2 = np.asarray(e2.render())
    assert fm2.shape == f2.shape == (32, 64, 3)
    np.testing.assert_allclose(fm2, f2, rtol=3e-3, atol=3e-4)
    print("smoke 2/3 ok: mesh sliced render == single-device", flush=True)

    # Viewer over a mesh engine (the --mesh N CLI path).
    from cellularautomatons3d_tpu.viewer.server import ViewerServer

    vs = ViewerServer(engine=Engine(mesh_devices=8, **COMMON))
    png = vs.frame_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 100
    out = vs.handle_input({"type": "keys", "dt": 0.016,
                           "translate": [0, 0, 1], "rotate": [0, 0, 0]})
    # (one 16.7 ms tick is below the 48 ms default sim cadence, so no CA
    # step is due yet — "ok" plus a served frame is the contract here)
    assert out["ok"]
    spec = {f["name"]: f for f in vs.field_spec()}
    assert spec["mesh_devices"]["value"] == 8
    vs.handle_input({"type": "param", "name": "grid_size", "value": 64})
    assert vs.engine.restart_required
    vs.handle_input({"type": "restart"})
    assert not vs.engine.restart_required
    assert vs.engine.config.grid_size == 64
    png2 = vs.frame_png()
    assert png2[:8] == b"\x89PNG\r\n\x1a\n"
    print("smoke 3/3 ok: viewer serves a mesh engine", flush=True)


if __name__ == "__main__":
    main()
    print("SMOKE-MESH-OK")
