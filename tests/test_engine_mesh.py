"""Mesh-aware Engine (BASELINE config 5 as a first-class API).

Runs on the virtual 8-device CPU mesh (conftest.py): Z-sharded CA stepping
with ICI halo exchange plus pixel-row-sharded rendering, compared against
a single-device Engine for exact state/frame parity.
"""

import numpy as np
import jax
import pytest

from cellularautomatons3d_tpu.engine import Engine


needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

COMMON = dict(grid_size=64, width=128, height=64, depth_samples=8,
              shadow_samples=4)


@needs_mesh
def test_mesh_engine_steps_match_single_device():
    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    em.step(6)
    e1.step(6)
    np.testing.assert_array_equal(em.state_dense(), e1.state_dense())


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_fast_frame_matches_single_device():
    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    em.step(4)
    e1.step(4)
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())
    assert fm.shape == f1.shape == (64, 128, 3)
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_tick_accumulates_history():
    em = Engine(mesh_devices=8, **COMMON)
    em.tick()
    first_idx = np.asarray(em.history.hit_idx)
    em.tick()
    assert (np.asarray(em.history.hit_idx) >= -1).all()
    # Something was rendered and the history carries hit ids.
    assert (first_idx >= 0).any()


@needs_mesh
def test_mesh_engine_reference_pipeline():
    em = Engine(mesh_devices=8, pipeline="reference", **COMMON)
    e1 = Engine(pipeline="reference", **COMMON)
    em.step(3)
    e1.step(3)
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_multistate():
    em = Engine(mesh_devices=8, total_states=4, **COMMON)
    e1 = Engine(total_states=4, **COMMON)
    em.step(5)
    e1.step(5)
    np.testing.assert_array_equal(em.state_dense(), e1.state_dense())
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


def test_mesh_devices_validation():
    with pytest.raises(ValueError):
        Engine(grid_size=64, mesh_devices=7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        Engine(grid_size=64, height=100, mesh_devices=8)  # 100 % 8 != 0


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_panning_keeps_history_via_reprojection():
    """Under camera motion, the mesh path must reproject history within
    each row shard (round-2: it hard-coded camera_static=True, ghosting
    old-viewpoint history; round-3: row-local reprojection).  Mirrors
    test_renderer_fast.test_panning_camera_keeps_history_via_reprojection
    at the Engine level: frames under motion must match the single-device
    moving-camera render away from shard boundaries."""
    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    em.step(4)
    e1.step(4)
    # Converge history over a few static frames.
    for _ in range(3):
        em.render()
        e1.render()
    # Pan: small rotation — most pixels reproject within their shard.
    em.camera.rotate((0.0, 1.0, 0.0), 0.04)
    e1.camera.rotate((0.0, 1.0, 0.0), 0.04)
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())
    ok = np.isclose(fm, f1, rtol=3e-3, atol=3e-4).mean()
    # Cross-shard reprojections are rejected in mesh mode (fresh color);
    # everything else must agree with the reprojecting single-device path.
    assert ok > 0.97, f"only {ok:.2%} of pixels match the moving render"
    # And the single-device moving render itself differs from a fresh
    # (history-free) one — i.e. the comparison above proves accumulation.
    e2 = Engine(**COMMON)
    e2.step(4)
    e2.camera.rotate((0.0, 1.0, 0.0), 0.04)
    f_fresh = np.asarray(e2.render())
    hit = np.asarray(e1.history.hit_idx) >= 0
    # Deterministic exact-DDA frames are view-smooth: after a 0.04 rad
    # pan most same-cell colors sit within tolerance of the fresh render
    # (measured ~5% differ at rtol 1e-3), so require a structured,
    # non-vacuous blend rather than a large fraction — the strong
    # reprojection invariants live in test_renderer_fast's panning test.
    diff = np.abs(f1 - f_fresh)[hit]
    assert diff.max() > 5e-4 and (diff > 2e-4).mean() > 0.02


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_run_fused_matches_single_device():
    """Mesh-mode fused loop (round-3 verdict item: `run_fused` raised for
    mesh engines): k frames of (sharded step + row-sharded frame) chained
    in one on-device fori_loop inside shard_map must equal the
    single-device fused loop's final state and frame."""
    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    em.step(4)
    e1.step(4)
    fm = np.asarray(em.run_fused(3))
    f1 = np.asarray(e1.run_fused(3))
    assert em.simulation_step == e1.simulation_step == 7
    np.testing.assert_array_equal(em.state_dense(), e1.state_dense())
    assert fm.shape == f1.shape == (64, 128, 3)
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


@needs_mesh
@pytest.mark.heavy
def test_mesh_engine_sliced_render_matches_single_device():
    """Mesh + SLICED fast render (the > 256³ config-5 composition):
    `raytrace_sliced` inside `shard_map`, forced at test scale via
    RenderStatic.force_sliced with 2 z-slabs × 2 x-chunks — the brick
    scan, min-t composite and occlusion kernels all execute per row
    shard.  Round-3 verdict: this composition had never executed."""
    import dataclasses

    em = Engine(mesh_devices=8, **COMMON)
    e1 = Engine(**COMMON)
    forced = dict(force_sliced=True, slab_planes=32, x_chunk_cells=32)
    em.render_static = dataclasses.replace(em.render_static, **forced)
    em.step(4)
    e1.step(4)
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())  # single-device fused path
    assert fm.shape == f1.shape == (64, 128, 3)
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


# ------------------------------------------------------- 2-D (z, y) mesh --


@needs_mesh
def test_mesh2d_engine_steps_match_single_device():
    em = Engine(mesh_shape=(4, 2), **COMMON)
    e1 = Engine(**COMMON)
    em.step(6)
    e1.step(6)
    np.testing.assert_array_equal(em.state_dense(), e1.state_dense())


@needs_mesh
@pytest.mark.heavy
def test_mesh2d_engine_fast_frame_matches_single_device():
    em = Engine(mesh_shape=(2, 4), **COMMON)
    e1 = Engine(**COMMON)
    em.step(4)
    e1.step(4)
    fm = np.asarray(em.render())
    f1 = np.asarray(e1.render())
    assert fm.shape == f1.shape == (64, 128, 3)
    np.testing.assert_allclose(fm, f1, rtol=3e-3, atol=3e-4)


def test_mesh_shape_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Engine(grid_size=64, mesh_shape=(3, 2))     # 64 % 3 != 0
    with _pytest.raises(ValueError):
        Engine(grid_size=64, mesh_shape=(2, 2), mesh_devices=8)  # 4 != 8
