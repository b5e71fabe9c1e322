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
