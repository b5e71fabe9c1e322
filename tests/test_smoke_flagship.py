"""Non-heavy smoke coverage for the round-4 flagship paths.

The production 256×128 kernel tile makes interpret-mode parity tests
minutes-long, so every extended-lighting / mesh parity test was
`heavy`-marked and the default suite never executed the flagship code
(round-4 verdict weak #3).  These smokes run the SAME kernels on a tiny
32×32 tile (CA3D_SUB=8 / CA3D_BW=32, read at import → subprocess) so
`pytest tests/` touches:

* the multi-query occlusion kernel (`lighting_passes`, nq=4 vs nq=1),
* the blocked end-to-end extended-lighting frame (`_ext_frame_blocked`,
  depth overlay ON — the overlay-before-gamma convention),
* the mesh fused loop (`Engine.run_fused` under shard_map),
* the mesh sliced render (`raytrace_sliced` inside shard_map).

The full-size equivalents remain as the `heavy` suite (CA3D_HEAVY=1).
"""

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _run_child(script, marker, extra_env):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "CA3D_SUB": "8",
        "CA3D_BW": "32",
        "CA3D_CS_SUB": "8",
    })
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(_HERE, script)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, f"{script} failed (rc={proc.returncode})"
    assert marker in proc.stdout


def test_flagship_lighting_smoke_tiny_tile():
    _run_child("_smoke_child_lighting.py", "SMOKE-LIGHTING-OK", {})


def test_flagship_mesh_smoke_tiny_tile():
    _run_child(
        "_smoke_child_mesh.py", "SMOKE-MESH-OK",
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
