"""Engine: lifecycle, frame loop and reconfiguration.

The TPU-native counterpart of the reference's host orchestrator
(``MainModule``, main_pathtraced.js:96-1855), redesigned around functional
state:

* GPU buffers/bind groups/uniform arena → jnp arrays + kernel operands;
* the rAF frame loop (main_pathtraced.js:1821-1854) → :meth:`tick`, with the
  same semantics: render every frame, advance the CA when the accumulated
  frame time crosses ``compute_step_duration_ms`` (main_pathtraced.js:1838-1847),
  so the displayed state lags the computed one by ≤ 1 step;
* ``_restartSim`` (main_pathtraced.js:624-637) → :meth:`restart`: deferred
  restart-bound values applied, counters zeroed, rules recompiled (= new
  trace-time constants), state reseeded;
* live parameter edits (main_pathtraced.js:639-650) → :meth:`set`, which
  defers restart-bound fields exactly like ``applyOnRestart``;
* checkpoint/resume (absent in the reference, SURVEY.md §5) →
  :meth:`save`/:meth:`load` of the packed grid + config + counters.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp

from .models.automaton import AutomatonSpec
from .ops import packing
from .ops.ca_step import step_packed, step_packed_multistate
from .render.camera import CameraRig
from .render.renderer import (
    RenderHistory,
    RenderParams,
    RenderStatic,
    init_history,
    render_frame,
)
from .render.renderer_fast import (
    FastHistory,
    init_fast_history,
    render_frame_fast,
)
from .utils.config import EngineConfig

__all__ = ["Engine"]


class Engine:
    """A running automaton + renderer with carried temporal state."""

    def __init__(self, config: EngineConfig | None = None, **overrides):
        if config is None:
            config = EngineConfig(**overrides)
        elif overrides:
            config = config.replace(**overrides)
        self.config = config
        self.camera = CameraRig()
        self._pending_restart: list[tuple[str, object]] = []
        self._time_ms = 0.0
        self._build()

    # ------------------------------------------------------------------ #
    # lifecycle
    # ------------------------------------------------------------------ #
    def _build(self):
        cfg = self.config
        self.spec = AutomatonSpec.from_config(cfg)
        self.render_static = RenderStatic(
            width=cfg.width,
            height=cfg.height,
            grid_size=cfg.grid_size,
            depth_samples=int(cfg.depth_samples),
            shadow_samples=int(cfg.shadow_samples),
            indirect_lighting=bool(cfg.indirect_lighting),
            soft_shadow_samples=int(cfg.soft_shadow_samples),
            indirect_bounces=int(cfg.indirect_bounces),
            gi_temporal=bool(cfg.gi_temporal),
        )
        self.simulation_step = 0
        self._frame_duration = 0.0
        self._render_count = 0
        self.mesh = None
        self._sharded_step = None
        self._mesh_render = None
        if cfg.mesh_devices:
            # Multi-chip mode (BASELINE config 5): Z-sharded CA step with
            # ICI halo exchange + pixel-row-sharded rendering.  A 2-D
            # mesh_shape additionally shards Y (pod scale).
            from .parallel.sharded import make_mesh, make_sharded_step

            self.mesh = make_mesh(cfg.mesh_devices, shape=cfg.mesh_shape)
            self._sharded_step = make_sharded_step(self.spec, self.mesh)
        if cfg.pipeline == "fast":
            self.history = init_fast_history(cfg.width, cfg.height)
        else:
            self.history = init_history(cfg.width, cfg.height)
        if self.mesh is not None:
            self.history = self._shard_history(self.history)
        self._seed_state()

    def _seed_state(self):
        cfg = self.config
        if cfg.random_initial_state:
            dense = packing.seed_random_block(cfg.grid_size, rng=cfg.seed)
        else:
            dense = packing.seed_center(cfg.grid_size)
        self.set_state_dense(dense)

    # ------------------------------------------------------------------ #
    # state accessors
    # ------------------------------------------------------------------ #
    def set_state_dense(self, dense: np.ndarray):
        """Load a dense ``uint8[Z, Y, X]`` age grid as the current state."""
        nbits = self.spec.age_bits
        if self.spec.total_states == 2:
            self.state = jnp.asarray(packing.pack_grid(dense))
        else:
            planes = [packing.pack_grid((dense >> i) & 1) for i in range(nbits)]
            self.state = jnp.asarray(np.stack(planes))
        if self.mesh is not None:
            from .parallel.sharded import shard_state

            self.state = shard_state(self.state, self.mesh)

    def _shard_history(self, history):
        """Place history buffers pixel-row-sharded over the mesh (over
        every mesh axis — a 2-D mesh splits rows mz·my ways)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(self.mesh.axis_names)

        def rows(x):
            spec = P(axes, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree.map(rows, history)

    def state_dense(self) -> np.ndarray:
        """Current state as dense ``uint8[Z, Y, X]`` ages."""
        s = np.asarray(self.state)
        if self.spec.total_states == 2:
            return packing.unpack_grid(s)
        return sum(
            packing.unpack_grid(s[i]).astype(np.uint8) << i
            for i in range(s.shape[0])
        )

    def _visibility_plane(self) -> jnp.ndarray:
        """Packed occupancy for the renderer: any cell with age ≥ 1."""
        if self.spec.total_states == 2:
            return self.state
        vis = self.state[0]
        for i in range(1, self.state.shape[0]):
            vis = vis | self.state[i]
        return vis

    # ------------------------------------------------------------------ #
    # simulation
    # ------------------------------------------------------------------ #
    def step(self, n: int = 1):
        """Advance the CA ``n`` generations."""
        for _ in range(n):
            if self._sharded_step is not None:
                self.state = self._sharded_step(self.state)
            elif self.spec.total_states == 2:
                self.state = step_packed(self.state, self.spec)
            else:
                self.state = step_packed_multistate(self.state, self.spec)
            self.simulation_step += 1
        return self

    # ------------------------------------------------------------------ #
    # rendering
    # ------------------------------------------------------------------ #
    def _light_position(self) -> np.ndarray:
        light = self.config.light
        x, y, z = light.position
        if light.animate:
            # main_pathtraced.js:1752-1760 (performance.now()*0.0007 orbit).
            t = self._time_ms * 0.0007
            y = np.sin(t) * light.orbit_distance
            x = np.cos(t) * light.orbit_distance
        return np.array([x, y, z], dtype=np.float32)

    def render_params(self) -> RenderParams:
        cfg = self.config
        view, prev_view, _, prev_proj_view = self.camera.matrices(
            cfg.width, cfg.height
        )
        return RenderParams(
            view_mat=jnp.asarray(view),
            prev_view_mat=jnp.asarray(prev_view),
            prev_proj_view=jnp.asarray(prev_proj_view),
            elapsed_time=jnp.float32(self._time_ms * 1e-4),
            cell_size=jnp.float32(cfg.cell_size),
            temporal_alpha=jnp.float32(cfg.temporal_alpha),
            gamma=jnp.float32(cfg.gamma),
            roughness=jnp.float32(cfg.roughness),
            base_reflectivity=jnp.asarray(cfg.base_reflectivity, jnp.float32),
            material_color=jnp.asarray(cfg.material_color, jnp.float32),
            light_pos=jnp.asarray(self._light_position()),
            light_magnitude=jnp.float32(cfg.light.magnitude),
            show_depth_overlay=jnp.float32(1.0 if cfg.show_depth_overlay else 0.0),
            light_radius=jnp.float32(cfg.light_radius),
            emissive_color=jnp.asarray(cfg.emissive_color, jnp.float32),
            emissive_strength=jnp.float32(cfg.emissive_strength),
        )

    def _build_mesh_render(self, camera_static: bool):
        """Pixel-row-sharded fast render over the mesh (config 5).

        Each device all-gathers the (small, bit-packed) grid over ICI and
        renders its row shard with global UVs via the kernel's row0 offset.
        Temporal accumulation is row-local; under camera motion, history is
        reprojected within the shard's rows and pixels reprojecting
        outside it are rejected (renderer_fast.render_frame_fast), so
        accumulation survives interactive flight (BASELINE config 5).
        """
        import dataclasses as _dc

        from jax.sharding import PartitionSpec as P
        from .parallel.sharded import AXIS, AXIS_Y

        mesh = self.mesh
        ndev = mesh.devices.size
        two_d = AXIS_Y in mesh.axis_names
        my = mesh.shape[AXIS_Y] if two_d else 1
        s = self.render_static
        s_local = _dc.replace(s, height=s.height // ndev)
        multistate = self.spec.total_states > 2
        total_states = self.spec.total_states
        h_local = s.height // ndev

        def local_render(state_local, params, hcolor, hidx):
            zax = 2 if multistate else 1
            gathered = state_local
            if two_d:
                gathered = jax.lax.all_gather(
                    gathered, AXIS_Y, axis=zax + 1, tiled=True
                )
            gathered = jax.lax.all_gather(gathered, AXIS, axis=zax, tiled=True)
            if multistate:
                vis = gathered[0]
                for i in range(1, gathered.shape[0]):
                    vis = vis | gathered[i]
                ages = gathered
            else:
                vis, ages = gathered, None
            flat_idx = jax.lax.axis_index(AXIS)
            if two_d:
                flat_idx = flat_idx * my + jax.lax.axis_index(AXIS_Y)
            row0 = (flat_idx * h_local).astype(jnp.float32)
            frame, _, hist = render_frame_fast(
                s_local, vis, params, FastHistory(hcolor, hidx),
                camera_static, ages, total_states, row0, s.height,
            )
            return frame, hist.color, hist.hit_idx

        y = AXIS_Y if two_d else None
        state_spec = (
            P(None, None, AXIS, y) if multistate else P(None, AXIS, y)
        )
        rows = (AXIS, AXIS_Y) if two_d else AXIS
        sm = jax.shard_map(
            local_render,
            mesh=mesh,
            in_specs=(state_spec, P(), P(rows, None, None), P(rows, None)),
            out_specs=(
                P(rows, None, None), P(rows, None, None), P(rows, None),
            ),
            # pallas_call's out_shapes carry no varying-mesh-axes metadata;
            # shardings here are fully explicit, so skip the vma check.
            check_vma=False,
        )
        return jax.jit(sm)

    def render(self, dt_ms: float = 16.667) -> jnp.ndarray:
        """Render one frame; advances the frame clock and camera history."""
        self._time_ms += dt_ms
        params = self.render_params()
        if self.mesh is not None and self.config.pipeline == "fast":
            camera_static = bool(
                np.array_equal(self.camera.view_mat, self.camera.prev_view_mat)
            )
            if self._mesh_render is None:
                self._mesh_render = {}
            if camera_static not in self._mesh_render:
                self._mesh_render[camera_static] = self._build_mesh_render(
                    camera_static
                )
            frame, hcolor, hidx = self._mesh_render[camera_static](
                self.state, params, self.history.color, self.history.hit_idx
            )
            self.history = FastHistory(color=hcolor, hit_idx=hidx)
        elif self.config.pipeline == "fast":
            camera_static = bool(
                np.array_equal(self.camera.view_mat, self.camera.prev_view_mat)
            )
            multistate = self.spec.total_states > 2
            sample_idx = None
            if self.config.gi_temporal:
                sample_idx = jnp.int32(self._render_count)
            frame, _, self.history = render_frame_fast(
                self.render_static,
                self._visibility_plane(),
                params,
                self.history,
                camera_static,
                self.state if multistate else None,
                self.spec.total_states,
                None,
                None,
                sample_idx,
            )
            self._render_count += 1
        else:
            multistate = self.spec.total_states > 2
            vis = self._visibility_plane()
            ages = self.state if multistate else None
            if self.mesh is not None:
                # GSPMD row-sharded exact render (the dryrun pattern,
                # __graft_entry__.dryrun_multichip): grid replicated,
                # history row-sharded; XLA propagates the pixel split.
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                vis = jax.device_put(vis, rep)
                if ages is not None:
                    ages = jax.device_put(ages, rep)
            frame, self.history = render_frame(
                self.render_static,
                vis,
                params,
                self.history,
                ages,
                self.spec.total_states,
                self.config.render_variant,
            )
        self.camera.end_frame()
        return frame

    def tick(self, dt_ms: float = 16.667) -> jnp.ndarray:
        """One frame-loop iteration with the reference's cadence: render
        first, then step the CA if the sim timer fired
        (main_pathtraced.js:1833-1850)."""
        self._frame_duration += dt_ms
        frame = self.render(dt_ms)
        if self._frame_duration >= self.config.compute_step_duration_ms:
            self.step()
            self._frame_duration = 0.0
        return frame

    def run(self, frames: int, dt_ms: float = 16.667, sink=None):
        """Run the frame loop for ``frames`` iterations; optionally feed
        each frame to ``sink(frame_idx, frame)``."""
        frame = None
        for i in range(frames):
            frame = self.tick(dt_ms)
            if sink is not None:
                sink(i, frame)
        return frame

    # ------------------------------------------------------------------ #
    # reconfiguration (the UI input / restart paths)
    # ------------------------------------------------------------------ #
    # Live fields that nonetheless require rebuilding the render assets
    # (RenderStatic trace-time constants, or the history buffers when the
    # pipeline/resolution changes).  The reference treats depthSamples /
    # shadowSamples as live uniforms and recreates the history textures on
    # resize mid-run (main_pathtraced.js:781-797); here "live" means the
    # change applies on the next frame, at the cost of a recompile.
    _RENDER_REBUILD_FIELDS = frozenset(
        {
            "pipeline",
            "render_variant",
            "depth_samples",
            "shadow_samples",
            "indirect_lighting",
            "indirect_bounces",
            "soft_shadow_samples",
            "gi_temporal",
            "width",
            "height",
        }
    )

    def set(self, name: str, value):
        """Set a parameter by config-field name.  Live fields apply
        immediately; restart-bound fields are deferred until
        :meth:`restart` (main_pathtraced.js:639-650)."""
        if name in EngineConfig.RESTART_FIELDS:
            self._pending_restart.append((name, value))
            return self
        if "." in name:  # e.g. "light.magnitude"
            head, tail = name.split(".", 1)
            nested = dataclasses.replace(
                getattr(self.config, head), **{tail: value}
            )
            self.config = self.config.replace(**{head: nested})
            return self
        self.config = self.config.replace(**{name: value})
        if name in self._RENDER_REBUILD_FIELDS:
            self._refresh_render_assets()
        return self

    def _refresh_render_assets(self):
        """Rebuild RenderStatic — and the history buffers when their type or
        shape no longer matches — without touching simulation state.  The
        live-resize analogue of main_pathtraced.js:781-797 (which recreates
        the four history textures mid-run)."""
        cfg = self.config
        self.render_static = RenderStatic(
            width=cfg.width,
            height=cfg.height,
            grid_size=cfg.grid_size,
            depth_samples=int(cfg.depth_samples),
            shadow_samples=int(cfg.shadow_samples),
            indirect_lighting=bool(cfg.indirect_lighting),
            soft_shadow_samples=int(cfg.soft_shadow_samples),
            indirect_bounces=int(cfg.indirect_bounces),
            gi_temporal=bool(cfg.gi_temporal),
        )
        want_fast = cfg.pipeline == "fast"
        have_fast = isinstance(self.history, FastHistory)
        shape_ok = self.history.color.shape[:2] == (cfg.height, cfg.width)
        if want_fast != have_fast or not shape_ok:
            self.history = (
                init_fast_history(cfg.width, cfg.height)
                if want_fast
                else init_history(cfg.width, cfg.height)
            )
            if self.mesh is not None:
                self.history = self._shard_history(self.history)
        self._mesh_render = None  # trace-time constants changed

    @property
    def restart_required(self) -> bool:
        return bool(self._pending_restart)

    def restart(self):
        """Apply deferred values, recompile rules, reseed state
        (main_pathtraced.js:624-637)."""
        updates = dict(self._pending_restart)
        self._pending_restart.clear()
        if updates:
            self.config = self.config.replace(**updates)
        self._time_ms = 0.0
        self._build()
        return self

    # ------------------------------------------------------------------ #
    # checkpoint / resume (new capability, SURVEY.md §5)
    # ------------------------------------------------------------------ #
    def save(self, path: str, backend: str = "npz"):
        """Checkpoint to ``path``.  ``backend="npz"`` (default) writes a
        single compressed file via host readback; ``backend="orbax"``
        writes an Orbax checkpoint *directory* — the multi-host-safe
        format: sharded ``jax.Array`` leaves are written per-shard with
        no host gather, which is the right tool for mesh engines on
        real pods (npz would funnel the grid through host 0)."""
        if backend == "orbax":
            return self._save_orbax(path)
        if backend != "npz":
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        if isinstance(self.history, FastHistory):
            hist = dict(
                history_color=np.asarray(self.history.color),
                history_idx=np.asarray(self.history.hit_idx),
            )
        else:
            hist = dict(
                history_color=np.asarray(self.history.color),
                history_depth=np.asarray(self.history.depth),
            )
        np.savez_compressed(
            path,
            state=np.asarray(self.state),
            simulation_step=self.simulation_step,
            time_ms=self._time_ms,
            frame_duration=self._frame_duration,
            view_mat=self.camera.view_mat,
            prev_view_mat=self.camera.prev_view_mat,
            prev_proj_view=self.camera.prev_proj_view,
            config=json.dumps(dataclasses.asdict(self.config)),
            **hist,
        )

    def _checkpoint_tree(self):
        """Checkpoint pytree: device arrays stay device arrays (orbax
        writes shards in place); strings ride as uint8 arrays."""
        hist = self.history._asdict()
        return {
            "state": self.state,
            "history": dict(hist),
            "history_kind": np.frombuffer(
                type(self.history).__name__.encode(), np.uint8
            ).copy(),
            "camera": {
                "view_mat": np.asarray(self.camera.view_mat, np.float32),
                "prev_view_mat": np.asarray(
                    self.camera.prev_view_mat, np.float32
                ),
                "prev_proj_view": np.asarray(
                    self.camera.prev_proj_view, np.float32
                ),
            },
            "scalars": {
                "simulation_step": np.int64(self.simulation_step),
                "time_ms": np.float64(self._time_ms),
                "frame_duration": np.float64(self._frame_duration),
            },
            "config": np.frombuffer(
                json.dumps(dataclasses.asdict(self.config)).encode(),
                np.uint8,
            ).copy(),
        }

    def _save_orbax(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), self._checkpoint_tree())

    @classmethod
    def _load_orbax(cls, path: str) -> "Engine":
        import os

        import orbax.checkpoint as ocp

        data = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        cfg = EngineConfig(
            **json.loads(bytes(np.asarray(data["config"], np.uint8)).decode())
        )
        eng = cls(cfg)
        eng.state = jnp.asarray(data["state"])
        if eng.mesh is not None:
            from .parallel.sharded import shard_state

            eng.state = shard_state(eng.state, eng.mesh)
        sc = data["scalars"]
        eng.simulation_step = int(sc["simulation_step"])
        eng._time_ms = float(sc["time_ms"])
        eng._frame_duration = float(sc["frame_duration"])
        h = data["history"]
        kind = bytes(np.asarray(data["history_kind"], np.uint8)).decode()
        if kind == "FastHistory":
            eng.history = FastHistory(
                color=jnp.asarray(h["color"]).astype(jnp.float16),
                hit_idx=jnp.asarray(h["hit_idx"]),
            )
        else:
            eng.history = RenderHistory(
                color=jnp.asarray(h["color"]), depth=jnp.asarray(h["depth"])
            )
        if eng.mesh is not None:
            eng.history = eng._shard_history(eng.history)
        cam = data["camera"]
        eng.camera.view_mat = np.asarray(cam["view_mat"], np.float32)
        eng.camera.prev_view_mat = np.asarray(
            cam["prev_view_mat"], np.float32
        )
        eng.camera.prev_proj_view = np.asarray(
            cam["prev_proj_view"], np.float32
        )
        return eng

    @classmethod
    def load(cls, path: str) -> "Engine":
        import os

        if os.path.isdir(path):  # orbax checkpoints are directories
            return cls._load_orbax(path)
        data = np.load(path, allow_pickle=False)
        cfg = EngineConfig(**json.loads(str(data["config"])))
        eng = cls(cfg)
        eng.state = jnp.asarray(data["state"])
        if eng.mesh is not None:
            from .parallel.sharded import shard_state

            eng.state = shard_state(eng.state, eng.mesh)
        eng.simulation_step = int(data["simulation_step"])
        eng._time_ms = float(data["time_ms"])
        if "history_idx" in data:
            eng.history = FastHistory(
                color=jnp.asarray(data["history_color"]),
                hit_idx=jnp.asarray(data["history_idx"]),
            )
        else:
            eng.history = RenderHistory(
                color=jnp.asarray(data["history_color"]),
                depth=jnp.asarray(data["history_depth"]),
            )
        if eng.mesh is not None:
            eng.history = eng._shard_history(eng.history)
        eng.camera.view_mat = data["view_mat"].astype(np.float32)
        eng.camera.prev_view_mat = data["prev_view_mat"].astype(np.float32)
        # Older checkpoints predate these fields; keep their defaults then.
        if "prev_proj_view" in data:
            eng.camera.prev_proj_view = data["prev_proj_view"].astype(np.float32)
        if "frame_duration" in data:
            eng._frame_duration = float(data["frame_duration"])
        return eng


def _build_mesh_fused_loop(self, frames: int, steps_per_frame: int = 1):
    """Fused production loop INSIDE ``shard_map`` (config 5): ``frames``
    iterations of (sharded CA step with ICI halo exchange + row-sharded
    frame) chained in one on-device ``fori_loop`` — per-frame host
    dispatches (30-60 ms each on this transport) drop to one per loop.
    Static camera; history stays row-local (row0-offset temporal EMA,
    exactly the per-frame mesh render's semantics)."""
    import dataclasses as _dc

    from jax.sharding import PartitionSpec as P

    from .parallel.sharded import (
        AXIS,
        AXIS_Y,
        _local_step_binary,
        _local_step_multistate,
    )

    mesh = self.mesh
    ndev = mesh.devices.size
    two_d = AXIS_Y in mesh.axis_names
    my = mesh.shape[AXIS_Y] if two_d else 1
    s = self.render_static
    s_local = _dc.replace(s, height=s.height // ndev)
    multistate = self.spec.total_states > 2
    spec = self.spec
    h_local = s.height // ndev
    local_step = _local_step_multistate if multistate else _local_step_binary

    def local_loop(state_local, params, hcolor, hidx):
        zax = 2 if multistate else 1
        flat_idx = jax.lax.axis_index(AXIS)
        if two_d:
            flat_idx = flat_idx * my + jax.lax.axis_index(AXIS_Y)
        row0 = (flat_idx * h_local).astype(jnp.float32)
        zero_frame = jnp.zeros((h_local, s.width, 3), jnp.float32)

        def body(i, carry):
            st, hc, hi, _ = carry
            for _ in range(steps_per_frame):
                st = local_step(st, spec, two_d)
            gathered = st
            if two_d:
                gathered = jax.lax.all_gather(
                    gathered, AXIS_Y, axis=zax + 1, tiled=True
                )
            gathered = jax.lax.all_gather(gathered, AXIS, axis=zax, tiled=True)
            if multistate:
                vis = gathered[0]
                for b in range(1, gathered.shape[0]):
                    vis = vis | gathered[b]
                ages = gathered
            else:
                vis, ages = gathered, None
            frame, _, hist = render_frame_fast(
                s_local, vis, params, FastHistory(hc, hi), True,
                ages, spec.total_states, row0, s.height,
                i.astype(jnp.int32) if s.gi_temporal else None,
            )
            return st, hist.color, hist.hit_idx, frame

        return jax.lax.fori_loop(
            0, frames, body, (state_local, hcolor, hidx, zero_frame)
        )

    rows = (AXIS, AXIS_Y) if two_d else AXIS
    y = AXIS_Y if two_d else None
    state_spec = P(None, None, AXIS, y) if multistate else P(None, AXIS, y)
    sm = jax.shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(state_spec, P(), P(rows, None, None), P(rows, None)),
        out_specs=(
            state_spec, P(rows, None, None), P(rows, None),
            P(rows, None, None),
        ),
        # As in _build_mesh_render: pallas out_shapes carry no
        # varying-mesh-axes metadata; shardings are explicit.
        check_vma=False,
    )
    return jax.jit(sm)


Engine._build_mesh_fused_loop = _build_mesh_fused_loop


def _engine_run_fused(self, frames: int, steps_per_frame: int = 1):
    """Run (steps_per_frame CA steps + 1 frame) × frames fully on device
    (fast pipeline, static camera).  Returns the last frame.  Mesh
    engines run the loop inside ``shard_map`` (_build_mesh_fused_loop)."""
    if self.config.pipeline != "fast":
        raise ValueError("run_fused requires the fast pipeline")
    params = self.render_params()
    if self.mesh is not None:
        run = self._build_mesh_fused_loop(frames, steps_per_frame)
        self.state, hcolor, hidx, frame = run(
            self.state, params, self.history.color, self.history.hit_idx
        )
        self.history = FastHistory(color=hcolor, hit_idx=hidx)
    else:
        from .render.renderer_fast import make_fused_loop

        run = make_fused_loop(
            self.render_static, self.spec, frames, steps_per_frame
        )
        self.state, self.history, frame = run(
            self.state, params, self.history
        )
    self.simulation_step += frames * steps_per_frame
    self._time_ms += frames * 16.667
    self.camera.end_frame()
    return frame


Engine.run_fused = _engine_run_fused
