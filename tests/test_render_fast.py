"""Fast Pallas renderer vs a per-pixel numpy DDA oracle (interpret mode).

The oracle mirrors the kernel's specification exactly: z-plane DDA with
segment-midpoint cell probes, reference visible-cube accept rules and snap.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.occupancy import coarse_occupancy
from cellularautomatons3d_tpu.render.render_fast import (
    raytrace_tiles,
    pack_cam,
    COT_HALF_FOV,
)
from cellularautomatons3d_tpu.utils import mat4

N = 64
W_IMG, H_IMG = 128, 64  # 8192 px = 8 tiles


def prep(dense):
    packed = jnp.asarray(ca.pack_grid(dense))  # [W, Z, Y]
    return packed, coarse_occupancy(packed)


def default_cam(**kw):
    view = kw.pop("view", mat4.initial_view_matrix())
    args = dict(
        width=W_IMG, height=H_IMG,
        light_pos=(0.721, 1.0, 1.0), light_magnitude=5.0,
        cell_size=0.85, roughness=0.29,
        base_reflectivity=(0.17, 0.17, 0.17), material_color=(0.0, 0.0, 0.0),
    )
    args.update(kw)
    return jnp.asarray(pack_cam(view, **args)), view


def trace(dense, shadow=False, **kw):
    vol, coarse = prep(dense)
    cam, view = default_cam(**kw)
    return raytrace_tiles(
        vol, coarse, cam, grid_size=N, width=W_IMG, height=H_IMG,
        shadow=shadow, interpret=True,
    )


# ---------------------------------------------------------------- oracle --


def oracle_dda(dense, view, cell_mul=0.85, h=None, w=None):
    """Per-pixel numpy DDA following the kernel spec (primary rays)."""
    h = H_IMG if h is None else h
    w = W_IMG if w is None else w
    n = dense.shape[0]
    rot = view[:3, :3]
    o = view[:3, 3].astype(np.float64)
    depth = np.zeros((h, w), np.float32)
    idx = np.full((h, w), -1, np.int32)
    half = 0.5
    cell_half = cell_mul / n * 0.5
    for py in range(h):
        for px in range(w):
            ux = (px + 0.5) / w
            uy = 1.0 - (py + 0.5) / h
            r = np.array([(ux - 0.5) * (w / h), uy - 0.5, -0.5 * COT_HALF_FOV])
            r /= np.linalg.norm(r)
            d = rot @ r
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (-half - o) / d
                t2 = (half - o) / d
            tn = np.minimum(t1, t2).max()
            tf = np.maximum(t1, t2).min()
            if not (tn <= tf and tf >= 0):
                continue
            t_start = max(tn, 0.0)
            ks = range(n) if d[2] > 0 else range(n - 1, -1, -1)
            hit = False
            for k in ks:
                with np.errstate(divide="ignore", invalid="ignore"):
                    ta = (k / n - half - o[2]) / d[2]
                    tb = ((k + 1) / n - half - o[2]) / d[2]
                lo = max(min(ta, tb), t_start)
                hi = min(max(ta, tb), tf)
                if not lo < hi:
                    continue
                tm = 0.5 * (lo + hi)
                cx = int(np.clip(np.floor((o[0] + tm * d[0] + half) * n), 0, n - 1))
                cy = int(np.clip(np.floor((o[1] + tm * d[1] + half) * n), 0, n - 1))
                if not dense[k, cy, cx]:
                    continue
                cc = (np.array([cx, cy, k]) + 0.5) / n - half
                with np.errstate(divide="ignore", invalid="ignore"):
                    a = (cc - cell_half - o) / d
                    b = (cc + cell_half - o) / d
                tnn = np.minimum(a, b).max()
                tff = np.maximum(a, b).min()
                if tnn <= tff and tff >= t_start:
                    depth[py, px] = tnn
                    idx[py, px] = cx + cy * n + k * n * n
                    hit = True
                    break
            if not hit:
                depth[py, px] = tf
    return depth, idx


@pytest.mark.heavy
def test_fast_single_cell_matches_oracle():
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 30, 31] = 1
    rgb, depth, idx = trace(dense)
    o_depth, o_idx = oracle_dda(dense, mat4.initial_view_matrix())
    np.testing.assert_array_equal(np.asarray(idx), o_idx)
    np.testing.assert_allclose(np.asarray(depth), o_depth, atol=2e-5)
    assert (np.asarray(idx) >= 0).sum() > 0  # the cell is visible


@pytest.mark.heavy
def test_fast_block_matches_oracle():
    dense = np.zeros((N, N, N), np.uint8)
    dense[24:40, 24:40, 24:40] = 1
    rgb, depth, idx = trace(dense)
    o_depth, o_idx = oracle_dda(dense, mat4.initial_view_matrix())
    np.testing.assert_array_equal(np.asarray(idx), o_idx)
    np.testing.assert_allclose(np.asarray(depth), o_depth, atol=2e-5)


@pytest.mark.parametrize("seed,density", [(5, 0.02), (7, 0.001), (11, 0.15)])
@pytest.mark.heavy
def test_fast_random_scene_matches_oracle_exactly(seed, density):
    """Randomized scenes must match the oracle on every pixel: the dilated
    column probe + steep-ray force-descend make the skip hierarchy
    conservative-exact (round-1 tolerated a 0.5% diagonal-block miss)."""
    rng = np.random.default_rng(seed)
    dense = (rng.random((N, N, N)) < density).astype(np.uint8)
    rgb, depth, idx = trace(dense)
    o_depth, o_idx = oracle_dda(dense, mat4.initial_view_matrix())
    np.testing.assert_array_equal(np.asarray(idx), o_idx)


@pytest.mark.parametrize("toggle", ["CA3D_MIP1", "CA3D_SLICEGATE"])
@pytest.mark.heavy
def test_fast_perf_toggles_match_oracle_exactly(monkeypatch, toggle):
    """The opt-in perf levers (plane-mip prefilter, slice-gated fetches)
    must stay conservative-exact: same oracle equality as the default
    path.  Both default OFF (measured net-negative / unproven on HW).
    The mip1 case runs at N=32 — its interpret-mode graph (8 plane-mip
    probes + 8 gated probes per descended column) takes ~7 min at N=64."""
    monkeypatch.setenv(toggle, "1")
    rng = np.random.default_rng(5)
    if toggle == "CA3D_MIP1":
        n, w_img, h_img = 32, 64, 32
        dense = (rng.random((n, n, n)) < 0.06).astype(np.uint8)
        vol, coarse = prep(dense)
        cam, view = default_cam(width=w_img, height=h_img)
        rgb, depth, idx = raytrace_tiles(
            vol, coarse, cam, grid_size=n, width=w_img, height=h_img,
            shadow=False, interpret=True,
        )
        o_depth, o_idx = oracle_dda(dense, view, h=h_img, w=w_img)
    else:
        dense = (rng.random((N, N, N)) < 0.02).astype(np.uint8)
        rgb, depth, idx = trace(dense)
        o_depth, o_idx = oracle_dda(dense, mat4.initial_view_matrix())
    np.testing.assert_array_equal(np.asarray(idx), o_idx)


@pytest.mark.parametrize("angle", [0.35, 1.1, 1.45])
@pytest.mark.heavy
def test_fast_random_scene_rotated_exact(angle):
    """Oblique and near-side-on cameras exercise the steep-ray paths
    (|dxy/dz| > 1 skips the supercolumn gate; > 2 forces fine descent)."""
    rng = np.random.default_rng(3)
    dense = (rng.random((N, N, N)) < 0.03).astype(np.uint8)
    view = mat4.rotate(mat4.initial_view_matrix(), (0, 1, 0), angle)
    view = mat4.translate(view, (0, 0, 0.2))
    rgb, depth, idx = trace(dense, view=view)
    o_depth, o_idx = oracle_dda(dense, view)
    np.testing.assert_array_equal(np.asarray(idx), o_idx)


@pytest.mark.heavy
def test_fast_rotated_camera_negative_dz():
    # Camera on the other side looking +z exercises the second sweep pass.
    view = mat4.rotate(mat4.initial_view_matrix(), (0, 1, 0), np.pi)
    # After rotating in place the camera still sits at +z; move it past the
    # volume so it looks back at it.
    view = mat4.translate(view, (0, 0, 1.6))
    dense = np.zeros((N, N, N), np.uint8)
    dense[24:40, 24:40, 24:40] = 1
    rgb, depth, idx = trace(dense, view=view)
    o_depth, o_idx = oracle_dda(dense, view)
    np.testing.assert_array_equal(np.asarray(idx), o_idx)
    np.testing.assert_allclose(np.asarray(depth), o_depth, atol=2e-5)


def test_fast_color_matches_exact_renderer_brdf():
    """Unshadowed single-cell scene: the fast kernel's lit color must equal
    the exact renderer's lighting at the same snapped point."""
    from cellularautomatons3d_tpu.render import brdf
    from cellularautomatons3d_tpu.render.intersect import cell_from_sample_point

    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 31, 31] = 1
    rgb, depth, idx = trace(dense, shadow=False)
    rgb = np.asarray(rgb)
    idx = np.asarray(idx)
    ys, xs = np.nonzero(idx >= 0)
    assert len(ys) > 0
    view = mat4.initial_view_matrix()
    cam_pos = view[:3, 3]
    for py, px in list(zip(ys, xs))[:5]:
        ux = (px + 0.5) / W_IMG
        uy = 1.0 - (py + 0.5) / H_IMG
        r = np.array([(ux - 0.5) * (W_IMG / H_IMG), uy - 0.5, -0.5 * COT_HALF_FOV])
        r /= np.linalg.norm(r)
        d = view[:3, :3] @ r
        p = cam_pos + d * np.asarray(depth)[py, px]
        coords, origin, _ = cell_from_sample_point(jnp.asarray(p, jnp.float32), N)
        want = brdf.calculate_lighting_at(
            jnp.asarray(p, jnp.float32),
            origin,
            coords,
            jnp.asarray(cam_pos),
            jnp.full((3,), 5.0, jnp.float32),
            jnp.asarray([0.721, 1.0, 1.0], jnp.float32),
            grid_size=N,
            roughness=jnp.float32(0.29),
            material_color=jnp.zeros((3,), jnp.float32),
            base_reflectivity=jnp.full((3,), 0.17, jnp.float32),
        )
        np.testing.assert_allclose(rgb[py, px], np.asarray(want), rtol=2e-3, atol=2e-4)


@pytest.mark.heavy
def test_fast_shadowing():
    # A wall between the light and a target cell: the target is occluded.
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 31, 31] = 1          # target cell (visible from camera at +z)
    dense[44:47, 34:46, 28:42] = 1  # slab above/behind toward the light
    rgb_s, depth, idx = trace(dense, shadow=True)
    rgb_n, _, _ = trace(dense, shadow=False)
    rgb_s, rgb_n, idx = np.asarray(rgb_s), np.asarray(rgb_n), np.asarray(idx)
    target_idx = 31 + 31 * N + 40 * N * N
    mask = idx == target_idx
    assert mask.sum() > 0
    ratio = rgb_s[mask].sum() / max(rgb_n[mask].sum(), 1e-9)
    assert ratio < 0.05  # occlusion factor 0.0095 applied


def shaded(dense, cam, **static_kw):
    """trace_shaded over a scene: the full extended-lighting composition.

    Runs under ``disable_jit`` so each interpreted kernel compiles as its
    own bounded module: one-module trace_shaded compiles of this size
    crash the CPU XLA compiler NONDETERMINISTICALLY (observed at
    different tests across identical-code suite runs — a stack-limit
    -adjacent recursive pass).  TPU is unaffected (per-kernel Mosaic
    compiles); the jitted composition is exercised on-chip by
    tests/test_tpu_kernel.py."""
    import jax

    from cellularautomatons3d_tpu.render import renderer as R
    from cellularautomatons3d_tpu.render.renderer_fast import trace_shaded

    s = R.RenderStatic(
        width=W_IMG, height=H_IMG, grid_size=N, depth_samples=8,
        shadow_samples=8, **static_kw,
    )
    vol, _ = prep(dense)
    with jax.disable_jit():
        return trace_shaded(s, vol, cam, None, 2, True)


@pytest.mark.heavy
def test_fast_emissive_adds_unshadowed_radiance():
    """Emissive cells add their own radiance after shadowing
    (renderer.py:263-264): delta = emissive_color * strength on hits."""
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 28:34, 28:34] = 1
    cam_plain, _ = default_cam()
    cam_emis, _ = default_cam(
        emissive_color=(0.1, 0.2, 0.3), emissive_strength=0.5
    )
    rgb0, _, idx = shaded(dense, cam_plain)
    rgb1, _, _ = shaded(dense, cam_emis)
    hit = np.asarray(idx) >= 0
    delta = np.asarray(rgb1)[hit] - np.asarray(rgb0)[hit]
    np.testing.assert_allclose(
        delta, np.broadcast_to([0.05, 0.1, 0.15], delta.shape), atol=1e-5
    )
    assert (np.asarray(rgb1)[~hit] == np.asarray(rgb0)[~hit]).all()


@pytest.mark.heavy
def test_fast_soft_shadows_penumbra():
    """A finite light radius + multiple jittered occlusion passes produce
    partial occlusion (between the hard-shadow quotient and 1) somewhere
    (renderer.py:212-224)."""
    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 24:40, 24:40] = 1       # wall facing the camera
    dense[44:46, 34:44, 30:34] = 1    # small occluder toward the light
    vol, coarse = prep(dense)
    kw = dict(grid_size=N, width=W_IMG, height=H_IMG, interpret=True)
    cam_hard, _ = default_cam()
    rgb_n, _, idx = raytrace_tiles(vol, coarse, cam_hard, shadow=False, **kw)
    cam_soft, _ = default_cam(light_radius=0.25, elapsed_time=0.3)
    rgb_s, _, _ = shaded(dense, cam_soft, soft_shadow_samples=8)
    rgb_n, rgb_s = map(np.asarray, (rgb_n, rgb_s))
    hit = (np.asarray(idx) >= 0) & (rgb_n.sum(-1) > 1e-3)
    # soft stays within [hard-shadowed, unshadowed] bounds...
    assert (rgb_s[hit] <= rgb_n[hit] + 1e-4).all()
    # ...and some pixels are genuinely penumbral (not 1.0, not 0.0095).
    ratio = rgb_s.sum(-1)[hit] / np.maximum(rgb_n.sum(-1)[hit], 1e-9)
    assert ((ratio > 0.05) & (ratio < 0.95)).any(), "no penumbra found"


@pytest.mark.heavy
def test_fast_indirect_matches_exact_renderer():
    """GI parity: on an unshadowed 2-cell scene the decomposed GI path's
    output must equal the exact pipeline's direct + _indirect_lighting +
    emissive at the same snapped hit point."""
    from cellularautomatons3d_tpu.render import brdf
    from cellularautomatons3d_tpu.render import renderer as R
    from cellularautomatons3d_tpu.render.renderer import _indirect_lighting
    from cellularautomatons3d_tpu.render.intersect import cell_from_sample_point

    dense = np.zeros((N, N, N), np.uint8)
    dense[40, 31, 31] = 1   # target (z=40, y=31, x=31), camera looks at +z face
    dense[41, 31, 32] = 1   # face-5 slot neighbour (+1, 0, +1)
    emis_c = (0.02, 0.03, 0.04)
    emis_s = 0.5
    cam, view = default_cam(emissive_color=emis_c, emissive_strength=emis_s)
    rgb, depth, idx = shaded(dense, cam, indirect_lighting=True)
    rgb, depth, idx = map(np.asarray, (rgb, depth, idx))
    vol, coarse = prep(dense)
    target = 31 + 31 * N + 40 * N * N
    ys, xs = np.nonzero(idx == target)
    assert len(ys) > 0

    packed_flat = jnp.asarray(vol).reshape(-1)
    params = R.RenderParams(
        view_mat=jnp.asarray(view),
        prev_view_mat=jnp.asarray(view),
        prev_proj_view=jnp.eye(4, dtype=jnp.float32),
        elapsed_time=jnp.float32(0.0),
        cell_size=jnp.float32(0.85),
        temporal_alpha=jnp.float32(0.1),
        gamma=jnp.float32(2.0),
        roughness=jnp.float32(0.29),
        base_reflectivity=jnp.full((3,), 0.17, jnp.float32),
        material_color=jnp.zeros((3,), jnp.float32),
        light_pos=jnp.asarray([0.721, 1.0, 1.0], jnp.float32),
        light_magnitude=jnp.float32(5.0),
        show_depth_overlay=jnp.float32(0.0),
        emissive_color=jnp.asarray(emis_c, jnp.float32),
        emissive_strength=jnp.float32(emis_s),
    )
    s = R.RenderStatic(
        width=W_IMG, height=H_IMG, grid_size=N,
        depth_samples=8, shadow_samples=8, indirect_lighting=True,
    )
    cam_pos = view[:3, 3]
    checked = 0
    for py, px in list(zip(ys, xs))[:4]:
        ux = (px + 0.5) / W_IMG
        uy = 1.0 - (py + 0.5) / H_IMG
        r = np.array([(ux - 0.5) * (W_IMG / H_IMG), uy - 0.5, -0.5 * COT_HALF_FOV])
        r /= np.linalg.norm(r)
        d = view[:3, :3] @ r
        p = jnp.asarray(cam_pos + d * depth[py, px], jnp.float32)
        coords, origin, _ = cell_from_sample_point(p, N)
        direct = brdf.calculate_lighting_at(
            p, origin, coords, jnp.asarray(cam_pos),
            jnp.full((3,), 5.0, jnp.float32), params.light_pos,
            grid_size=N, roughness=params.roughness,
            material_color=params.material_color,
            base_reflectivity=params.base_reflectivity,
        )
        uv = jnp.asarray([ux, uy], jnp.float32)
        gi = _indirect_lighting(
            packed_flat, p, origin, coords, uv, jnp.float32(0.0),
            params, s, jnp.asarray(True),
        )
        want = (
            np.asarray(direct)
            + np.asarray(gi)
            + np.asarray(emis_c) * emis_s
        )
        np.testing.assert_allclose(rgb[py, px], want, rtol=5e-3, atol=5e-4)
        checked += 1
    assert checked > 0


@pytest.mark.heavy
def test_fast_two_bounce_matches_exact_renderer():
    """Multi-bounce GI parity (BASELINE config 4 "multi-bounce"): with
    bounces=2 the decomposed occlusion/neighbour-mask path must equal the
    exact pipeline's recursive _indirect_lighting at the hit point, and
    must differ from one bounce (the target→neighbour→target path adds
    radiance).

    Runs the decomposition directly (primary trace + hit_geometry +
    indirect_bounce) on a 32³ grid and 64×32 window: the full-frame
    two-bounce jit in interpret mode inlines ~21 unrolled kernels whose
    HLO chain depth crashes the CPU XLA compiler (stack overflow in a
    recursive pass) — a CPU-test-harness limit, not a TPU one (on TPU
    each kernel is a separate Mosaic compile)."""
    from cellularautomatons3d_tpu.render import brdf
    from cellularautomatons3d_tpu.render import renderer as R
    from cellularautomatons3d_tpu.render.renderer import _indirect_lighting
    from cellularautomatons3d_tpu.render.intersect import cell_from_sample_point
    from cellularautomatons3d_tpu.render.render_slab import (
        hit_geometry,
        indirect_bounce,
        prep_slabs,
    )

    n = 32
    w_img, h_img = 64, 32
    dense = np.zeros((n, n, n), np.uint8)
    dense[20, 15, 15] = 1   # target; camera sees its +z face
    dense[21, 15, 16] = 1   # bounce-1 neighbour; its -x slots include the target
    view = mat4.initial_view_matrix()
    vol = jnp.asarray(ca.pack_grid(dense))
    cam = jnp.asarray(pack_cam(
        view, width=w_img, height=h_img,
        light_pos=(0.721, 1.0, 1.0), light_magnitude=5.0,
        cell_size=0.85, roughness=0.29,
        base_reflectivity=(0.17, 0.17, 0.17), material_color=(0.0, 0.0, 0.0),
    ))
    _, depth, idx = raytrace_tiles(
        vol, coarse_occupancy(vol), cam, grid_size=n, width=w_img,
        height=h_img, shadow=False, interpret=True,
    )
    q, origin, coords, found, _ = hit_geometry(
        cam, idx, depth, grid_size=n, width=w_img, height=h_img
    )
    prepped = prep_slabs(vol, [(0, n)], n)
    kw = dict(grid_size=n, width=w_img, height=h_img, interpret=True)
    gi1 = np.asarray(indirect_bounce(
        vol, cam, q, origin, coords, found, prepped, bounces=1, **kw))
    gi2 = np.asarray(indirect_bounce(
        vol, cam, q, origin, coords, found, prepped, bounces=2, **kw))
    depth, idx = np.asarray(depth), np.asarray(idx)
    target = 15 + 15 * n + 20 * n * n
    ys, xs = np.nonzero(idx == target)
    assert len(ys) > 0
    # The second bounce adds radiance on the target's visible face.
    assert np.abs(gi2[ys, xs] - gi1[ys, xs]).max() > 1e-6

    packed_flat = vol.reshape(-1)
    params = R.RenderParams(
        view_mat=jnp.asarray(view),
        prev_view_mat=jnp.asarray(view),
        prev_proj_view=jnp.eye(4, dtype=jnp.float32),
        elapsed_time=jnp.float32(0.0),
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
    s = R.RenderStatic(
        width=w_img, height=h_img, grid_size=n,
        depth_samples=8, shadow_samples=8, indirect_lighting=True,
        indirect_bounces=2,
    )
    cam_pos = view[:3, 3]
    checked = 0
    for py, px in list(zip(ys, xs))[:3]:
        ux = (px + 0.5) / w_img
        uy = 1.0 - (py + 0.5) / h_img
        r = np.array([(ux - 0.5) * (w_img / h_img), uy - 0.5, -0.5 * COT_HALF_FOV])
        r /= np.linalg.norm(r)
        d = view[:3, :3] @ r
        p = jnp.asarray(cam_pos + d * depth[py, px], jnp.float32)
        coords_1, origin_1, _ = cell_from_sample_point(p, n)
        uv = jnp.asarray([ux, uy], jnp.float32)
        gi = _indirect_lighting(
            packed_flat, p, origin_1, coords_1, uv, jnp.float32(0.0),
            params, s, jnp.asarray(True),
        )
        np.testing.assert_allclose(
            gi2[py, px], np.asarray(gi), rtol=5e-3, atol=5e-4
        )
        checked += 1
    assert checked > 0


def test_fast_empty_grid_black():
    dense = np.zeros((N, N, N), np.uint8)
    rgb, depth, idx = trace(dense)
    assert np.asarray(rgb).max() == 0.0
    assert (np.asarray(idx) == -1).all()
    # Depth = distance to volume exit for rays that crossed the volume.
    assert np.asarray(depth).max() > 0.5


@pytest.mark.heavy
def test_fast_age_coloring():
    """Multi-state ages fade the fast-path color like the exact renderer."""
    dense_alive = np.zeros((N, N, N), np.uint8)
    dense_alive[40, 28:36, 28:36] = 1      # age-1 wall
    dense_dying = dense_alive * 6          # same wall at age 6 of 8

    def render(dense):
        packed_planes = np.stack(
            [ca.pack_grid((dense >> i) & 1) for i in range(3)]
        )
        ages = jnp.asarray(packed_planes)
        vis = ages[0] | ages[1] | ages[2]
        cam, _ = default_cam()
        return np.asarray(raytrace_tiles(
            vis, coarse_occupancy(vis), cam, ages,
            grid_size=N, width=W_IMG, height=H_IMG,
            shadow=False, interpret=True, total_states=8,
        )[0])

    bright = render(dense_alive)
    dim = render(dense_dying)
    assert bright.max() > 0
    # age 6 of 8 → fade (8-6)/7 ≈ 0.286
    hit = bright.sum(-1) > 0
    ratio = dim[hit].sum() / bright[hit].sum()
    assert 0.2 < ratio < 0.4, ratio
