"""Multi-x-group coarse occupancy layouts (grids > 256) and the 288-480
partial-group case.

Round-2 regression (ADVICE r2, high): grids 288-480 (packed word count
9-15, neither ≤ 8 nor a multiple of 8) crashed `coarse_occupancy`; and the
multi-x-group code paths that 512³ exercises — group assembly
(ops/occupancy.py), `dilate_occupancy`'s cross-group carries and
`fetch_coarse_bit`'s nbk > 32 branch (render_fast.py) — had no coverage.
These tests run the real layouts at N=320 with a tiny window.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cellularautomatons3d_tpu as ca
from cellularautomatons3d_tpu.ops.occupancy import (
    BLOCK,
    coarse_occupancy,
    dilate_occupancy,
)
from cellularautomatons3d_tpu.ops.packing import pack_grid
from cellularautomatons3d_tpu.render.render_fast import COT_HALF_FOV, pack_cam
from cellularautomatons3d_tpu.render.render_slab import raytrace_sliced
from cellularautomatons3d_tpu.utils import mat4


def dense_occupancy(dense):
    z, y, x = dense.shape
    b = dense.reshape(z // BLOCK, BLOCK, y // BLOCK, BLOCK, x // BLOCK, BLOCK)
    return b.any(axis=(1, 3, 5))  # [Zc, Yc, Xc] bool


def unpack_groups(coarse, yc):
    """[Zc, XG·Yc] u32 → [Zc, Yc, XG·32] bool (group-major x-blocks)."""
    zc, ytot = coarse.shape
    xg = ytot // yc
    g = np.asarray(coarse).reshape(zc, xg, yc)
    bits = (g[..., None] >> np.arange(32, dtype=np.uint32)) & 1
    # [Zc, XG, Yc, 32] → [Zc, Yc, XG·32]
    return bits.astype(bool).transpose(0, 2, 1, 3).reshape(zc, yc, xg * 32)


@pytest.mark.parametrize("n", [320, 512])
def test_coarse_occupancy_multigroup(n):
    rng = np.random.default_rng(1)
    dense = (rng.random((n, n, n)) < 0.0005).astype(np.uint8)
    dense[0, 0, n - 1] = 1  # last x-block: partial-group high word at 320
    coarse = coarse_occupancy(jnp.asarray(pack_grid(dense)))
    yc = n // BLOCK
    got = unpack_groups(coarse, yc)[:, :, : n // BLOCK]
    np.testing.assert_array_equal(got, dense_occupancy(dense))


def test_coarse_occupancy_320_no_crash():
    """The exact ADVICE r2 repro: a multiple-of-32 grid in 288-480."""
    packed = jnp.zeros((320 // 32, 320, 320), jnp.uint32)
    out = coarse_occupancy(packed)
    assert out.shape == (40, 2 * 40)  # XG=2 (partial second group)


@pytest.mark.parametrize("n", [320, 512])
def test_dilate_occupancy_cross_group_carries(n):
    """x-dilation must carry across the 32-block group-word boundary."""
    rng = np.random.default_rng(2)
    dense = np.zeros((n, n, n), np.uint8)
    # Live cells straddling the group boundary (x-blocks 31 and 32) plus
    # random fill.
    dense[8, 8, 31 * 8] = 1
    dense[64, 64, 32 * 8] = 1
    dense |= (rng.random((n, n, n)) < 0.0002).astype(np.uint8)
    yc = n // BLOCK
    coarse = coarse_occupancy(jnp.asarray(pack_grid(dense)))
    occ = dense_occupancy(dense)  # [Zc, Yc, Xc]

    for dz, dy in ((True, True), (False, False)):
        dil = dilate_occupancy(coarse, dilate_z=dz, yc=yc, dilate_y=dy)
        got = unpack_groups(dil, yc)[:, :, : n // BLOCK]
        # Exact (clipped) box dilation oracle; axis order is irrelevant.
        want = occ.copy()
        want[:, :, 1:] |= occ[:, :, :-1]
        want[:, :, :-1] |= occ[:, :, 1:]
        if dy:
            w2 = want.copy()
            want[:, 1:] |= w2[:, :-1]
            want[:, :-1] |= w2[:, 1:]
        if dz:
            w3 = want.copy()
            want[1:] |= w3[:-1]
            want[:-1] |= w3[1:]
        # The implementation wraps at z/y edges (documented conservative);
        # the interior must be exact — including the cross-group x carries.
        np.testing.assert_array_equal(
            got[1:-1, 1:-1, :], want[1:-1, 1:-1, :]
        )
        # Everywhere: never misses occupancy (conservativeness).
        assert not (~got & want).any()


# ------------------------------------------------------------- render 320 --

N320 = 320
W_IMG, H_IMG = 64, 32


def oracle_dda(dense, view, n, w, h, cell_mul=0.85):
    """Per-pixel numpy DDA following the kernel spec (primary rays)."""
    rot = view[:3, :3]
    o = view[:3, 3].astype(np.float64)
    depth = np.zeros((h, w), np.float32)
    idx = np.full((h, w), -1, np.int64)
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


def test_sliced_320_matches_oracle():
    """End-to-end N=320 sliced render (interpret): exercises the partial
    second x-group, fetch_coarse_bit's nbk > 32 lane layout, y_chunks = 3
    (ceil(320/128)) and multi-slab compositing — the exact code paths 512³
    uses, at the smallest grid that needs them."""
    rng = np.random.default_rng(17)
    dense = np.zeros((N320, N320, N320), np.uint8)
    # A handful of cells spread over x-groups (incl. the partial group and
    # y beyond 256 → third y-chunk) plus a visible center block.
    dense[150:170, 150:170, 150:170] = 1
    dense[160, 160, 290] = 1
    dense[160, 290, 160] = 1
    pts = (rng.random((40, 3)) * N320).astype(int)
    for z, y, x in pts:
        dense[z, y, x] = 1
    vol = jnp.asarray(pack_grid(dense))
    cam = jnp.asarray(
        pack_cam(
            mat4.initial_view_matrix(), W_IMG, H_IMG,
            (0.721, 1.0, 1.0), 5.0, 0.85, 0.29, (0.17,) * 3, (0.0,) * 3,
        )
    )
    rgb, depth, idx = raytrace_sliced(
        vol, cam, grid_size=N320, width=W_IMG, height=H_IMG,
        shadow=False, interpret=True, slab_planes=160,
    )
    # int64 oracle ids: 320³ < 2³¹ so int32 kernel ids are safe
    o_depth, o_idx = oracle_dda(
        dense, mat4.initial_view_matrix(), N320, W_IMG, H_IMG
    )
    np.testing.assert_array_equal(np.asarray(idx).astype(np.int64), o_idx)
    np.testing.assert_allclose(np.asarray(depth), o_depth, atol=2e-5)
    assert (np.asarray(idx) >= 0).sum() > 0


def test_engine_config_320_keeps_fast_pipeline():
    cfg = ca.EngineConfig(grid_size=320)
    assert cfg.pipeline == "fast"
