"""Golden-state tests for the dense oracle step (SURVEY.md §4: Conway's Life
on a z-slice, deterministic 3D growth, boundary-mode semantics)."""

import numpy as np

from cellularautomatons3d_tpu.models.automaton import AutomatonSpec
from cellularautomatons3d_tpu.ops.ca_reference import step_dense, run_dense
from cellularautomatons3d_tpu.utils.config import BoundaryMode

N = 32


def spec(**kw):
    kw.setdefault("grid_size", N)
    return AutomatonSpec.from_rule_strings(**kw)


def conway_spec(boundary=BoundaryMode.WRAP):
    # The commented-out reference default (main_pathtraced.js:126-128).
    return spec(neighbourhood="moore 2D", born="3", survive="2,3", boundary=boundary)


def put_2d(coords, z=5):
    g = np.zeros((N, N, N), dtype=np.uint8)
    for (x, y) in coords:
        g[z, y, x] = 1
    return g


def cells(g):
    return {tuple(int(v) for v in c) for c in np.argwhere(g)}


def test_blinker_oscillates():
    s = conway_spec()
    g0 = put_2d([(10, 10), (11, 10), (12, 10)])
    g1 = np.asarray(step_dense(g0, s))
    assert cells(g1) == {(5, 9, 11), (5, 10, 11), (5, 11, 11)}
    g2 = np.asarray(step_dense(g1, s))
    np.testing.assert_array_equal(g2, g0)


def test_block_still_life():
    s = conway_spec()
    g0 = put_2d([(4, 4), (5, 4), (4, 5), (5, 5)])
    g1 = np.asarray(step_dense(g0, s))
    np.testing.assert_array_equal(g1, g0)


def test_glider_translates():
    s = conway_spec()
    glider = [(1, 0), (2, 1), (0, 2), (1, 2), (2, 2)]
    g0 = put_2d([(x + 8, y + 8) for x, y in glider])
    g4 = np.asarray(run_dense(g0, s, 4))
    expected = put_2d([(x + 9, y + 9) for x, y in glider])
    np.testing.assert_array_equal(g4, expected)


def test_glider_wraps_torus():
    s = conway_spec(boundary=BoundaryMode.WRAP)
    glider = [(1, 0), (2, 1), (0, 2), (1, 2), (2, 2)]
    g0 = put_2d([(x + N - 4, y + N - 4) for x, y in glider])
    # 4*N/4... after 4N steps a glider returns to start on an N-torus.
    g = np.asarray(run_dense(g0, s, 4 * N))
    np.testing.assert_array_equal(g, g0)


def test_default_rule_first_step():
    # von Neumann B1,3 / S0-6 (main_pathtraced.js:123-125) from a center
    # seed: the seed survives (count 0 ∈ S) and its 6 face neighbours are
    # born (count 1 ∈ B) → 7 cells forming a plus.
    s = spec()
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    c = N // 2 - 1
    g0[c, c, c] = 1
    g1 = np.asarray(step_dense(g0, s))
    expect = {
        (c, c, c),
        (c, c, c - 1), (c, c, c + 1),
        (c, c - 1, c), (c, c + 1, c),
        (c - 1, c, c), (c + 1, c, c),
    }
    assert cells(g1) == expect


def test_growth_is_symmetric_and_deterministic():
    s = spec()
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    c = N // 2 - 1
    g0[c, c, c] = 1
    g5 = np.asarray(run_dense(g0, s, 5))
    g5b = np.asarray(run_dense(g0, s, 5))
    np.testing.assert_array_equal(g5, g5b)
    # Growth from a centered seed far from boundaries is mirror-symmetric
    # about the seed in x/y/z.
    sub = g5[c - 6 : c + 7, c - 6 : c + 7, c - 6 : c + 7]
    np.testing.assert_array_equal(sub, sub[::-1])
    np.testing.assert_array_equal(sub, sub[:, ::-1])
    np.testing.assert_array_equal(sub, sub[:, :, ::-1])
    assert g5.sum() > 7


def test_clamp_ref_one_sided_wrap():
    # compute_clustered.wgsl:104 quirk: neighbour coord N (from a +1 offset
    # at the far edge) wraps to 0; coord -1 contributes nothing.
    # B1 so any single neighbour births a cell.
    s = spec(born="1", survive="27", boundary=BoundaryMode.CLAMP_REF)
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    g0[3, 3, 0] = 1  # x = 0 (near edge in x)
    g1 = np.asarray(step_dense(g0, s))
    # Cell at x=N-1 has neighbour coord x=N → wraps → sees the x=0 cell.
    assert g1[3, 3, N - 1] == 1
    # Plain interior births on both sides in y/z and at x=1.
    assert g1[3, 3, 1] == 1 and g1[3, 2, 0] == 1 and g1[2, 3, 0] == 1
    # In CLAMP mode the far edge does NOT see it.
    s_cl = spec(born="1", survive="27", boundary=BoundaryMode.CLAMP)
    g1c = np.asarray(step_dense(g0, s_cl))
    assert g1c[3, 3, N - 1] == 0
    # In WRAP mode both... x=N-1 sees x=0 via its +1 neighbour too.
    s_w = spec(born="1", survive="27", boundary=BoundaryMode.WRAP)
    g1w = np.asarray(step_dense(g0, s_w))
    assert g1w[3, 3, N - 1] == 1


def test_clamp_ref_negative_side_excluded():
    s = spec(born="1", survive="27", boundary=BoundaryMode.CLAMP_REF)
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    g0[3, 3, N - 1] = 1  # far x edge
    g1 = np.asarray(step_dense(g0, s))
    # x=0's -1 neighbour is x=-1: excluded → x=0 NOT born from this cell...
    # but x = N-1 + 1 = N is the +1 neighbour *of the far cell's neighbour
    # coords*: cell x=0 checks its -1 offset (→ -1, excluded) and nothing
    # else reaches it.  Under WRAP x=0 would be born.
    assert g1[3, 3, 0] == 0
    s_w = spec(born="1", survive="27", boundary=BoundaryMode.WRAP)
    assert np.asarray(step_dense(g0, s_w))[3, 3, 0] == 1


def test_mixed_neighbourhood_groups():
    # Edges-group birth: a cell with exactly 2 live edge-neighbours is born
    # even though the main group says nothing (compute_clustered.wgsl:224-232).
    s = spec(
        neighbourhood="von neumann",
        born="27", survive="27",
        born_edges="2", survive_edges="27",
        born_corners="27", survive_corners="27",
    )
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    # Two edge neighbours of (5,5,5): offsets (1,1,0) and (-1,1,0).
    g0[5, 6, 6] = 1  # (x=6, y=6, z=5)
    g0[5, 6, 4] = 1  # (x=4, y=6, z=5)
    g1 = np.asarray(step_dense(g0, s))
    assert g1[5, 5, 5] == 1


def test_multistate_generations_decay():
    # S=4: alive cell that fails survive decays 1→2→3→0.
    s = spec(born="27", survive="27", total_states=4, neighbourhood="moore")
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    g0[5, 5, 5] = 1
    g1 = np.asarray(step_dense(g0, s))
    assert g1[5, 5, 5] == 2 and g1.sum() == 2
    g2 = np.asarray(step_dense(g1, s))
    assert g2[5, 5, 5] == 3
    g3 = np.asarray(step_dense(g2, s))
    assert g3[5, 5, 5] == 0 and g3.sum() == 0


def test_multistate_dying_cells_not_counted_and_not_born():
    # A dying (age 2) cell neither counts as a neighbour nor can be re-born.
    s = spec(born="1", survive="0-6", total_states=3)
    g0 = np.zeros((N, N, N), dtype=np.uint8)
    g0[5, 5, 5] = 2  # dying
    g0[9, 9, 9] = 1  # isolated alive (count 0 → survives S0-6)
    g1 = np.asarray(step_dense(g0, s))
    assert g1[5, 5, 5] == 0  # aged out (S=3)
    # Neighbours of the dying cell must NOT be born (it doesn't count).
    assert g1[5, 5, 4] == 0 and g1[5, 4, 5] == 0
    assert g1[9, 9, 9] == 1
    # Neighbours of the alive cell are born (count 1).
    assert g1[9, 9, 8] == 1
