"""Rule-string parsing and LUT packing vs the reference's rule compiler
(main_pathtraced.js:554-622)."""

import numpy as np

from cellularautomatons3d_tpu.models.rules import (
    RuleSet,
    parse_rule_string,
    counts_to_mask,
    mask_to_counts,
)


def test_simple_list():
    assert parse_rule_string("1,3") == [1, 3]


def test_range():
    assert parse_rule_string("0-6") == [0, 1, 2, 3, 4, 5, 6]


def test_mixed_list_and_range():
    assert parse_rule_string("0-6,9") == [0, 1, 2, 3, 4, 5, 6, 9]
    assert parse_rule_string("1,2-5,7") == [1, 2, 3, 4, 5, 7]


def test_clamp_to_26():
    # "27" clamps to 26 (main_pathtraced.js:569-575) — the disabled-group
    # sentinel used by the default edges/corners rules.
    assert parse_rule_string("27") == [26]
    assert parse_rule_string("30,99") == [26, 26]
    # Ranges clamp per emitted value.
    assert parse_rule_string("25-28") == [25, 26, 26, 26]


def test_whitespace_stripped():
    assert parse_rule_string(" 1 , 3 ") == [1, 3]
    assert parse_rule_string("0 - 3") == [0, 1, 2, 3]


def test_unparsable_components_skipped():
    # parseInt("") is NaN → NaN index write is a typed-array no-op.
    assert parse_rule_string("") == []
    assert parse_rule_string("a,3") == [3]
    assert parse_rule_string("1,,3") == [1, 3]
    # A leading '-' makes range mode with a NaN start → empty.
    assert parse_rule_string("-5") == []
    assert parse_rule_string("3-") == []


def test_js_parseint_prefix():
    # parseInt takes the leading integer prefix: "3x" → 3.
    assert parse_rule_string("3x") == [3]


def test_lut_arrays_layout():
    rs = RuleSet.from_strings(born="1,3", survive="0-6")
    born, survive = rs.lut_arrays()
    assert born.shape == (81,) and born.dtype == np.uint32
    # Main group at offset 0.
    assert born[1] == 1 and born[3] == 1 and born[0] == 0 and born[4] == 0
    assert survive[:7].tolist() == [1] * 7 and survive[7] == 0
    # Default edges/corners groups: "27"→26 at offsets 27/54
    # (main_pathtraced.js:129-132,155-159).
    assert born[27 + 26] == 1 and born[54 + 26] == 1
    assert survive[27 + 26] == 1 and survive[54 + 26] == 1
    assert born[27:53].sum() == 0 and born[54:80].sum() == 0


def test_masks_roundtrip():
    m = counts_to_mask([0, 3, 26])
    assert mask_to_counts(m) == (0, 3, 26)
    assert counts_to_mask([-1, 27]) == 0  # out-of-range dropped


def test_mixed_groups_active_detection():
    default = RuleSet.from_strings()
    assert not default.mixed_groups_active()  # "27" sentinel disables both
    rs = RuleSet.from_strings(born_edges="4")
    assert rs.mixed_groups_active()


def test_default_ruleset_matches_reference():
    rs = RuleSet.from_strings()
    assert rs.born == (1, 3)
    assert rs.survive == (0, 1, 2, 3, 4, 5, 6)
    assert rs.born_edges == (26,)


def test_all_presets_construct_and_step():
    """Every named preset builds a valid engine config and advances."""
    import jax.numpy as jnp
    from cellularautomatons3d_tpu.models.presets import PRESETS, preset_config
    from cellularautomatons3d_tpu.models.automaton import AutomatonSpec
    from cellularautomatons3d_tpu.ops.packing import pack_grid, seed_random_block
    from cellularautomatons3d_tpu.ops.ca_step import make_step_fn

    for name in PRESETS:
        cfg = preset_config(name, grid_size=32)
        spec = AutomatonSpec.from_config(cfg)
        dense = seed_random_block(32, rng=1)
        if spec.total_states == 2:
            state = jnp.asarray(pack_grid(dense))
        else:
            import numpy as np_
            state = jnp.asarray(np_.stack(
                [pack_grid((dense >> i) & 1) for i in range(spec.age_bits)]
            ))
        out = make_step_fn(spec)(state)
        assert out.shape == state.shape, name


# ---------------------------------------------------------------- export --


def test_counts_to_string_round_trip():
    from cellularautomatons3d_tpu.models.rules import (
        counts_to_string,
        parse_rule_string,
    )

    for counts in [(1, 3), (0, 1, 2, 3, 4, 5, 6), (4,), (), (2, 3, 5, 9, 10),
                   (0, 2, 3, 4, 26), (26,)]:
        s = counts_to_string(counts)
        assert set(parse_rule_string(s)) == set(counts), (counts, s)


def test_counts_to_string_canonical_forms():
    from cellularautomatons3d_tpu.models.rules import counts_to_string

    assert counts_to_string((0, 1, 2, 3, 4, 5, 6)) == "0-6"
    assert counts_to_string((1, 3)) == "1,3"
    assert counts_to_string((1, 2)) == "1,2"       # runs of 2 stay explicit
    assert counts_to_string((5, 6, 7, 9)) == "5-7,9"
    assert counts_to_string(()) == ""


def test_ruleset_string_and_lut_round_trips():
    from cellularautomatons3d_tpu.models.rules import RuleSet

    rs = RuleSet.from_strings(born="1,3", survive="0-6", born_edges="7,9-12")
    again = RuleSet.from_strings(**rs.to_strings())
    assert again.masks() == rs.masks()

    born, survive = rs.lut_arrays()
    from_luts = RuleSet.from_luts(born, survive)
    assert from_luts.masks() == rs.masks()
