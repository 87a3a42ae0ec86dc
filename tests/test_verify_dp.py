"""Differential tests for the banded-DP verify pipeline (ops/verify_dp.py).

Model: the reference's oracle-vs-fast-lane differential fuzzing
(reference src/prefilter.rs:437-562). Corpora are sized past FILTER_MIN_N so
the device path routes through the DP pipeline; every (start, end, pattern,
f32 similarity, per-type edit counts) tuple must match the host oracle
exactly.
"""

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder,
    FuzzyLimits,
    FuzzyPenalties,
    Pattern,
    Similarity,
)

WORDS = ["lorem", "ipsum", "dolor", "sit", "amet", "eros", "porta", "orci"]
NEEDLES = ["tincidunt", "phaetra", "weird"]


def make_corpus(rng, n_bytes, needles, rate=0.02):
    parts, size = [], 0
    while size < n_bytes:
        if rng.random() < rate:
            w = needles[int(rng.integers(len(needles)))]
            if rng.random() < 0.7:
                i = int(rng.integers(len(w)))
                op = int(rng.integers(4))
                if op == 0:
                    w = w[:i] + chr(97 + int(rng.integers(26))) + w[i + 1:]
                elif op == 1:
                    w = w[:i] + w[i + 1:]
                elif op == 2:
                    w = w[:i] + chr(97 + int(rng.integers(26))) + w[i:]
                elif op == 3 and i + 1 < len(w):
                    w = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        else:
            w = WORDS[int(rng.integers(len(WORDS)))]
        parts.append(w)
        size += len(w) + 1
    return " ".join(parts)


def full_key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)),
            m.insertions, m.deletions, m.substitutions, m.swaps)


def assert_dp_matches_oracle(engine, hay, thr, expect_backend="device-fuzzy-dp"):
    engine.backend = "oracle"
    o = sorted(map(full_key, engine.search_raw(hay, thr)))
    engine.backend = "device"
    d = sorted(map(full_key, engine.search_raw(hay, thr)))
    assert engine.last_stats.get("backend") == expect_backend, engine.last_stats
    assert o == d, (len(o), len(d), sorted(set(o) ^ set(d))[:6])
    assert len(o) > 0  # the corpus seeds real matches


@pytest.mark.parametrize(
    "edits,thr",
    [
        (1, 0.6),
        pytest.param(2, 0.75, marks=pytest.mark.slow),
        pytest.param(3, 0.8, marks=pytest.mark.slow),
    ],
)
def test_dp_differential_default_config(edits, thr):
    rng = np.random.default_rng(100 + edits)
    hay = make_corpus(rng, 20000, NEEDLES)
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(edits))
        .case_insensitive(True)
        .build(NEEDLES)
    )
    assert_dp_matches_oracle(eng, hay, thr)


@pytest.mark.slow
def test_dp_differential_custom_penalties():
    # Cheap ins+del vs one sub ties exercise the per-edit-count Pareto
    # channels (a min-penalty-only cell loses budget-limited scripts).
    rng = np.random.default_rng(11)
    hay = make_corpus(rng, 20000, NEEDLES)
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .penalties(
            FuzzyPenalties.default()
            .with_substitution(0.9).with_insertion(0.3)
            .with_deletion(0.3).with_swap(0.45)
        )
        .build(NEEDLES)
    )
    assert_dp_matches_oracle(eng, hay, 0.7)


def test_dp_differential_custom_similarity():
    rng = np.random.default_rng(12)
    hay = make_corpus(rng, 18000, NEEDLES)
    sim = Similarity.from_map({("o", "0"): 0.9, ("i", "1"): 0.85, ("e", "3"): 0.8})
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .similarity(sim)
        .build(NEEDLES)
    )
    assert_dp_matches_oracle(eng, hay, 0.7)


def test_dp_differential_suffix_outputs():
    # Patterns that are suffixes of each other: output lists merged along
    # fail chains emit with the full walked span (reference
    # src/builder.rs:239-276) — fields are output NODES, not patterns.
    rng = np.random.default_rng(13)
    sfx = ["testing", "sting", "ing"]
    hay = make_corpus(rng, 18000, sfx)
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .build(sfx)
    )
    assert_dp_matches_oracle(eng, hay, 0.6)


def test_dp_differential_weights_and_floor():
    rng = np.random.default_rng(14)
    pats = [Pattern("tincidunt").with_weight(0.9), Pattern("phaetra").with_weight(1.1)]
    hay = make_corpus(rng, 18000, ["tincidunt", "phaetra"])
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .min_symbol_similarity(0.5)
        .build(pats)
    )
    assert_dp_matches_oracle(eng, hay, 0.65)


def test_dp_differential_unicode_corpus():
    rng = np.random.default_rng(15)
    hay = (
        make_corpus(rng, 18000, NEEDLES)
        .replace("lorem", "lörem")
        .replace("ipsum", "ипсум")
    )
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(NEEDLES)
    )
    assert_dp_matches_oracle(eng, hay, 0.7)


def test_damerau_scan_swap_differential():
    """The baked scan's Damerau mode (swap = 1 bitap error, native
    transposition transition — ops/packed_bitap._kernel_factory) must engage
    for swap-permitting budgets and stay oracle-identical on swap-heavy text
    (reference swap semantics src/search.rs:312-324; the plain model doubles
    k instead, prefilter.rs:174-183)."""
    import numpy as np

    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.ops.packed_bitap import packed_fuzzy_of
    from fuzzy_aho_corasick_tpu.ops.verify_dp import fuzzy_search_dp
    from fuzzy_aho_corasick_tpu.utils.graphemes import view_of

    pats = ["tincidunt", "phaetra", "sollicitudin"]

    def build():
        return (
            FuzzyAhoCorasickBuilder.new()
            .fuzzy(FuzzyLimits.new().edits(1))
            .case_insensitive(True)
            .build(pats)
        )

    eng = build()
    pk = packed_fuzzy_of(eng)
    kp = [pk.filt.k_for(bp, np.float32(0.8)) for bp in pk.filt.patterns]
    kd = [pk.filt.k_for(bp, np.float32(0.8), damerau=True) for bp in pk.filt.patterns]
    assert max(kd) < max(kp), "Damerau budgets should halve swap-doubled k"

    # Swap-heavy haystack: leading swap, trailing swap, interior swap, exact.
    hay = "xx tnicidunt yy phaetar zz sollicitudni ww itncidunt " * 40
    view = view_of(hay, True)
    res = fuzzy_search_dp(eng, hay, 0.8, view, len(view))
    assert res is not None, "DP lane must serve this config"

    oracle_eng = build()
    oracle_eng.backend = "oracle"
    orc = oracle_eng.search_raw(hay, 0.8)
    key = lambda m: (m.start, m.end, m.pattern_index, round(float(m.similarity), 5))
    assert sorted(map(key, res)) == sorted(map(key, orc))

    # And the plain recurrence (FAC_NO_DAMERAU) agrees too.
    import os

    os.environ["FAC_NO_DAMERAU"] = "1"
    try:
        eng2 = build()
        res2 = fuzzy_search_dp(eng2, hay, 0.8, view, len(view))
        assert res2 is not None
        assert sorted(map(key, res2)) == sorted(map(key, orc))
    finally:
        os.environ.pop("FAC_NO_DAMERAU", None)
