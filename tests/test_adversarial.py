"""Adversarial bounded-frontier behavior (BASELINE config 4).

A near-duplicate dictionary (shared prefixes, pairwise within 1-2 edits) over
a corpus densely planted with near-miss needles maximizes simultaneous live
states — the configuration the reference bounds with beam truncation and
auto-beam budgets (src/search.rs:578-589, 1096-1103). The device lanes must
(a) stay oracle-identical, (b) keep serving from a device backend rather than
cliff-falling to the host oracle, and (c) keep any overflow/oracle-rescue
activity a bounded fraction of positions.
"""

import numpy as np

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, oracle

ADV_DICT = [
    "tincidunt", "tincidumt", "tincidenx", "tincidant",
    "sollicitudin", "sollicitudim",
    "vestibulum", "vestibulom",
]


def _adv_engine():
    return (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .min_symbol_similarity(0.4)
        .auto_beam(100_000, 64)
        .build(ADV_DICT)
    )


def _adv_corpus(size: int) -> str:
    rng = np.random.default_rng(31)
    filler = ["lorem", "ipsum", "dolor", "sit", "amet", "porta"]
    vars_a = ["tincidXnt", "solliciXudin", "vestibXlum", "tincidun", "estibulum"]
    parts = []
    n = 0
    j = 0
    while n < size:
        if j % 5 == 0:
            w = vars_a[(j // 5) % len(vars_a)]
        else:
            w = filler[int(rng.integers(len(filler)))]
        parts.append(w)
        n += len(w) + 1
        j += 1
    return " ".join(parts)


def _key(m):
    return (m.pattern_index, m.start, m.end, float(np.float32(m.similarity)))


def test_adversarial_device_equals_oracle_and_stays_bounded():
    engine = _adv_engine()
    hay = _adv_corpus(120_000)
    truth = sorted(map(_key, oracle.search_raw(engine, hay, 0.6)))
    assert len(truth) > 1000, "corpus should be dense in near matches"

    engine.backend = "device"
    got = engine.search_raw(hay, 0.6)
    assert sorted(map(_key, got)) == truth
    st = dict(engine.last_stats)
    assert str(st.get("backend", "")).startswith("device"), st

    # Bounded worst-case: whatever pressure stat the serving lane reports
    # must stay a small fraction of scanned positions (no oracle cliff).
    n_pos = max(1, int(st.get("positions", len(hay))))
    rescues = int(st.get("overflow_rescues", 0))
    assert rescues <= 0.02 * n_pos, st
    if "candidates" in st:
        # The DP lane's candidate count is the frontier analog: it must stay
        # well below positions x patterns (the unbounded-BFS blowup).
        assert int(st["candidates"]) <= 5 * n_pos, st


def test_adversarial_beam_truncation_matches_oracle_below_budget():
    """auto_beam with an ample budget must stay bit-identical to the exact
    search on the adversarial corpus (reference tests.rs:866-917)."""
    plain = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .min_symbol_similarity(0.4)
        .build(ADV_DICT)
    )
    hay = _adv_corpus(40_000)
    truth = sorted(map(_key, oracle.search_raw(plain, hay, 0.6)))
    beamed = _adv_engine()
    beamed.backend = "device"
    got = beamed.search_raw(hay, 0.6)
    assert sorted(map(_key, got)) == truth
