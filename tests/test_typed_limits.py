"""Device parity for per-type and per-pattern limit configurations.

The reference serves these from its monomorphized general path
(src/search.rs:204-393 with the within-limits ahead/emission checks,
src/search.rs:87-169); the device analog is the type-vector-channel DP
(ops/verify_dp.TypedSpec + _banded_dp_typed). Every test is a differential
against the host oracle.
"""

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder,
    FuzzyLimits,
    Pattern,
)


def key(m):
    return (
        m.start, m.end, m.pattern_index, float(np.float32(m.similarity)),
        m.insertions, m.deletions, m.substitutions, m.swaps,
    )


def span_key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)))


def compare(engine, hay, thr, k=span_key):
    engine.backend = "oracle"
    a = sorted(map(k, engine.search_raw(hay, thr)))
    engine.backend = "device"
    dev = engine._device_engine()
    assert dev._typed_ok, "config should take the typed device path"
    b = sorted(map(k, engine.search_raw(hay, thr)))
    engine.backend = "auto"
    assert a == b, f"typed device/oracle mismatch thr={thr}\n oracle={a[:8]}\n device={b[:8]}"
    return a


def _corpus(variants, reps=400):
    parts = []
    for i in range(reps):
        parts.append("lorem ipsum dolor " * (1 + i % 3))
        parts.append(variants[i % len(variants)])
        parts.append(" ")
    return "".join(parts)


def test_substitutions_only():
    """The README's own example config: FuzzyLimits.substitutions(1)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().substitutions(1))
        .case_insensitive(True)
        .build(["needle", "pattern"])
    )
    hay = _corpus(["needle", "needlz", "nedle", "neeedle", "enedle", "pattern", "pXttern"])
    got = compare(engine, hay, 0.7)
    # substitution variants match; deletion/insertion/swap variants must not
    texts = {hay[s:e] for s, e, *_ in got}
    assert "needlz" in texts and "pXttern" in texts
    assert "nedle" not in texts and "neeedle" not in texts
    assert engine.last_stats["backend"] == "device-fuzzy-dp-typed"


def test_total_with_swaps_forbidden():
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .case_insensitive(True)
        .build(["needle"])
    )
    hay = _corpus(["needle", "enedle", "nedl", "needlz", "neXdlz"])
    got = compare(engine, hay, 0.5)
    texts = {hay[s:e] for s, e, *_ in got}
    assert "nedl" in texts  # two deletions within total 2
    # "enedle" as a swap is forbidden; any non-swap repair costs 2+ edits


def test_per_type_caps_no_total():
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().insertions(1).deletions(1))
        .case_insensitive(True)
        .build(["needle", "haystack"])
    )
    hay = _corpus(["needle", "neeedle", "nedle", "needlz", "nedlee", "haystack", "hystack"])
    compare(engine, hay, 0.55)


def test_per_pattern_limits_mixed():
    """Per-pattern limits override the global (reference structs.rs:619-657;
    the ('pat', weight, max_edits) tuple form)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build([
            Pattern.of(("strict", 1.0, 0)),     # per-pattern: exact only
            "needle",                            # global: 1 edit
        ])
    )
    hay = _corpus(["strict", "strlct", "needle", "nedle"])
    got = compare(engine, hay, 0.55)
    texts = {hay[s:e] for s, e, *_ in got}
    assert "strict" in texts and "nedle" in texts
    assert "strlct" not in texts  # strict's own cap forbids the edit


def test_typed_edit_breakdown_counts():
    """Typed channels carry exact per-type counts (the oracle's visited-key
    granularity, src/search.rs:31-50)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().insertions(2).substitutions(1))
        .case_insensitive(True)
        .build(["needle"])
    )
    hay = _corpus(["needle", "neeedle", "needlz", "neeedlz"])
    compare(engine, hay, 0.5, k=key)


@pytest.mark.slow
def test_typed_threshold_sweep():
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).insertions(1))
        .case_insensitive(True)
        .build(["needle", "pattern", "haystack"])
    )
    hay = _corpus(["nedle", "neeedle", "pattren", "haystck", "needle"])
    for thr in (0.45, 0.6, 0.75, 0.9):
        compare(engine, hay, thr)


@pytest.mark.slow
def test_typed_differential_fuzz():
    """Randomized configs x haystacks vs the oracle (the reference's
    differential-fuzz pattern, prefilter.rs:437-562)."""
    import random

    rng = random.Random(0xC0FFEE)
    alphabet = "abcdefg"
    for trial in range(6):
        words = list({
            "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 7)))
            for _ in range(4)
        })
        cfg = rng.choice([
            FuzzyLimits.new().substitutions(rng.randint(1, 2)),
            FuzzyLimits.new().insertions(1).deletions(1),
            FuzzyLimits.new().edits(2).swaps(0),
            FuzzyLimits.new().edits(2).deletions(1),
            FuzzyLimits.new().insertions(1).swaps(1),
        ])
        engine = (
            FuzzyAhoCorasickBuilder.new()
            .fuzzy(cfg)
            .build(words)
        )
        hay = "".join(
            rng.choice(alphabet + "   ") for _ in range(4000)
        )
        thr = rng.choice([0.4, 0.6, 0.8])
        compare(engine, hay, thr)


@pytest.mark.slow  # ~10 min XLA CPU compile of the 55-channel DP
def test_typed_e4_with_sub_cap_device():
    """edits(4).substitutions(1): E > 3 now serves from the device when the
    per-type caps keep the channel count under MAX_TYPED_CHANNELS
    (VERDICT r2 item 6; reference general path src/search.rs:87-169)."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(4).substitutions(1))
        .case_insensitive(True)
        .build(["patrn", "nedle"])  # short patterns keep the 55-channel
        # unrolled DP's XLA CPU compile inside CI bounds (graph ~ Lmax)
    )
    from fuzzy_aho_corasick_tpu.ops.verify_dp import typed_spec_of

    spec = typed_spec_of(eng)
    assert spec is not None and spec.E == 4 and len(spec.vecs) == 55
    assert eng._device_engine()._typed_ok

    rng = np.random.default_rng(5)
    words = ["patrn", "patn", "nedle", "ndle", "nede", "filler", "der", "die"]
    hay = " ".join(words[int(i)] for i in rng.integers(0, len(words), 60))
    eng.backend = "device"
    dv = eng.search_raw(hay, 0.55)
    assert eng.last_stats["backend"] == "device-fuzzy-dp-typed"
    eng.backend = "oracle"
    orc = eng.search_raw(hay, 0.55)
    key = lambda l: sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity)) for m in l
    )
    assert key(dv) == key(orc)


def test_typed_e4_unconstrained_declines():
    """A bare edits(4)... wait - that's the FAST path, not typed. A fully
    per-type E=6 budget (i+d+s+w caps summing past the channel bound)
    declines to the oracle, which stays correct."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().insertions(2).deletions(2)
               .substitutions(2).swaps(2))
        .case_insensitive(True)
        .build(["pattern"])
    )
    from fuzzy_aho_corasick_tpu.ops.verify_dp import typed_spec_of

    # 6^... caps (2,2,2,2) total 8 -> E=8 > 6 -> decline.
    assert typed_spec_of(eng) is None
    ms = eng.search_raw("the pattren and pttern here", 0.6)
    assert len(ms) >= 2


def test_forbidden_type_configs_ride_count_channel_dp():
    """edits(E) with some per-type caps at 0 (e.g. swaps forbidden) rides
    the cheap count-channel DP with those arrivals compiled out, not the
    type-vector DP — same results, ~3x the throughput."""
    from fuzzy_aho_corasick_tpu.ops.verify_dp import forbid_spec_of

    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .case_insensitive(True)
        .build(["pattern", "needle"])
    )
    assert forbid_spec_of(eng) == (2, False, False, False, True)

    rng = np.random.default_rng(3)
    words = ["patern", "pattern", "nedle", "neelde", "filler", "der"]
    hay = " ".join(words[int(i)] for i in rng.integers(0, len(words), 200))
    eng.backend = "device"
    dv = eng.search_raw(hay, 0.6)
    assert eng.last_stats["backend"] == "device-fuzzy-dp-forbid"
    eng.backend = "oracle"
    orc = eng.search_raw(hay, 0.6)
    key = lambda l: sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity),
         m.insertions, m.deletions, m.substitutions, m.swaps) for m in l
    )
    assert key(dv) == key(orc)
    # A swap never appears in any result.
    assert all(m.swaps == 0 for m in orc)

    # Mixed per-type caps (not just forbidden) still use the typed DP.
    capped = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).substitutions(1))
        .build(["pattern"])
    )
    assert forbid_spec_of(capped) is None
