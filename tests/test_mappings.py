"""Multi-character mapping conformance (reference src/tests.rs:919-1056)."""

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, SearchOptions


def opts(threshold):
    return SearchOptions.new().with_threshold(threshold).sorted()


def test_multi_char_mapping_bidirectional():
    ae = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("æ", "ae")
        .build(["encyclopaedia"])
    )
    m = ae.search("encyclopædia", opts(0.95))
    assert len(m) == 1
    assert m[0].substitutions == 1
    assert m[0].similarity > 0.999

    ea = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("æ", "ae")
        .build(["encyclopædia"])
    )
    assert len(ea.search("encyclopaedia", opts(0.95))) == 1


def test_multi_char_mapping_many_to_one():
    def mk(patterns):
        return (
            FuzzyAhoCorasickBuilder.new()
            .case_insensitive(True)
            .fuzzy(FuzzyLimits.new().edits(1))
            .mapping("ks", "x")
            .build(patterns)
        )

    assert len(mk(["alexandr"]).search("aleksandr", opts(0.95))) == 1
    assert len(mk(["aleksandr"]).search("alexandr", opts(0.95))) == 1


def test_multi_char_mapping_counts_as_edit():
    def build(edits):
        return (
            FuzzyAhoCorasickBuilder.new()
            .case_insensitive(True)
            .fuzzy(FuzzyLimits.new().edits(edits))
            .mapping("ß", "ss")
            .build(["strasse"])
        )

    assert build(0).search("straße", opts(0.9)).is_empty()
    assert len(build(1).search("straße", opts(0.9))) == 1


def test_multi_char_mapping_scored_penalty():
    exact = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("ks", "x")
        .build(["alexandr"])
    )
    scored = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping_scored("ks", "x", 0.8)
        .build(["alexandr"])
    )
    se = exact.search("aleksandr", opts(0.5))[0].similarity
    ss = scored.search("aleksandr", opts(0.5))[0].similarity
    assert se > 0.999
    assert ss < se


def test_no_mapping_is_unaffected():
    e = (
        FuzzyAhoCorasickBuilder.new()
        .case_insensitive(True)
        .fuzzy(FuzzyLimits.new().edits(1))
        .build(["encyclopaedia"])
    )
    assert e.search("encyclopædia", opts(0.9)).is_empty()
