"""Checkpoint round-trip: a loaded engine must search identically (including
oracle/device parity) to the one it was saved from."""

import numpy as np

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder,
    FuzzyAhoCorasick,
    FuzzyLimits,
    Pattern,
    SearchOptions,
)


def key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)),
            m.edits, m.insertions, m.deletions, m.substitutions, m.swaps)


def test_save_load_roundtrip(tmp_path):
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .case_insensitive(True)
        .mapping("ß", "ss")
        .min_symbol_similarity(0.1)
        .build([
            "strasse",
            ("weighted", 1.5),
            Pattern.of("custom").fuzzy(FuzzyLimits.new().edits(1)).with_custom_unique_id(9),
        ])
    )
    path = str(tmp_path / "engine.npz")
    engine.save(path)
    loaded = FuzzyAhoCorasick.load(path)

    for hay in ["die STRAßE und strasse", "weigted custom cstom", "no match"]:
        for thr in [0.5, 0.8]:
            a = sorted(map(key, engine.search_raw(hay, thr)))
            b = sorted(map(key, loaded.search_raw(hay, thr)))
            assert a == b, (hay, thr)

    opts = SearchOptions.new().with_threshold(0.8).sorted().non_overlapping()
    assert (
        engine.search("strase here", opts).matched_strings()
        == loaded.search("strase here", opts).matched_strings()
    )


def test_save_load_mapped_engine_device_lane(tmp_path):
    """A mapped engine round-trips with its mapping transitions intact and
    the loaded engine is eligible for the mapped device lane."""
    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.serialize import load, save

    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("ß", "ss")
        .build(["strasse"])
    )
    path = tmp_path / "mapped.npz"
    save(eng, path)
    loaded = load(path)

    from fuzzy_aho_corasick_tpu.ops.verify_dp import mapped_spec_of

    orig_spec = mapped_spec_of(eng)
    new_spec = mapped_spec_of(loaded)
    assert new_spec is not None and new_spec.maps == orig_spec.maps

    hay = ("wort " * 60) + "straße und strasse"
    loaded.backend = "device"
    dv = loaded.search_raw(hay, 0.6)
    eng.backend = "oracle"
    orc = eng.search_raw(hay, 0.6)
    key = lambda l: sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity)) for m in l
    )
    assert key(dv) == key(orc)
