"""Remaining reference test families, mapped test-for-test.

| this file                              | reference src/tests.rs          |
|----------------------------------------|---------------------------------|
| test_siic_simic                        | tests.rs:760-770                |
| test_aminulah_aminullah                | tests.rs:773-783                |
| test_jaar_jafar                        | tests.rs:786-796                |
| test_deterministic_search_beam         | tests.rs:1456-1497 (auto-beam)  |
| test_deterministic_search_unicode      | tests.rs:1502-1546              |
| test_deterministic_search_prefilter    | tests.rs:1586-1637              |
| test_deterministic_stream              | tests.rs:1640-1703              |

Determinism is the property the reference guarantees via its fixed-seed
FxHasher + total-order tiebreakers (structs.rs:96-158, matches.rs:32-36);
this build guarantees it via insertion-order dicts + lexsort tiebreakers
(matches.py) — repeated runs must be bit-identical either way.
"""

import io

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder,
    FuzzyLimits,
    Pattern,
    SearchOptions,
)


def _tuples(ms):
    return [
        (m.start, m.end, m.pattern_index, float(m.similarity),
         m.insertions, m.deletions, m.substitutions, m.swaps)
        for m in ms
    ]


def test_siic_simic():
    """Missing middle char (reference tests.rs:760-770 — the reference only
    prints; we additionally pin the non-empty deletion match)."""
    engine = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(
        [Pattern.of(("SIMIC", 1.0, 3))]
    )
    result = engine.search("SIIC", SearchOptions.new().with_threshold(0.7).sorted())
    assert any(m.text == "SIIC" for m in result)


def test_aminulah_aminullah():
    engine = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(
        [Pattern.of(("AMINULLAH", 1.0, 3))]
    )
    result = engine.search(
        "Aminulah", SearchOptions.new().with_threshold(0.7).sorted()
    )
    assert any(m.pattern.as_str() == "AMINULLAH" for m in result)


def test_jaar_jafar():
    engine = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(
        [Pattern.of(("JAFAR", 1.0, 3))]
    )
    result = engine.search("Jaar", SearchOptions.new().with_threshold(0.7).sorted())
    assert any(m.pattern.as_str() == "JAFAR" for m in result)


def test_deterministic_search_beam():
    """Auto-beam path repeats bit-identically (tests.rs:1456-1497)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(4))
        .auto_beam(100, 500)
        .build([
            "hello", "world", "help", "held", "shell", "yellow",
            "algorithms", "automaton", "abbreviations",
        ])
    )
    haystacks = [
        "hello world",
        "helo world",
        "She sells sea shells by the sea shore",
        "Why did the yellow bird help the shell?",
        "The quick brown fox jumps over the lazy dog",
        "algorithmic automata and abbreviated forms",
    ]
    for haystack in haystacks:
        for threshold in (0.5, 0.7):
            first = _tuples(engine.search(
                haystack, SearchOptions.new().with_threshold(threshold)))
            for _ in range(5):
                nxt = _tuples(engine.search(
                    haystack, SearchOptions.new().with_threshold(threshold)))
                assert first == nxt, (haystack, threshold)


def test_deterministic_search_unicode():
    """Unicode grapheme path repeats bit-identically (tests.rs:1502-1546)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .case_insensitive(True)
        .build(["café", "résumé", "naïve", "piñata", "jalapeño"])
    )
    haystacks = [
        "J'aime le café",
        "Elle a un joli résumé",
        "Très naïve attitude",
        "La piñata est colorée",
        "Jalapeño poppers",
        "Café au lait avec du sucre",
        "Un café noir et un résumé clair",
        "No matches here at all",
        "Cafe without accent",
        "resume without accent",
    ]
    for haystack in haystacks:
        for threshold in (0.5, 0.7, 0.9):
            first = _tuples(engine.search(
                haystack, SearchOptions.new().with_threshold(threshold)))
            for _ in range(5):
                nxt = _tuples(engine.search(
                    haystack, SearchOptions.new().with_threshold(threshold)))
                assert first == nxt, (haystack, threshold)


def test_deterministic_search_prefilter():
    """Prefiltered path repeats bit-identically, unsorted AND sorted
    (tests.rs:1586-1637)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello", "world", "help", "shell", "yellow"])
    )
    haystacks = [
        "hello world",
        "helo world",
        "She sells sea shells by the sea shore",
        "Why did the yellow bird help the shell?",
        "A quick brown fox jumps over the lazy dog",
    ]
    prefiltered = engine.with_prefilter()
    for haystack in haystacks:
        for threshold in (0.5, 0.7, 0.9):
            for opts in (
                SearchOptions.new().with_threshold(threshold),
                SearchOptions.new().with_threshold(threshold).sorted(),
            ):
                first = _tuples(prefiltered.search(haystack, opts))
                for _ in range(5):
                    assert _tuples(prefiltered.search(haystack, opts)) == first


def test_deterministic_stream():
    """search_stream / stream_matches / replace_stream repeat bit-identically
    (tests.rs:1640-1703)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello", "world"])
    )
    haystack = b"hello world hello world"

    def stream_run():
        got = []
        engine.search_stream(haystack, 0.7, lambda m: got.append(f"{m.start}:{m.end}"))
        return got

    first = stream_run()
    for _ in range(5):
        assert stream_run() == first

    first_it = [f"{m.start}:{m.end}" for m in engine.stream_matches(haystack, 0.7)]
    for _ in range(5):
        assert [f"{m.start}:{m.end}" for m in engine.stream_matches(haystack, 0.7)] == first_it

    def replace_run():
        out = io.BytesIO()
        n = engine.replace_stream(haystack, out, 0.7, lambda m: m.text.upper())
        return n, out.getvalue()

    first_rep = replace_run()
    for _ in range(5):
        assert replace_run() == first_rep


def test_deterministic_beam_device_backend():
    """Beam configs with the device backend FORCED (VERDICT r2 item 4).

    Beams bound the host BFS frontier; the device DP pipeline has no
    frontier to bound, so it serves beamed engines with the EXACT result:
    repeat-run bit-identical, equal to the unbeamed engine, and therefore
    equal to the host oracle whenever the beam never truncates (the
    reference is exact below the auto-beam budget, tests.rs:866-917).
    """
    pats = ["hello", "world", "help", "held", "shell", "yellow",
            "algorithms", "automaton", "abbreviations"]
    beamed = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .auto_beam(100, 500)
        .build(pats)
    )
    exact = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .build(pats)
    )
    beamed.backend = "device"
    assert beamed._device_engine()._beamed
    hay = "She sells sea shells; the yellow bird may helo the shelll"
    for thr in (0.5, 0.7):
        first = _tuples(beamed.search(
            hay, SearchOptions.new().with_threshold(thr)))
        for _ in range(3):
            assert first == _tuples(beamed.search(
                hay, SearchOptions.new().with_threshold(thr)))
        # Device-beamed == exact (the DP ignores the beam, by design)...
        # cross-backend comparisons sort (raw order is backend-specific).
        assert sorted(first) == sorted(_tuples(exact.search(
            hay, SearchOptions.new().with_threshold(thr))))
        # ...and == the beamed host oracle here (width 500 never truncates
        # on this family, so the oracle is exact too).
        beamed.backend = "oracle"
        assert sorted(first) == sorted(_tuples(beamed.search(
            hay, SearchOptions.new().with_threshold(thr))))
        beamed.backend = "device"


def test_explicit_beam_width_device_backend():
    """beam_width engines forced onto the device: deterministic and exact."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .beam_width(200)
        .build(["needle", "pattern"])
    )
    eng.backend = "device"
    hay = ("pad words " * 30) + "nedle and pattren here"
    first = _tuples(eng.search(hay, SearchOptions.new().with_threshold(0.7)))
    assert first  # finds the 1-edit needles
    for _ in range(3):
        assert first == _tuples(
            eng.search(hay, SearchOptions.new().with_threshold(0.7))
        )
    eng.backend = "oracle"
    assert sorted(first) == sorted(
        _tuples(eng.search(hay, SearchOptions.new().with_threshold(0.7)))
    )


def test_beamed_mapped_and_typed_device_policy():
    """Beams compose with the mapped and typed lanes: device serves the
    exact result (deterministic), equal to the host below the auto-beam
    budget's exact regime."""
    mapped = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .auto_beam(1_000_000, 500)
        .mapping("ß", "ss")
        .build(["strasse"])
    )
    assert mapped._device_engine()._mapped_ok
    mapped.backend = "device"
    hay = ("wort " * 40) + "straße und strasse"
    first = _tuples(mapped.search(hay, SearchOptions.new().with_threshold(0.6)))
    assert first
    for _ in range(2):
        assert first == _tuples(
            mapped.search(hay, SearchOptions.new().with_threshold(0.6))
        )
    mapped.backend = "oracle"
    assert sorted(first) == sorted(
        _tuples(mapped.search(hay, SearchOptions.new().with_threshold(0.6)))
    )

    typed = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .auto_beam(1_000_000, 500)
        .build(["needle"])
    )
    assert typed._device_engine()._typed_ok
    typed.backend = "device"
    hay2 = ("pad " * 40) + "nedle and nele"
    t1 = _tuples(typed.search(hay2, SearchOptions.new().with_threshold(0.5)))
    typed.backend = "oracle"
    assert sorted(t1) == sorted(
        _tuples(typed.search(hay2, SearchOptions.new().with_threshold(0.5)))
    )


def test_truncating_beam_device_policy():
    """A beam NARROW enough to actually truncate (VERDICT r3 item 5).

    Policy under truncation (documented in README's feature map): the host
    oracle drops frontier states like the reference (src/search.rs:578-589)
    and may return fewer matches; the device DP lane has no frontier to
    bound and returns the EXACT (unbeamed) result — a superset of any
    beamed-host result. Repeat runs stay bit-identical on both paths.
    """
    pats = ["abcde", "abcdx", "abdce", "xbcde", "abxde", "abcxe",
            "aacde", "abcdef", "bcdea"]
    hay = ("pad " * 10) + "abcde abdce abcxe xbcde " + ("pad " * 10) + "abcdef"

    def build(bw):
        b = FuzzyAhoCorasickBuilder.new().fuzzy(FuzzyLimits.new().edits(2))
        if bw:
            b = b.beam_width(bw)
        return b.build(pats)

    unbeamed = build(None)
    full = sorted(_tuples(unbeamed.search(
        hay, SearchOptions.new().with_threshold(0.55))))

    narrow = build(2)
    narrow.backend = "oracle"
    beamed_host = sorted(_tuples(narrow.search(
        hay, SearchOptions.new().with_threshold(0.55))))
    # the beam actually truncates: the host drops matches
    assert len(beamed_host) < len(full)
    # every beamed span also exists unbeamed, never with a better score
    # (truncation only removes paths; the surviving winner may be weaker)
    span = lambda t: (t[0], t[1], t[2])
    full_best = {span(t): t[3] for t in full}
    for t in beamed_host:
        assert span(t) in full_best
        assert t[3] <= full_best[span(t)]
    # beamed host repeats bit-identically
    for _ in range(3):
        assert beamed_host == sorted(_tuples(narrow.search(
            hay, SearchOptions.new().with_threshold(0.55))))

    # the device serves the same engine with the exact result — the
    # documented superset-of-beamed policy
    dev = build(2)
    dev.backend = "device"
    first = _tuples(dev.search(hay, SearchOptions.new().with_threshold(0.55)))
    assert sorted(first) == full
    assert {span(t) for t in beamed_host} <= {span(t) for t in first}
    for _ in range(3):
        assert first == _tuples(dev.search(
            hay, SearchOptions.new().with_threshold(0.55)))
