"""Randomized-config differential fuzz at reference scale (VERDICT r3 item 6).

The reference fuzzes its prefilter over ~8,000 random configs
(src/prefilter.rs:437-562); this file scales the port to that volume and
adds randomized-config families for the typed-channel and mapped DP lanes —
the newest device code, previously covered only by hand-picked cases. All
slow-marked: run with FAC_FULL_TESTS=1 (the CI full job).
"""

import time

import numpy as np
import pytest

#: Wall-clock budget per randomized-config family: interpret-mode pallas
#: traces a fresh kernel shape per distinct random config, which on a small
#: CPU host is minutes, not seconds. The deadline keeps the full suite
#: bounded; the minimum-eligible-draws assertions shrink proportionally if
#: the budget cut the loop short.
FUZZ_DEADLINE_S = 600.0

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder,
    FuzzyLimits,
    FuzzyPenalties,
    oracle,
)
from fuzzy_aho_corasick_tpu.utils.graphemes import view_of

from test_prefilter import Rng, differential


def _key(m):
    return (
        m.pattern_index, m.start, m.end, float(np.float32(m.similarity)),
        m.insertions, m.deletions, m.substitutions, m.swaps,
    )


@pytest.mark.slow
def test_prefilter_fuzz_reference_scale_ascii():
    vocab = ["hello", "world", "vestibulum", "abc", "lorem", "cell", "l0rem"]
    filler = ["a", "b", "c", "d", "e", " ", "1", "o", "0", "l"]
    differential(0x5EED5EED5EED5EED, vocab, filler, 4000)


@pytest.mark.slow
def test_prefilter_fuzz_reference_scale_unicode():
    vocab = ["café", "naïve", "Ωμέγα", "Москва", "señor", "école"]
    filler = ["a", "é", "ñ", "ω", "м", " ", "o", "0", "é"]
    differential(0xFEEDFACE8BADF00D, vocab, filler, 4000)


def _random_corpus(rng, vocab, length):
    parts = []
    for _ in range(length):
        r = rng.next() % 10
        if r < 3:
            parts.append(" ")
        elif r < 6:
            w = vocab[rng.next() % len(vocab)]
            if rng.next() % 2 and len(w) > 3:
                i = 1 + rng.next() % (len(w) - 2)
                ch = "q" if w[i] != "q" else "z"
                w = w[:i] + ch + w[i + 1:]
            parts.append(w)
        else:
            parts.append("abcdeolx"[rng.next() % 8])
    return "".join(parts)


@pytest.mark.slow
def test_typed_lane_random_configs():
    """Random per-type caps and per-pattern limits through the typed DP lane
    vs the oracle (reference general-path limit semantics
    src/search.rs:87-169)."""
    from fuzzy_aho_corasick_tpu.ops.verify_dp import (
        fuzzy_search_dp, typed_spec_of,
    )

    vocab = ["hello", "world", "vestibulum", "lorem", "cell", "holder"]
    rng = Rng(0x7E57ED_C0FFEE)
    ran = 0
    t0 = time.time()
    for trial in range(120):
        if ran >= 40 or time.time() - t0 > FUZZ_DEADLINE_S:
            break
        npat = 1 + rng.next() % 4
        pats = sorted({vocab[rng.next() % len(vocab)] for _ in range(npat)})

        def rand_limits():
            lim = FuzzyLimits.new()
            total = 1 + rng.next() % 3
            lim = lim.edits(total)
            for setter in ("insertions", "deletions", "substitutions", "swaps"):
                r = rng.next() % 3
                if r == 0:
                    lim = getattr(lim, setter)(rng.next() % (total + 1))
            return lim

        specs = []
        for p in pats:
            if rng.next() % 4 == 0:
                from fuzzy_aho_corasick_tpu import Pattern

                specs.append(Pattern.of(p).fuzzy(rand_limits()))
            else:
                specs.append(p)
        b = (
            FuzzyAhoCorasickBuilder.new()
            .fuzzy(rand_limits())
            .case_insensitive(bool(rng.next() & 1))
        )
        engine = b.build(specs)
        spec = typed_spec_of(engine)
        if spec is None:
            continue  # config not typed-eligible this draw
        hay = _random_corpus(rng, vocab, 40 + rng.next() % 80)
        view = view_of(hay, engine.case_insensitive)
        n = len(view)
        if n == 0:
            continue
        thr = 0.45 + (rng.next() % 5) * 0.1
        res = fuzzy_search_dp(engine, hay, thr, view, n, typed=spec)
        if res is None:
            continue  # scan declined at this threshold (oracle serves it)
        ran += 1
        orc = oracle.search_raw(engine, hay, thr)
        assert sorted(map(_key, res)) == sorted(map(_key, orc)), (
            f"trial {trial}: pats={specs} thr={thr} hay={hay!r}"
        )
    floor = 20 if time.time() - t0 <= FUZZ_DEADLINE_S else 5
    assert ran >= floor, f"too few eligible typed draws ran ({ran})"


@pytest.mark.slow
def test_mapped_lane_random_configs():
    """Random mapping tables (multi-char, scored) through the mapped DP lane
    vs the oracle (reference mapping branch src/search.rs:883-923)."""
    from fuzzy_aho_corasick_tpu.ops.verify_dp import (
        fuzzy_search_dp, mapped_spec_of,
    )

    maps_pool = [
        ("rn", "m", None), ("cl", "d", None), ("vv", "w", None),
        ("oo", "0", 0.8), ("nn", "m", 0.7), ("ii", "u", None),
    ]
    vocab = ["modern", "world", "clean", "wood", "dinner", "suit"]
    rng = Rng(0xAB1E0000C0DEC0DE)
    ran = 0
    t0 = time.time()
    for trial in range(120):
        if ran >= 30 or time.time() - t0 > FUZZ_DEADLINE_S:
            break
        b = (
            FuzzyAhoCorasickBuilder.new()
            .fuzzy(FuzzyLimits.new().edits(1 + rng.next() % 2))
            .case_insensitive(bool(rng.next() & 1))
        )
        nmaps = 1 + rng.next() % 3
        for _ in range(nmaps):
            pat_side, hay_side, score = maps_pool[rng.next() % len(maps_pool)]
            if score is None:
                b = b.mapping(pat_side, hay_side)
            else:
                b = b.mapping_scored(pat_side, hay_side, score)
        npat = 1 + rng.next() % 3
        pats = sorted({vocab[rng.next() % len(vocab)] for _ in range(npat)})
        engine = b.build(pats)
        spec = mapped_spec_of(engine)
        if spec is None:
            continue
        hay = _random_corpus(rng, vocab + ["modem", "wean", "dimer"],
                             40 + rng.next() % 60)
        if not hay.isascii():
            continue
        view = view_of(hay, engine.case_insensitive)
        n = len(view)
        if n == 0:
            continue
        thr = 0.5 + (rng.next() % 4) * 0.1
        res = fuzzy_search_dp(engine, hay, thr, view, n, maps=spec)
        if res is None:
            continue
        ran += 1
        orc = oracle.search_raw(engine, hay, thr)
        assert sorted(map(_key, res)) == sorted(map(_key, orc)), (
            f"trial {trial}: pats={pats} thr={thr} hay={hay!r}"
        )
    floor = 15 if time.time() - t0 <= FUZZ_DEADLINE_S else 5
    assert ran >= floor, f"too few eligible mapped draws ran ({ran})"
