"""Native-C BFS lane (ops/native_bfs): bit-exact oracle parity.

The C hot loop must reproduce the Python oracle exactly — same match set,
same similarities (f32 bit patterns), same edit-count breakdowns (the
best-per-span tie winner). Randomized configs sweep edit budgets, penalty
sets, thresholds and dictionaries; a determinism check guards the
emission-order tie-break.
"""

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import (
    FuzzyAhoCorasickBuilder, FuzzyLimits, FuzzyPenalties, oracle,
)
from fuzzy_aho_corasick_tpu.ops import native_bfs
from fuzzy_aho_corasick_tpu.utils import native

pytestmark = pytest.mark.skipif(
    native.lib() is None or not hasattr(native.lib(), "bfs_search"),
    reason="native toolchain unavailable",
)


def _key(m):
    return (
        m.pattern_index, m.start, m.end, float(np.float32(m.similarity)),
        m.insertions, m.deletions, m.substitutions, m.swaps,
    )


def _check(engine, hay, thr):
    res = native_bfs.search_raw(engine, hay, thr)
    assert res is not None, "native lane declined an eligible config"
    orc = oracle.search_raw(engine, hay, thr)
    assert sorted(map(_key, res)) == sorted(map(_key, orc))
    return res


def test_basic_fuzzy1():
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello", "world", "help"])
    )
    res = _check(eng, "why hello there, wrold of helpful words", 0.7)
    assert len(res) == 10


def test_exact_config():
    eng = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(
        ["cat", "catalog", "dog"]
    )
    res = _check(eng, "the CATALOG of cats and dogs, cat!", 0.5)
    assert any(m.pattern_index == 1 for m in res)


def test_randomized_configs():
    rng = np.random.default_rng(42)
    alphabet = "abcdefgh"
    for trial in range(60):
        n_pat = int(rng.integers(1, 6))
        pats = sorted({
            "".join(alphabet[i] for i in rng.integers(0, len(alphabet), size=int(m)))
            for m in rng.integers(2, 9, size=n_pat)
        })
        edits = int(rng.integers(1, 5))
        pen = FuzzyPenalties.default()
        if rng.integers(2):
            pen = (
                FuzzyPenalties.default()
                .with_insertion(float(rng.uniform(0.2, 1.5)))
                .with_deletion(float(rng.uniform(0.2, 1.5)))
                .with_substitution(float(rng.uniform(0.2, 1.5)))
                .with_swap(float(rng.uniform(0.2, 1.5)))
            )
        b = (
            FuzzyAhoCorasickBuilder.new()
            .fuzzy(FuzzyLimits.new().edits(edits))
            .penalties(pen)
            .case_insensitive(bool(rng.integers(2)))
        )
        if rng.integers(2):
            b = b.min_symbol_similarity(float(rng.uniform(0.0, 0.7)))
        eng = b.build(pats)
        hay = "".join(
            alphabet[i] if rng.integers(5) else " "
            for i in rng.integers(0, len(alphabet), size=120)
        )
        thr = float(rng.uniform(0.3, 0.9))
        _check(eng, hay, thr)


def test_similarity_map_chars():
    # default similarity (vowel/consonant/OCR groups) exercises non-trivial
    # class-pair substitution costs
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .case_insensitive(True)
        .build(["oracle", "laser"])
    )
    # per-type limits -> typed config, OUTSIDE the native envelope
    assert native_bfs.search_raw(eng, "oracle", 0.5) is None

    eng2 = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .case_insensitive(True)
        .build(["oracle", "laser"])
    )
    _check(eng2, "an 0racle and a l4ser and an oracel", 0.55)


def test_envelope_declines():
    # mappings
    m_eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("rn", "m")
        .build(["modern"])
    )
    assert native_bfs.search_raw(m_eng, "modem times", 0.8) is None
    # beams
    b_eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .beam_width(100)
        .build(["hello"])
    )
    assert native_bfs.search_raw(b_eng, "helo", 0.7) is None
    # non-ASCII haystack
    a_eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .build(["hello"])
    )
    assert native_bfs.search_raw(a_eng, "héllo", 0.7) is None


def test_determinism_and_order():
    """Repeat runs are identical, and the output order is the device lanes'
    canonical (pattern, start, end) order."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2))
        .case_insensitive(True)
        .build(["abcde", "bcdef"])
    )
    hay = "xx abcdef abxcde bcdef zz"
    a = [_key(m) for m in native_bfs.search_raw(eng, hay, 0.5)]
    b = [_key(m) for m in native_bfs.search_raw(eng, hay, 0.5)]
    assert a == b
    assert a == sorted(a, key=lambda k: (k[0], k[1], k[2]))


def test_routing_uses_native_lane():
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello"])
    )
    eng.search_raw("a hello b", 0.7)
    assert eng.last_stats["backend"] == "native-bfs"
    # forced oracle backend stays pure Python (independent reference)
    eng.backend = "oracle"
    eng.search_raw("a hello b", 0.7)
    assert eng.last_stats["backend"] == "oracle"


def test_concurrent_callers_are_correct():
    """Two threads hammering the same engine (and a second engine) must all
    get the single-threaded results — the C scratch is thread-local and the
    row buffers are per-thread, so no call serialization exists."""
    import threading

    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello", "world", "help"])
    )
    hays = [
        "why hello there, wrold of helpful words",
        "helo wordl helq nothing",
        "xx hello world help yy" * 3,
    ]
    expect = [[_key(m) for m in native_bfs.search_raw(eng, h, 0.7)] for h in hays]
    errs = []

    def worker(tid):
        try:
            for i in range(200):
                h = hays[(i + tid) % len(hays)]
                got = [_key(m) for m in native_bfs.search_raw(eng, h, 0.7)]
                assert got == expect[(i + tid) % len(hays)]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs


@pytest.mark.slow
def test_threaded_throughput_scales():
    """Two threads should complete ~2x the calls of one thread in the same
    wall time (the ctypes call releases the GIL; scratch is __thread) —
    lenient floor for CI noise (reference: &FuzzyAhoCorasick shared freely
    across a thread pool, benches/benchmark.rs:11-21)."""
    import threading
    import time

    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["hello", "world", "help"])
    )
    # Long enough that the GIL-released C scan dominates the per-call
    # Python overhead (scaling is a property of the C portion).
    hay = "why hello there, wrold of helpful words " * 200
    native_bfs.search_raw(eng, hay, 0.7)  # warm tables

    def run_calls(n):
        for _ in range(n):
            native_bfs.search_raw(eng, hay, 0.7)

    # Calibrate ~0.3 s of single-thread work.
    t0 = time.perf_counter()
    run_calls(500)
    per = (time.perf_counter() - t0) / 500
    n = max(200, int(0.3 / per))

    t0 = time.perf_counter()
    run_calls(n)
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    ts = [threading.Thread(target=run_calls, args=(n,)) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    t_pair = time.perf_counter() - t0

    # 2 threads did 2n calls; speedup = 2 * t_serial / t_pair.
    speedup = 2 * t_serial / t_pair
    assert speedup > 1.25, f"threaded speedup {speedup:.2f}x (serial {t_serial:.3f}s pair {t_pair:.3f}s)"
