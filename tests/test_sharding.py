"""Multi-device sharded search on the virtual 8-device CPU mesh: the halo'd
shard_map path must equal the single-device oracle (the reference's streaming
equivalence property, applied across a mesh instead of windows —
src/tests.rs:1059-1142)."""

import numpy as np

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, SearchOptions
from fuzzy_aho_corasick_tpu.parallel.shard_search import (
    default_mesh,
    sharded_exact_search,
    sharded_fuzzy_search,
)


def key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)))


def test_sharded_exact_equals_oracle():
    import jax

    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    engine = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(
        ["needle", "haystack", "boundary"]
    )
    filler = "xyzzy plugh " * 40
    hay = ""
    # Needles deliberately land across shard boundaries of every alignment.
    for i in range(200):
        hay += filler[: 7 + (i * 13) % 90] + ("needle" if i % 3 else "boundary")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.5))
    got = sorted(key(m) for m in sharded_exact_search(engine, hay, 0.5, default_mesh()))
    assert truth == got
    assert len(truth) > 100


def test_sharded_collective_count():
    """The psum'd total must equal the host-side emission count."""
    engine = FuzzyAhoCorasickBuilder.new().build(["ab"])
    hay = "ab " * 500
    got = sharded_exact_search(engine, hay, 0.0, default_mesh())
    assert len(got) == 500


def _fuzzy_engine(edits=1):
    return (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(edits))
        .case_insensitive(True)
        .build(["needle", "haystack", "boundary"])
    )


def test_sharded_fuzzy_equals_oracle():
    """Fuzzy E=1 sharded DP pipeline == oracle, with exact and one-edit
    needle variants landing at every shard-boundary alignment (the fuzzy
    form of the reference's parallel-window equivalence,
    src/tests.rs:1186-1237)."""
    engine = _fuzzy_engine()
    filler = "xyzzy plugh qwertz " * 9
    variants = ["needle", "nedle", "neXdle", "neddle", "boundray", "boundary"]
    hay = ""
    for i in range(150):
        hay += filler[: 5 + (i * 17) % 110] + variants[i % len(variants)]
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.72))
    got = sharded_fuzzy_search(engine, hay, 0.72, default_mesh())
    assert got is not None, "engine should be packed-prefilter eligible"
    assert sorted(key(m) for m in got) == truth
    assert len(truth) > 100
    assert engine.last_stats["backend"] == "device-fuzzy-sharded"
    assert engine.last_stats["shards"] == 8


def test_sharded_fuzzy_damerau_swaps(monkeypatch):
    """Swap-heavy corpus on the sharded lane: the Damerau scan budget
    (swap = 1 bitap error) and the plain doubled-k model must both equal the
    oracle — and the Damerau budgets must actually be smaller (the lane
    engages them by default for swap-permitting configs)."""
    engine = _fuzzy_engine()
    pk_filt = engine._bitap_filter_cache if hasattr(engine, "_bitap_filter_cache") else None
    filler = "xyzzy plugh qwertz "
    # One adjacent transposition per needle ("nedele" has swap of d/l? use
    # explicit swaps of "needle" -> "needel", "boundary" -> "boundray").
    hay = ""
    for i in range(120):
        hay += filler[: 4 + (i * 13) % 15] + ("needel" if i % 2 else "boundray")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.72))
    assert len(truth) > 60
    got = sharded_fuzzy_search(engine, hay, 0.72, default_mesh())
    assert sorted(key(m) for m in got) == truth

    from fuzzy_aho_corasick_tpu.ops.packed_bitap import packed_fuzzy_of

    pk = packed_fuzzy_of(engine)
    kd = max(pk.filt.k_for(bp, np.float32(0.72), damerau=True) for bp in pk.filt.patterns)
    kp = max(pk.filt.k_for(bp, np.float32(0.72)) for bp in pk.filt.patterns)
    assert kd < kp, "swap-permitting config should shrink k under Damerau"

    monkeypatch.setenv("FAC_NO_DAMERAU", "1")
    eng2 = _fuzzy_engine()
    got2 = sharded_fuzzy_search(eng2, hay, 0.72, default_mesh())
    assert sorted(key(m) for m in got2) == truth


def test_sharded_fuzzy_needle_straddles_every_boundary():
    """A fuzzed needle planted ACROSS each shard boundary must be found by
    exactly one shard (the start < commit ownership rule)."""
    engine = _fuzzy_engine()
    n_dev = 8
    # Build the corpus, then compute the shard length the wrapper will use
    # and plant needles across each boundary.
    base_len = 128 * n_dev * 4  # 4 x 128-blocks per shard
    hay = list("." * base_len)
    shard_len = 128 * 4
    planted = 0
    for d in range(1, n_dev):
        b = d * shard_len
        w = "nedle"  # one deletion
        s = b - len(w) // 2
        hay[s : s + len(w)] = w
        planted += 1
    hay = "".join(hay)
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.72))
    got = sharded_fuzzy_search(engine, hay, 0.72, default_mesh())
    assert sorted(key(m) for m in got) == truth
    assert len(truth) == planted


def test_sharded_fuzzy_unicode_offsets():
    """Unicode corpus: byte offsets must survive shard-boundary rebasing
    (grapheme indices shard; byte offsets come from the view)."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["héllo", "wörld"])
    )
    filler = "àbçdé fgh íjk " * 11
    hay = ""
    for i in range(80):
        hay += filler[: 4 + (i * 13) % 100] + ("héllo" if i % 2 else "wörlt")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.7))
    got = sharded_fuzzy_search(engine, hay, 0.7, default_mesh())
    assert got is not None
    assert sorted(key(m) for m in got) == truth
    assert len(truth) > 50
    hb = hay.encode("utf-8")
    for m in got:
        assert hb[m.start : m.end].decode("utf-8") == m.text


def test_sharded_fuzzy_edits2():
    """The sharded DP path serves any fast-path edit budget, not just E=1."""
    engine = _fuzzy_engine(edits=2)
    hay = ("pad " * 101 + "nele ") * 60  # two deletions of "needle"
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.55))
    got = sharded_fuzzy_search(engine, hay, 0.55, default_mesh())
    assert got is not None
    assert sorted(key(m) for m in got) == truth
    assert len(truth) >= 60


def test_sharded_typed_limits():
    """Per-type caps on the multi-chip path (VERDICT r2 item 8): the typed
    DP threads through make_sharded_fuzzy_step with oracle equality."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(2).swaps(0))
        .case_insensitive(True)
        .build(["needle", "pattern"])
    )
    mesh = default_mesh(8)
    text = ("pad words " * 13 + "nedle ") * 32 + ("x " * 5 + "pattrn ") * 8
    ms = sharded_fuzzy_search(eng, text, 0.6, mesh)
    assert ms is not None
    eng.backend = "oracle"
    truth = eng.search_raw(text, 0.6)
    key = lambda l: sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity)) for m in l
    )
    assert key(ms) == key(truth)
    assert len(ms) >= 32


def test_sharded_mapped():
    """Mapped engines on the multi-chip path: static DP arrivals thread
    through the sharded step; needles planted across shard boundaries."""
    eng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .mapping("ß", "ss")
        .build(["strasse"])
    )
    mesh = default_mesh(8)
    text = ("wort satz " * 11 + "straße ") * 24 + "strasse am ende"
    ms = sharded_fuzzy_search(eng, text, 0.6, mesh)
    assert ms is not None
    eng.backend = "oracle"
    truth = eng.search_raw(text, 0.6)
    key = lambda l: sorted(
        (m.start, m.end, m.pattern_index, float(m.similarity)) for m in l
    )
    assert key(ms) == key(truth)
    assert sum(1 for m in ms if float(m.similarity) > 0.99 and "ß" in m.text) >= 24
