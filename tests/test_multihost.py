"""Multi-host skeleton: host-sharded corpus plan + per-host sharded search
must equal the whole-input search (SURVEY §5 distributed backend row;
the single-process form of one pod process's code path)."""

import numpy as np

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
from fuzzy_aho_corasick_tpu.parallel.multihost import (
    HostShardPlan,
    align_utf8,
    initialize,
    search_multihost,
)
from fuzzy_aho_corasick_tpu.parallel.shard_search import default_mesh


def key(m):
    return (m.start, m.end, m.pattern_index, float(np.float32(m.similarity)))


def test_initialize_single_process_noop():
    assert initialize() == 0
    assert initialize(num_processes=1) == 0


def test_host_shard_plan_covers_exactly():
    plan = HostShardPlan(1000, 4, overlap_bytes=50)
    shards = plan.shards()
    assert [s.own_start for s in shards] == [0, 250, 500, 750]
    assert [s.own_end for s in shards] == [250, 500, 750, 1000]
    assert all(s.read_end == min(s.own_end + 50, 1000) for s in shards)


def test_align_utf8():
    data = "héllo".encode("utf-8")
    # position 2 is the continuation byte of 'é'
    assert align_utf8(data, 2) == 3
    assert align_utf8(data, 0) == 0


def test_multihost_fuzzy_equals_whole_input():
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["needle", "boundary"])
    )
    filler = "assorted filler words "
    hay = ""
    for i in range(300):
        hay += filler[: 5 + (i * 7) % 20] + ("nedle" if i % 2 else "boundary")
    corpus = hay.encode("utf-8")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.72))
    for n_hosts in (1, 2, 3):
        got = search_multihost(engine, corpus, 0.72, n_hosts, default_mesh())
        assert sorted(map(key, got)) == truth, f"n_hosts={n_hosts}"
    assert len(truth) > 200


def test_multihost_unicode_boundary_alignment():
    """A host boundary landing inside a multi-byte code point must not break
    decode or ownership."""
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(["héllo"])
    )
    hay = ("àé " * 40 + "héllo ") * 40
    corpus = hay.encode("utf-8")
    engine.backend = "oracle"
    truth = sorted(key(m) for m in engine.search_raw(hay, 0.8))
    got = search_multihost(engine, corpus, 0.8, 3, default_mesh())
    assert sorted(map(key, got)) == truth
    assert len(truth) >= 40
