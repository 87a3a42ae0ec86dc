"""Multi-device sharded search on the virtual 8-device CPU mesh: the halo'd
shard_map path must equal the single-device oracle (the reference's streaming
equivalence property, applied across a mesh instead of windows —
src/tests.rs:1059-1142)."""

import numpy as np

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, SearchOptions
from fuzzy_aho_corasick_tpu.parallel.shard_search import default_mesh, sharded_exact_search


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
