"""Micro-benchmarks of the search hot paths (host oracle vs device kernels).

Counterpart of the reference's Criterion groups (benches/benchmark.rs:5-257:
search_basic, search_long_text, search_many_patterns, fuzzy_levels 1-3,
build_automaton, replace, beam variants) in a single self-timing script.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits, SearchOptions


def timeit(name, fn, repeat=5):
    fn()
    t0 = time.time()
    for _ in range(repeat):
        fn()
    print(f"{name:32s} {(time.time()-t0)/repeat*1e3:9.2f} ms")


def main():
    words = ["tincidunt", "porta", "vestibulum", "accumsan", "sagittis"]
    long_text = ("lorem ipsum dolor sit amet tincidutn consectetur porta " * 200)
    opts = SearchOptions.new().with_threshold(0.8).sorted().non_overlapping()

    timeit("build_automaton (5 words)",
           lambda: FuzzyAhoCorasickBuilder.new().build(words))
    timeit("build_automaton (1000 words)",
           lambda: FuzzyAhoCorasickBuilder.new().build(
               [f"pattern{i:04d}" for i in range(1000)]))

    exact = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(words)
    timeit("search_basic exact", lambda: exact.search("a tincidunt b porta", opts))
    timeit("search_long_text exact", lambda: exact.search(long_text, opts))

    for edits in (1, 2, 3):
        eng = (FuzzyAhoCorasickBuilder.new()
               .fuzzy(FuzzyLimits.new().edits(edits))
               .case_insensitive(True).build(words))
        timeit(f"fuzzy_level edits={edits}", lambda e=eng: e.search(long_text, opts))

    beam = (FuzzyAhoCorasickBuilder.new()
            .fuzzy(FuzzyLimits.new().edits(4)).beam_width(100)
            .case_insensitive(True).build(words))
    timeit("beam_100 edits=4", lambda: beam.search(long_text[:2000], opts))

    rep = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build_replacer(
        [(w, w.upper()) for w in words])
    timeit("replace", lambda: rep.replace(long_text, SearchOptions.new().with_threshold(0.8)))


if __name__ == "__main__":
    main()
