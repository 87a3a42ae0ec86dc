"""Profile the fuzzy E=1 device path: anchor filter vs beam kernel time.

Run on the real chip: python examples/profile_fuzzy.py [MB]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "FAC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits


def build_corpus(size_bytes: int) -> str:
    rng = np.random.default_rng(42)
    filler_words = [
        "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
        "elit", "vestibulum", "eros", "commodo", "accumsan", "porta", "orci",
    ]
    needles = ["tincidunt", "phaetra", "sollicitudin"]
    parts = []
    size = 0
    while size < size_bytes:
        w = filler_words[int(rng.integers(len(filler_words)))]
        if rng.integers(997) == 0:
            w = needles[int(rng.integers(len(needles)))]
        parts.append(w)
        size += len(w) + 1
    return " ".join(parts)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dictionary = [
        "tincidunt", "phaetra", "sollicitudin", "venenatis", "fringilla",
        "ullamcorper", "pellentesque", "sagittis", "condimentum", "habitasse",
        "malesuada", "scelerisque", "imperdiet", "vulputate", "ridiculus",
        "parturient",
    ]
    corpus = build_corpus(mb << 20)
    n = len(corpus)
    print(f"corpus: {n} bytes")

    fengine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(dictionary)
    )
    fengine.backend = "device"
    thr = np.float32(0.8)

    from fuzzy_aho_corasick_tpu.ops import fuzzy as F
    from fuzzy_aho_corasick_tpu.utils.graphemes import HaystackView

    view = HaystackView(corpus, fengine.case_insensitive)

    # warm (includes compiles)
    t0 = time.time()
    cand = F._candidate_starts(fengine, corpus, view, len(view), thr)
    print(f"anchor warm: {time.time()-t0:.2f}s anchors={len(cand)} ({len(cand)/n:.4%})")
    t0 = time.time()
    cand = F._candidate_starts(fengine, corpus, view, len(view), thr)
    print(f"anchor hot:  {time.time()-t0:.3f}s -> {n/(time.time()-t0)/1e6:.0f} MB/s")

    t0 = time.time()
    m = F.fuzzy_search_device(fengine, corpus, float(thr), view)
    print(f"full warm: {time.time()-t0:.2f}s matches={len(m)} stats={fengine.last_stats}")
    t0 = time.time()
    m = F.fuzzy_search_device(fengine, corpus, float(thr), view)
    dt = time.time() - t0
    print(f"full hot:  {dt:.2f}s -> {n/dt/1e6:.1f} MB/s stats={fengine.last_stats}")


if __name__ == "__main__":
    main()
