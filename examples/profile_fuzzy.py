"""Stage-by-stage profile of the fuzzy E=1 device path on the bench corpus.

Run on the real chip: python examples/profile_fuzzy.py [MB]
"""

import os
import sys
import time

os.environ.setdefault(
    "FAC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    import jax
    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.utils.graphemes import HaystackView
    from fuzzy_aho_corasick_tpu.utils import device_corpus

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    corpus = build_corpus(mb << 20)
    n = len(corpus)
    print(f"corpus: {n} bytes, device: {jax.devices()[0]}")

    dictionary = [
        "tincidunt", "phaetra", "sollicitudin", "venenatis", "fringilla",
        "ullamcorper", "pellentesque", "sagittis", "condimentum", "habitasse",
        "malesuada", "scelerisque", "imperdiet", "vulputate", "ridiculus",
        "parturient",
    ]
    engine = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(dictionary)
    )
    engine.backend = "device"
    thr = 0.8

    # Warm (includes compile + transcode + upload)
    t0 = time.time()
    m = engine.search_raw(corpus, thr)
    print(f"warm search: {time.time()-t0:.2f}s, matches={len(m)}, stats={engine.last_stats}")

    # Hot full search
    for _ in range(2):
        t0 = time.time()
        m = engine.search_raw(corpus, thr)
        print(f"hot search: {time.time()-t0:.3f}s -> {n/(time.time()-t0)/1e6:.0f} MB/s, stats={engine.last_stats}")

    # --- stage breakdown ---------------------------------------------------
    view = HaystackView(corpus, engine.case_insensitive)
    from fuzzy_aho_corasick_tpu.ops.packed_bitap import (
        packed_fuzzy_of, _space_token, _derive_layout_resident, _dev_consts,
        _bcast, packed_hits,
    )
    from fuzzy_aho_corasick_tpu.ops.verify_dp import verify_fields_of

    pk = packed_fuzzy_of(engine)
    vf = verify_fields_of(engine)
    thr32 = np.float32(thr)
    ks = [pk.filt.k_for(bp, thr32) for bp in pk.filt.patterns]
    match, init, k = pk.fuzzy_masks(ks)
    halo = pk.m_max + k

    # transcode time (host)
    t0 = time.time()
    ids_np = np.ascontiguousarray(pk.filt.transcode(corpus)[0], dtype=np.uint8)
    t_tc = time.time() - t0
    print(f"transcode (pf): {t_tc:.3f}s  ({n/t_tc/1e6:.0f} MB/s)")

    dense = engine.dense
    t0 = time.time()
    ids_d_np = np.ascontiguousarray(dense.transcode(corpus, view), dtype=np.uint8)
    t_tc2 = time.time() - t0
    print(f"transcode (dense): {t_tc2:.3f}s ({n/t_tc2/1e6:.0f} MB/s)")

    ids_pf, n_pf = device_corpus.resident(
        corpus, ("pk-fuzzy", _space_token(engine)),
        lambda h: np.ascontiguousarray(pk.filt.transcode(h)[0], dtype=np.uint8),
    )
    NL, TB, chunkpf, grid = _derive_layout_resident(ids_pf.size, halo, pk.W)
    tbl, sb, mb_, ib = _dev_consts(
        engine, ("anchor-consts", NL, float(thr32)),
        lambda: (jax.device_put(pk.word_tbl), _bcast(pk.starts, NL),
                 _bcast(match, NL), _bcast(init, NL)),
    )

    import jax.numpy as jnp
    import functools

    @functools.partial(jax.jit, static_argnames=("A","W","NL","TB","grid","chunk","halo","k","KH"))
    def hits_only(ids_pad, word_tbl, starts, match, init, A, W, NL, TB, grid, chunk, halo, k, KH):
        count, pos, w = packed_hits(ids_pad, word_tbl, starts, match, init, A, W, NL, TB, grid, chunk, halo, k, KH)
        return count, pos[:8], w[:8]

    KH = 1 << 17
    out = jax.block_until_ready(hits_only(ids_pf, tbl, sb, mb_, ib, pk.A, pk.W, NL, TB, grid, chunkpf, halo, k, KH))
    t0 = time.time()
    out = jax.block_until_ready(hits_only(ids_pf, tbl, sb, mb_, ib, pk.A, pk.W, NL, TB, grid, chunkpf, halo, k, KH))
    t_hits = time.time() - t0
    print(f"packed_hits (flag scan + compact + replay): {t_hits*1000:.1f} ms, hit count={int(out[0])}")

    # full DP pipeline device-only timing
    from fuzzy_aho_corasick_tpu.ops import verify_dp as vdp
    # re-run search but time just the jit dispatch via monkeypatched device_get
    real_get = jax.device_get
    times = {"get": 0.0}
    def timed_get(x):
        jax.block_until_ready(x)
        t1 = time.time()
        r = real_get(x)
        times["get"] += time.time() - t1
        return r
    t0 = time.time()
    jax.device_get = timed_get
    try:
        m = engine.search_raw(corpus, thr)
    finally:
        jax.device_get = real_get
    print(f"full search again: {time.time()-t0:.3f}s (device_get copy time {times['get']*1000:.0f} ms), stats={engine.last_stats}")


if __name__ == "__main__":
    main()
