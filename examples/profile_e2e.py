"""Stage-by-stage timing of the end-to-end exact device search.

Breaks a `search_raw` on a BENCH_MB-sized corpus into its pipeline stages to
locate host/transfer bottlenecks (mirrors the reference's profiling drivers,
reference examples/profile_search.rs / profile_bench.rs).
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

import jax
import jax.numpy as jnp

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder
from fuzzy_aho_corasick_tpu.utils.graphemes import HaystackView


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


def t(label, fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:32s} {min(ts)*1e3:10.1f} ms")
    return r


def main():
    dictionary = [
        "tincidunt", "phaetra", "sollicitudin", "venenatis", "fringilla",
        "ullamcorper", "pellentesque", "sagittis", "condimentum", "habitasse",
        "malesuada", "scelerisque", "imperdiet", "vulputate", "ridiculus",
        "parturient",
    ]
    mb = int(os.environ.get("BENCH_MB", "32"))
    corpus = build_corpus(mb << 20)
    nbytes = len(corpus)
    print(f"corpus {nbytes/2**20:.1f} MiB, device {jax.devices()[0]}")

    engine = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(dictionary)
    engine.backend = "device"

    # Full search (warm)
    t("search_raw (end-to-end)", lambda: engine.search_raw(corpus, 0.5), n=2)
    print("stats:", engine.last_stats)

    from fuzzy_aho_corasick_tpu.ops.packed_bitap import (
        packed_exact_of, exact_hits_packed, _derive_layout, _packed_exact_jit, _bcast, _cap_cache,
    )

    view = t("HaystackView", lambda: HaystackView(corpus, True))
    pk = packed_exact_of(engine)
    ids = t("transcode", lambda: pk.transcode(corpus, view, engine.dense))
    n = len(ids)
    halo = pk.m_max
    NL, TB, chunk, grid = _derive_layout(n, halo, pk.W)
    print(f"layout NL={NL} TB={TB} chunk={chunk} grid={grid} W={pk.W} A={pk.A}")

    def pad():
        ids_pad = np.zeros(NL * chunk, dtype=np.uint8)
        ids_pad[:n] = ids
        return ids_pad

    ids_pad = t("pad to NL*chunk", pad)
    dev = t("H2D jnp.asarray + block", lambda: jax.block_until_ready(jnp.asarray(ids_pad)))

    match_np = pk.match_mask()
    tbl = jnp.asarray(pk.plane_tbl)
    starts_b = _bcast(pk.starts, NL)
    match_b = _bcast(match_np, NL)
    init_b = jnp.zeros((1, 2 * pk.W, NL), jnp.uint32)
    K = _cap_cache(engine).get(("exact", NL, TB, grid, chunk), 1 << 14)
    print("K =", K)

    def kern_only():
        out = _packed_exact_jit(dev, tbl, starts_b, match_b, init_b,
                                pk.A, pk.W, NL, TB, grid, chunk, halo, K)
        jax.block_until_ready(out)
        return out

    out = t("kernel on resident ids", kern_only)

    def kern_with_h2d():
        out = _packed_exact_jit(jnp.asarray(ids_pad), tbl, starts_b, match_b, init_b,
                                pk.A, pk.W, NL, TB, grid, chunk, halo, K)
        jax.block_until_ready(out)
        return out

    t("kernel + H2D", kern_with_h2d)

    count, pos, w = out
    t("readback count", lambda: int(count))
    t("readback pos+w", lambda: (np.asarray(pos), np.asarray(w)))

    t("exact_hits_packed (full)", lambda: exact_hits_packed(engine, corpus, view))

    # encode/isascii host prep costs
    t("corpus.isascii()", lambda: corpus.isascii())
    t("corpus.encode(utf-8)", lambda: corpus.encode("utf-8"))


if __name__ == "__main__":
    main()
