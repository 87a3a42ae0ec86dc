"""Bisect the packed-hits stage: lanes | scan | transpose | cumsum | compact."""

import functools
import os
import sys
import time

os.environ.setdefault(
    "FAC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from profile_fuzzy import build_corpus


def bench(fn, *args, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.ops.compact import compact_indices, cumsum_i32
    from fuzzy_aho_corasick_tpu.ops.packed_bitap import (
        _bcast, _derive_layout_resident, _dev_consts, _lanes_of, _pallas_scan,
        _replay_words, _space_token, packed_fuzzy_of,
    )
    from fuzzy_aho_corasick_tpu.utils import device_corpus

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    corpus = build_corpus(mb << 20)
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
    thr = np.float32(0.8)
    pk = packed_fuzzy_of(engine)
    ks = [pk.filt.k_for(bp, thr) for bp in pk.filt.patterns]
    match, init, k = pk.fuzzy_masks(ks)
    halo = pk.m_max + k
    ids_pf, ids_pf_w32, n = device_corpus.resident_words(
        corpus, ("pk-fuzzy", _space_token(engine)),
        lambda h: np.ascontiguousarray(pk.filt.transcode(h)[0], dtype=np.uint8),
    )
    NL, TB, chunk, grid = _derive_layout_resident(ids_pf.size, halo, pk.W)
    rows = grid * TB
    print(f"NL={NL} TB={TB} chunk={chunk} grid={grid} rows={rows} halo={halo} k={k} W={pk.W}")
    tbl, sb, mb_, ib = _dev_consts(
        engine, ("anchor-consts", NL, float(thr)),
        lambda: (jax.device_put(pk.word_tbl), _bcast(pk.starts, NL),
                 _bcast(match, NL), _bcast(init, NL)),
    )
    KH = 1 << 17

    @jax.jit
    def s_lanes(ids):
        return _lanes_of(ids, NL, chunk, halo, rows).astype(jnp.int32).sum()

    @jax.jit
    def s_scan(ids):
        lanes = _lanes_of(ids, NL, chunk, halo, rows)
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        return flag.sum()

    @jax.jit
    def s_transpose(ids):
        lanes = _lanes_of(ids, NL, chunk, halo, rows)
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        flag2 = flag[halo: halo + chunk].T.reshape(-1)
        return flag2[:: 1 << 16].sum()

    @jax.jit
    def s_cumsum(ids):
        lanes = _lanes_of(ids, NL, chunk, halo, rows)
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        flag2 = flag[halo: halo + chunk].T.reshape(-1)
        return cumsum_i32(flag2)[:: 1 << 16].sum()

    @jax.jit
    def s_compact(ids):
        lanes = _lanes_of(ids, NL, chunk, halo, rows)
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        flag2 = flag[halo: halo + chunk].T.reshape(-1)
        count, pos = compact_indices(flag2, KH)
        return count + pos.sum()

    @jax.jit
    def s_replay(ids, ids_w32):
        lanes = _lanes_of(ids, NL, chunk, halo, rows)
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        flag2 = flag[halo: halo + chunk].T.reshape(-1)
        count, pos = compact_indices(flag2, KH)
        w = _replay_words(ids, pos, tbl, sb, mb_, ib, halo, k, pk.W, pk.A, KH, ids_w32=ids_w32)
        return count + w.astype(jnp.int32).sum()

    for name, fn, args in [
        ("lanes", s_lanes, (ids_pf,)),
        ("scan", s_scan, (ids_pf,)),
        ("+transpose", s_transpose, (ids_pf,)),
        ("+cumsum", s_cumsum, (ids_pf,)),
        ("+compact", s_compact, (ids_pf,)),
        ("+replay", s_replay, (ids_pf, ids_pf_w32)),
    ]:
        try:
            t, out = bench(fn, *args)
            print(f"{name:12s} {t * 1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
