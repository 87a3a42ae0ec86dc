"""Finer sub-stage profile of the fuzzy DP pipeline."""

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


def bench_fn(fn, *args, reps=3):
    import jax
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp
    from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits
    from fuzzy_aho_corasick_tpu.utils.graphemes import HaystackView
    from fuzzy_aho_corasick_tpu.utils import device_corpus
    from fuzzy_aho_corasick_tpu.ops.packed_bitap import (
        packed_fuzzy_of, _space_token, _derive_layout_resident, _dev_consts,
        _bcast, _lanes_of, _pallas_scan, _replay_words,
    )
    from fuzzy_aho_corasick_tpu.ops.compact import compact_indices, cumsum_i32
    from fuzzy_aho_corasick_tpu.ops.verify_dp import verify_fields_of, _banded_dp

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    corpus = build_corpus(mb << 20)
    n = len(corpus)
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
    thr = np.float32(0.8)
    view = HaystackView(corpus, engine.case_insensitive)

    pk = packed_fuzzy_of(engine)
    vf = verify_fields_of(engine)
    ks = [pk.filt.k_for(bp, thr) for bp in pk.filt.patterns]
    match, init, k = pk.fuzzy_masks(ks)
    halo = pk.m_max + k
    print(f"W={pk.W} A={pk.A} k={k} halo={halo} m_max={pk.m_max} Lmax={vf.max_depth}")

    ids_pf, n_pf = device_corpus.resident(
        corpus, ("pk-fuzzy", _space_token(engine)),
        lambda h: np.ascontiguousarray(pk.filt.transcode(h)[0], dtype=np.uint8),
    )
    NL, TB, chunkpf, grid = _derive_layout_resident(ids_pf.size, halo, pk.W)
    print(f"NL={NL} TB={TB} chunk={chunkpf} grid={grid} nb={ids_pf.size}")
    tbl, sb, mb_, ib = _dev_consts(
        engine, ("anchor-consts", NL, float(thr)),
        lambda: (jax.device_put(pk.word_tbl), _bcast(pk.starts, NL),
                 _bcast(match, NL), _bcast(init, NL)),
    )

    rows = grid * TB

    @jax.jit
    def stage_lanes(ids):
        return _lanes_of(ids, NL, chunkpf, halo, rows)

    t, lanes = bench_fn(stage_lanes, ids_pf)
    print(f"lanes_of: {t*1000:.1f} ms")

    @functools.partial(jax.jit, static_argnames=())
    def stage_scan(lanes, tbl, sb, mb_, ib):
        flag, _ = _pallas_scan(lanes, tbl, sb, mb_, ib, k, pk.W, pk.A, NL, TB, grid, False, rows)
        return flag

    t, flag = bench_fn(stage_scan, lanes, tbl, sb, mb_, ib)
    print(f"pallas flag scan: {t*1000:.1f} ms")

    @jax.jit
    def stage_transpose(flag):
        return flag[halo: halo + chunkpf].T.reshape(-1)

    t, flag2 = bench_fn(stage_transpose, flag)
    print(f"flag transpose: {t*1000:.1f} ms")

    @jax.jit
    def stage_cumsum(flag2):
        return cumsum_i32(flag2)

    t, _ = bench_fn(stage_cumsum, flag2)
    print(f"cumsum: {t*1000:.1f} ms")

    KH = 1 << 17

    @functools.partial(jax.jit, static_argnames=("K",))
    def stage_compact(flag2, K):
        return compact_indices(flag2, K)

    t, (cnt, pos) = bench_fn(stage_compact, flag2, KH)
    print(f"compact_indices(KH={KH}): {t*1000:.1f} ms, count={int(cnt)}")

    @jax.jit
    def stage_replay(pos):
        return _replay_words(ids_pf, pos, tbl, sb, mb_, ib, halo, k, pk.W, pk.A, KH)

    t, words = bench_fn(stage_replay, pos)
    print(f"replay_words: {t*1000:.1f} ms")

    # DP stage alone on the real candidates
    dense = engine.dense
    narrow = dense.num_classes <= 256
    ids_dense, _ = device_corpus.resident(
        corpus, ("dense", _space_token(engine)),
        lambda h: np.ascontiguousarray(dense.transcode(h, view), dtype=np.uint8 if narrow else np.int32),
    )
    ceil = engine.prune_len_arr - np.float32(engine.prune_len_over_weight_arr * thr)
    max_pen = np.float32(ceil[0])
    node_ceil = jax.device_put(ceil)
    pens = engine.penalties

    CAND = 1 << 18
    cand_field = jnp.zeros((CAND,), jnp.int32)
    cand_start = jnp.zeros((CAND,), jnp.int32)

    pcls_d = jax.device_put(vf.path_cls.reshape(-1))
    pnode_d = jax.device_put(vf.path_node.reshape(-1))
    dep_d = jax.device_put(vf.depth)
    sim_d = jax.device_put(dense.sim.reshape(-1))

    @functools.partial(jax.jit, static_argnames=("E", "Lmax", "C"))
    def stage_dp(cf, cs, E, Lmax, C):
        return _banded_dp(
            cf, cs, pcls_d, pnode_d, dep_d,
            ids_dense, np.int32(n), sim_d, node_ceil,
            max_pen, pens.substitution, pens.insertion, pens.deletion,
            pens.swap, engine.min_symbol_similarity,
            E, Lmax, C,
        )

    E = engine.max_edits_fast
    t, _ = bench_fn(stage_dp, cand_field, cand_start, E, vf.max_depth, dense.num_classes)
    print(f"banded_dp(CAND={CAND}): {t*1000:.1f} ms")

    CAND2 = 1 << 17
    t, _ = bench_fn(stage_dp, cand_field[:CAND2], cand_start[:CAND2], E, vf.max_depth, dense.num_classes)
    print(f"banded_dp(CAND={CAND2}): {t*1000:.1f} ms")


if __name__ == "__main__":
    main()
