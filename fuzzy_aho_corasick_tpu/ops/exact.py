"""Exact-match (edits = 0) anchored scan kernel.

The reference's per-start-position BFS degenerates, with no edit budget, to a
pure trie walk per start (reference src/search.rs:776-798: only the exact
transition fires). On TPU that is one ``goto`` gather per (position, step):
every haystack position walks the trie in lockstep across vector lanes, and a
position's lane dies as soon as there is no edge (the overwhelmingly common
case after 1-2 steps, like the reference's 2-gram window skip).

Emission: steps where the reached node has outputs are compacted on-device
(count + fixed-size argwhere, grown on overflow) so only match tuples cross
the host link — the [L, N] trace never leaves HBM.

Matches the oracle exactly, including the per-node prune ceiling
``0 > prune_len - prune_len_over_weight * thr`` which can drop a match whose
similarity ties the threshold (f32 rounding — reference src/search.rs:637-642);
the ceiling is evaluated host-side per (threshold, node) and shipped as an
alive-mask.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

#: Positions per device dispatch (last chunk zero-padded).
CHUNK = 1 << 18


@functools.partial(jax.jit, static_argnames=("L", "K"))
def _exact_scan_kernel(goto_flat, C, out_count, alive, ids_pad, L, K):
    """One chunk: ids_pad [CHUNK + L] -> (count, idx [K,2], nodes [K]).

    idx rows are (step t, position i): the walk from start ``i`` reached an
    output node after consuming ``t + 1`` symbols.
    """
    N = ids_pad.shape[0] - L

    def step(states, t):
        sym = jax.lax.dynamic_slice(ids_pad, (t,), (N,))
        safe = jnp.maximum(states, 0)
        nxt = goto_flat[safe * C + sym]
        nxt = jnp.where(states >= 0, nxt, -1)
        nxt = jnp.where(alive[jnp.maximum(nxt, 0)], nxt, -1)
        emit = jnp.where((nxt >= 0) & (out_count[jnp.maximum(nxt, 0)] > 0), nxt, -1)
        return nxt, emit

    init = jnp.zeros((N,), dtype=jnp.int32)
    _, emits = jax.lax.scan(step, init, jnp.arange(L, dtype=jnp.int32))
    mask = emits >= 0
    count = mask.sum(dtype=jnp.int32)
    idx = jnp.argwhere(mask, size=K, fill_value=-1).astype(jnp.int32)
    nodes = jnp.where(idx[:, 0] >= 0, emits[jnp.maximum(idx[:, 0], 0), jnp.maximum(idx[:, 1], 0)], -1)
    return count, idx, nodes


def exact_search_device(engine, haystack: str, threshold: float, view=None) -> List["FuzzyMatch"]:
    """Device exact search: oracle-identical match list (unsorted)."""
    from ..structs import FuzzyMatch, f32
    from ..utils.graphemes import HaystackView

    dense = engine.dense
    thr = np.float32(threshold)

    if view is None:
        view = HaystackView(haystack, engine.case_insensitive)
    ids = dense.transcode(haystack, view)
    n = len(ids)
    if n == 0:
        return []

    # Per-threshold node alive-mask (prune ceiling with zero penalty).
    ceil = engine.prune_len_arr - np.float32(engine.prune_len_over_weight_arr * thr)
    alive = np.asarray(ceil >= 0.0, dtype=bool)
    if not alive[0]:
        return []

    L = max(dense.max_depth, 1)
    goto_flat = jnp.asarray(dense.goto.reshape(-1))
    out_count = jnp.asarray(dense.out_count)
    alive_j = jnp.asarray(alive)
    C = dense.num_classes

    hay_bytes = haystack.encode("utf-8")
    is_ascii = view.ascii
    out_start = dense.out_start
    out_patterns = dense.out_patterns
    pat_weight = dense.pat_weight
    patterns = engine._patterns

    results: List[FuzzyMatch] = []
    for c0 in range(0, n, CHUNK):
        chunk_ids = np.zeros(CHUNK + L, dtype=np.int32)
        src = ids[c0 : min(n, c0 + CHUNK + L)]
        chunk_ids[: len(src)] = src
        valid_n = min(CHUNK, n - c0)

        K = 4096
        while True:
            count, idx, nodes = _exact_scan_kernel(
                goto_flat, C, out_count, alive_j, jnp.asarray(chunk_ids), L, K
            )
            count = int(count)
            if count <= K:
                break
            K = 1 << (count - 1).bit_length()
        idx = np.asarray(idx[:count])
        nodes = np.asarray(nodes[:count])

        for (t, i), node in zip(idx, nodes):
            if i >= valid_n:
                continue  # halo start owned by the next chunk
            start_g = c0 + int(i)
            end_g = start_g + int(t) + 1
            if end_g > n:
                continue  # walked into zero padding (can't happen: class 0 is dead)
            for p in out_patterns[out_start[node] : out_start[node + 1]]:
                sim = np.float32(pat_weight[p])
                if sim < thr:
                    continue
                sb = start_g if is_ascii else view.byte_offset(start_g)
                eb = (
                    end_g
                    if is_ascii
                    else (view.byte_offset(end_g) if end_g < n else len(hay_bytes))
                )
                results.append(
                    FuzzyMatch(
                        insertions=0,
                        deletions=0,
                        substitutions=0,
                        swaps=0,
                        edits=0,
                        pattern_index=int(p),
                        pattern=patterns[p],
                        start=sb,
                        end=eb,
                        similarity=sim,
                        text=hay_bytes[sb:eb].decode("utf-8"),
                    )
                )
    return results
