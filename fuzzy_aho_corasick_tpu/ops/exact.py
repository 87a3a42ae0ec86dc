"""Exact-match (edits = 0) anchored scan kernel.

The reference's per-start-position BFS degenerates, with no edit budget, to a
pure trie walk per start (reference src/search.rs:776-798: only the exact
transition fires). On TPU that is one ``goto`` gather per (position, step):
every haystack position walks the trie in lockstep across vector lanes, and a
position's lane dies as soon as there is no edge (the overwhelmingly common
case after 1-2 steps, like the reference's 2-gram window skip).

Dispatch structure: the whole corpus ships to the device in ONE call as a
``[rows, CHUNK + L]`` tile of (uint8 when possible) symbol ids with per-row
halos; ``lax.map`` walks the rows on-device, and each row compacts its own
emissions (count + fixed-size argwhere) so only match tuples cross the host
link. Per-call host<->device round trips — the dominant cost through the
remote-TPU tunnel — are O(1) per corpus instead of O(corpus / chunk).

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

#: Positions per row (rows are processed sequentially on-device).
CHUNK = 1 << 20
#: Default per-row emission capacity.
K_DEFAULT = 1 << 15


@functools.partial(jax.jit, static_argnames=("L", "K"))
def _exact_scan_rows(goto_flat, C, out_count, alive, ids_rows, L, K):
    """All rows in one dispatch: ids_rows [R, CHUNK+L] -> per-row
    (count, idx [K, 2], nodes [K])."""
    N = ids_rows.shape[1] - L

    def row_fn(ids_pad):
        ids_pad = ids_pad.astype(jnp.int32)

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
        nodes = jnp.where(
            idx[:, 0] >= 0,
            emits[jnp.maximum(idx[:, 0], 0), jnp.maximum(idx[:, 1], 0)],
            -1,
        )
        return count, idx, nodes

    return jax.lax.map(row_fn, ids_rows)


def _rows_of(ids: np.ndarray, chunk: int, halo: int, dtype) -> np.ndarray:
    """Cut [n] ids into [R, chunk + halo] overlapping rows (zero-padded)."""
    n = len(ids)
    rows = -(-n // chunk)
    out = np.zeros((rows, chunk + halo), dtype=dtype)
    for r in range(rows):
        src = ids[r * chunk : min(n, r * chunk + chunk + halo)]
        out[r, : len(src)] = src
    return out


def exact_search_device(engine, haystack: str, threshold: float, view=None) -> List["FuzzyMatch"]:
    """Device exact search: oracle-identical match list (unsorted)."""
    from ..structs import FuzzyMatch
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
    chunk = min(CHUNK, 1 << max(10, (n - 1).bit_length()))
    dtype = np.uint8 if dense.num_classes <= 256 else np.int32
    ids_rows = _rows_of(ids, chunk, L, dtype)

    goto_flat = jnp.asarray(dense.goto.reshape(-1))
    out_count = jnp.asarray(dense.out_count)
    alive_j = jnp.asarray(alive)
    C = dense.num_classes

    K = K_DEFAULT
    while True:
        counts, idx, nodes = _exact_scan_rows(
            goto_flat, C, out_count, alive_j, jnp.asarray(ids_rows), L, K
        )
        counts = np.asarray(counts)
        cmax = int(counts.max(initial=0))
        if cmax <= K:
            break
        K = 1 << (cmax - 1).bit_length()
    idx = np.asarray(idx)
    nodes = np.asarray(nodes)

    hay_bytes = haystack.encode("utf-8")
    is_ascii = view.ascii
    out_start = dense.out_start
    out_patterns = dense.out_patterns
    pat_weight = dense.pat_weight
    patterns = engine._patterns

    results: List[FuzzyMatch] = []
    for r in range(ids_rows.shape[0]):
        base = r * chunk
        valid_n = min(chunk, n - base)
        for k in range(int(counts[r])):
            t, i = idx[r, k]
            if i >= valid_n:
                continue  # halo start owned by the next row
            node = nodes[r, k]
            start_g = base + int(i)
            end_g = start_g + int(t) + 1
            if end_g > n:
                continue
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
