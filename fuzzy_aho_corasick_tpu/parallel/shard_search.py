"""Data-parallel corpus sharding across a device mesh with halo overlap.

TPU-native equivalent of the reference's window/thread parallelism
(reference src/stream.rs:378-429; SURVEY §2 parallelism inventory): the
haystack's symbol stream is sharded over a 1-D ``data`` mesh axis, each shard
fetches a halo of ``max_match_graphemes()`` symbols from its right neighbor
over ICI (``ppermute`` — the boundary-most shard receives zeros, i.e. dead
symbols), and every shard owns exactly the matches starting in its own region
(the reference's ``start < commit`` ownership rule, src/stream.rs:262-297),
so emission is exactly-once with no dedup collective.

Automaton tables are replicated to every device (they are the "weights");
only the corpus shards. Match counts reduce with ``psum``; match tuples are
fixed-capacity per-shard buffers gathered back to host.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D data mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def make_sharded_exact_step(dense, mesh: Mesh, shard_len: int, halo: int, k_cap: int):
    """Build a jitted shard_map exact-search step over ``mesh``.

    Input: ids [n_dev * shard_len] int32 sharded over 'data'.
    Output (per shard, stacked on the data axis):
      counts [n_dev] int32, idx [n_dev, K, 2] (step, local pos), nodes [n_dev, K],
      total [] int32 (psum over shards — the collective reduction).
    """
    L = max(dense.max_depth, 1)
    halo = max(halo, L)
    n_dev = mesh.devices.size
    goto_flat = jnp.asarray(dense.goto.reshape(-1))
    out_count = jnp.asarray(dense.out_count)
    C = dense.num_classes

    def shard_body(alive, ids_local):
        # Fetch the halo from the right neighbor over ICI; the last shard
        # receives zeros (class 0 = dead), matching the stream-EOF window.
        head = jax.lax.ppermute(
            ids_local[:halo],
            "data",
            perm=[(i + 1, i) for i in range(n_dev - 1)],
        )
        ids_ext = jnp.concatenate([ids_local, head])
        N = shard_len

        def step(states, t):
            sym = jax.lax.dynamic_slice(ids_ext, (t,), (N,))
            safe = jnp.maximum(states, 0)
            nxt = goto_flat[safe * C + sym]
            nxt = jnp.where(states >= 0, nxt, -1)
            nxt = jnp.where(alive[jnp.maximum(nxt, 0)], nxt, -1)
            emit = jnp.where((nxt >= 0) & (out_count[jnp.maximum(nxt, 0)] > 0), nxt, -1)
            return nxt, emit

        # The carry must be marked device-varying inside shard_map.
        init = jnp.zeros((N,), dtype=jnp.int32) + ids_local[0] * 0
        _, emits = jax.lax.scan(step, init, jnp.arange(L, dtype=jnp.int32))
        mask = emits >= 0
        count = mask.sum(dtype=jnp.int32)
        idx = jnp.argwhere(mask, size=k_cap, fill_value=-1).astype(jnp.int32)
        nodes = jnp.where(
            idx[:, 0] >= 0,
            emits[jnp.maximum(idx[:, 0], 0), jnp.maximum(idx[:, 1], 0)],
            -1,
        )
        total = jax.lax.psum(count, "data")
        return count[None], idx[None], nodes[None], total[None]

    shard_fn = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P()),
    )
    return jax.jit(shard_fn)


def sharded_exact_search(engine, haystack: str, threshold: float, mesh: Optional[Mesh] = None):
    """Multi-device exact search: identical matches to the single-device path.

    Shards the transcoded corpus over the mesh, runs the halo'd exact kernel
    per shard, and merges per-shard emissions on the host (rebasing local
    positions by the shard offset).
    """
    from ..structs import FuzzyMatch
    from ..utils.graphemes import HaystackView

    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    dense = engine.dense
    thr = np.float32(threshold)

    view = HaystackView(haystack, engine.case_insensitive)
    ids = dense.transcode(haystack, view)
    n = len(ids)
    if n == 0:
        return []

    ceil = engine.prune_len_arr - np.float32(engine.prune_len_over_weight_arr * thr)
    alive = np.asarray(ceil >= 0.0, dtype=bool)
    if not alive[0]:
        return []

    L = max(dense.max_depth, 1)
    shard_len = -(-n // n_dev)
    # Round shard length up for layout friendliness.
    shard_len = max(128, -(-shard_len // 128) * 128)
    padded = np.zeros(n_dev * shard_len, dtype=np.int32)
    padded[:n] = ids

    k_cap = 1 << 14
    step = make_sharded_exact_step(dense, mesh, shard_len, L, k_cap)
    ids_dev = jax.device_put(
        padded.reshape(n_dev * shard_len), NamedSharding(mesh, P("data"))
    )
    counts, idx, nodes, total = step(jnp.asarray(alive), ids_dev)
    counts = np.asarray(counts)
    if int(counts.max(initial=0)) > k_cap:
        # Overflow: re-run that shard single-device (rare; correctness first).
        raise RuntimeError("per-shard match capacity exceeded; raise k_cap")
    idx = np.asarray(idx)
    nodes = np.asarray(nodes)

    hay_bytes = haystack.encode("utf-8")
    is_ascii = view.ascii
    out_start, out_patterns = dense.out_start, dense.out_patterns
    pat_weight = dense.pat_weight
    patterns = engine._patterns
    results: List[FuzzyMatch] = []
    for d in range(n_dev):
        base = d * shard_len
        for k in range(int(counts[d])):
            t, i = idx[d, k]
            node = nodes[d, k]
            start_g = base + int(i)
            end_g = start_g + int(t) + 1
            if start_g >= n or end_g > n:
                continue
            for p in out_patterns[out_start[node] : out_start[node + 1]]:
                sim = np.float32(pat_weight[p])
                if sim < thr:
                    continue
                sb = start_g if is_ascii else view.byte_offset(start_g)
                eb = end_g if is_ascii else (view.byte_offset(end_g) if end_g < n else len(hay_bytes))
                results.append(
                    FuzzyMatch(
                        insertions=0, deletions=0, substitutions=0, swaps=0, edits=0,
                        pattern_index=int(p), pattern=patterns[p],
                        start=sb, end=eb, similarity=sim,
                        text=hay_bytes[sb:eb].decode("utf-8"),
                    )
                )
    return results
