"""Compile-light device compaction primitives.

XLA's ``argwhere``/scatter lowerings each cost ~16 s of TPU compile time and
run a serial cumsum, which dominated both compile and runtime of the scan
kernels (each kernel had several, and capacity retries recompiled them).
These replacements use only matmuls, slices, and gathers:

* :func:`cumsum_i32` — inclusive prefix sum as 128-wide blocked matmuls
  against a triangular ones matrix (the classic MXU prefix-sum trick), with
  f32 accumulation kept exact by construction (every 128-block partial sum
  stays < 2^24 for flag-like inputs up to 2^28 elements).
* :func:`compact_indices` — stream compaction (``argwhere`` equivalent) via
  ``searchsorted`` over the prefix sum: a binary-search *gather* per output
  slot instead of a data-sized scatter.
* :func:`dilate_any` — windowed any() (hit dilation) by logarithmic shifted
  ORs instead of a prefix-sum difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TRI = None


def _tri():
    """Upper-triangular ones U[k, j] = 1 for k <= j, so (x @ U) is an
    inclusive prefix sum along the row."""
    global _TRI
    if _TRI is None:
        _TRI = np.triu(np.ones((128, 128), np.float32))
    return jnp.asarray(_TRI)


def cumsum_i32(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum of int32 flags (values 0/1; exact for any input
    whose every 128-block partial sum < 2^24). Supports n <= 2^28."""
    n = x.shape[0]
    if n <= 16384:
        return jnp.cumsum(x, dtype=jnp.int32)
    assert n <= (1 << 28), "cumsum_i32 supports at most 2^28 elements"
    pad = (-n) % 128
    y = jnp.pad(x, (0, pad)).reshape(-1, 128).astype(jnp.float32)
    intra = jnp.dot(y, _tri(), precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    rows = intra[:, -1]
    offs = cumsum_i32(rows)
    offs_excl = jnp.concatenate([jnp.zeros(1, jnp.int32), offs[:-1]])
    return (intra + offs_excl[:, None]).reshape(-1)[:n]


def _bsearch_left(c: jax.Array, q: jax.Array) -> jax.Array:
    """Leftmost index where ``c[idx] >= q`` for sorted int32 ``c`` — a manual
    ``fori_loop`` binary search (log2(n) gathers). ``jnp.searchsorted``
    compiles for minutes on TPU; this compiles in seconds."""
    n = c.shape[0]
    iters = max(1, int(np.ceil(np.log2(n + 1))))
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        go_right = c[jnp.minimum(mid, n - 1)] < q
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def compact_indices(flags: jax.Array, K: int):
    """Positions of set flags, compacted into ``K`` slots.

    Returns ``(count, idx)`` where ``idx[j]`` is the position of the j-th set
    flag (ascending) and slots past ``count`` are -1. ``count`` may exceed
    ``K`` — the caller detects overflow and retries with a larger ``K``.
    """
    c = cumsum_i32(flags.astype(jnp.int32))
    count = c[-1]
    q = jnp.arange(1, K + 1, dtype=jnp.int32)
    pos = _bsearch_left(c, q)
    return count, jnp.where(q <= count, pos, -1)


def dilate_any(flags: jax.Array, span: int) -> jax.Array:
    """``out[i] = any(flags[i : i + span])`` for int32/bool flags (static span)."""
    if span <= 1:
        return flags
    f = flags
    d = 1
    while d < span:
        s = min(d, span - d)
        f = f | jnp.concatenate([f[s:], jnp.zeros((s,), f.dtype)])
        d += s
    return f
