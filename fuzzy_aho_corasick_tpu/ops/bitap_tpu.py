"""Pallas TPU kernel: bit-parallel shift-AND scan, chunk-per-lane.

The north-star formulation (BASELINE.json): the reference's scalar u64
recurrence (src/prefilter.rs:410-435) becomes a vectorized mask pass where
every VPU lane runs the recurrence over its own corpus chunk (the same
``m + k`` warm-up halo decomposition as
:func:`fuzzy_aho_corasick_tpu.ops.bitap.bitap_windows_chunked`, so results
are identical). 64-bit states are a pair of u32 limbs (TPUs have no native
u64).

Division of labor (shaped by what Mosaic lowers well on v5e — its gather
crashes the AOT compiler, so no gathers inside the kernel):

* **XLA stage**: the per-position mask words ``bc = mask[sym]`` are computed
  with exact byte-plane one-hot matmuls (8 planes of 8 bits each, values
  <= 255 so bf16 stays exact) — MXU work, ~0.5 ms per million symbols.
* **Pallas stage**: the sequential ``k + 1``-row recurrence over each lane's
  chunk — pure u32 bitwise VPU ops on VMEM blocks, recurrence state in
  persistent scratch across the sequential grid.

The host wrapper lays the corpus out lane-major (column ``l`` covers
``[l*chunk - halo, l*chunk + chunk)``) with a zero-filled first halo — zeros
are symbol id 0 ("other", matches nothing), and the fresh-start state
``(1 << d) - 1`` is a fixpoint under zero symbols, so chunk boundaries are
exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Max vector lanes (independent chunks) per kernel invocation; the wrapper
#: scales lanes down so each lane's chunk stays >= the warm-up halo, and
#: derives rows-per-block from a VMEM budget.
NL_MAX = 32768
VMEM_BLOCK_BYTES = 4 << 20


def _derive_layout(n: int, halo: int):
    nl = NL_MAX
    while nl > 128 and -(-n // nl) < halo:
        nl //= 2
    chunk = -(-n // nl)
    tb = max(8, VMEM_BLOCK_BYTES // (nl * 8))
    rows_needed = halo + chunk
    grid = -(-rows_needed // tb)
    return nl, tb, chunk, grid


def _shl1(lo, hi):
    one = jnp.uint32(1)
    return lo << one, (hi << one) | jax.lax.shift_right_logical(lo, jnp.uint32(31))


def _bitap_kernel_factory(k: int, NL: int, TB: int):
    def kern(match_lo_ref, match_hi_ref, bc_lo_ref, bc_hi_ref, hits_ref, rlo_ref, rhi_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            # Fresh-start state: d free deletions -> low d bits set (k <= 24
            # so the init fits the low limb).
            for d in range(k + 1):
                rlo_ref[d, :] = jnp.full((NL,), np.uint32((1 << d) - 1), jnp.uint32)
                rhi_ref[d, :] = jnp.zeros((NL,), jnp.uint32)

        match_lo = match_lo_ref[0, :]
        match_hi = match_hi_ref[0, :]

        def body(t, _):
            bc_lo = bc_lo_ref[t, :]
            bc_hi = bc_hi_ref[t, :]
            one = jnp.uint32(1)

            prev_lo = rlo_ref[0, :]
            prev_hi = rhi_ref[0, :]
            s_lo, s_hi = _shl1(prev_lo, prev_hi)
            n0_lo = (s_lo | one) & bc_lo
            n0_hi = s_hi & bc_hi
            new_lo = [n0_lo]
            new_hi = [n0_hi]
            for d in range(1, k + 1):
                rd_lo = rlo_ref[d, :]
                rd_hi = rhi_ref[d, :]
                a_lo, a_hi = _shl1(rd_lo, rd_hi)
                a_lo &= bc_lo
                a_hi &= bc_hi
                u_lo = prev_lo | new_lo[d - 1]
                u_hi = prev_hi | new_hi[d - 1]
                b_lo, b_hi = _shl1(u_lo, u_hi)
                new_lo.append(a_lo | b_lo | prev_lo | one)
                new_hi.append(a_hi | b_hi | prev_hi)
                prev_lo, prev_hi = rd_lo, rd_hi
            for d in range(k + 1):
                rlo_ref[d, :] = new_lo[d]
                rhi_ref[d, :] = new_hi[d]
            hit = ((new_lo[k] & match_lo) | (new_hi[k] & match_hi)) != jnp.uint32(0)
            hits_ref[t, :] = hit.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, TB, body, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("k", "grid", "interpret", "A", "NL", "TB"))
def _bitap_scan(mask_planes, match_lo, match_hi, ids_rows, k, grid, interpret, A, NL, TB):
    """ids_rows [grid*TB, NL] uint8 -> hit flags [grid*TB, NL] int32.

    ``mask_planes`` [8, A] float32: byte planes of the per-symbol u64 masks.
    """
    rows = ids_rows.shape[0]
    sym = ids_rows.astype(jnp.int32)

    # XLA stage: bc words via exact one-hot byte-plane matmuls on the MXU.
    oh = jax.nn.one_hot(sym.reshape(-1), A, dtype=jnp.bfloat16)
    planes = jnp.einsum(
        "nc,pc->pn", oh, mask_planes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint32)
    p = planes.reshape(8, rows, NL)
    e8 = jnp.uint32(8)
    bc_lo = p[0] | (p[1] << e8) | (p[2] << (e8 + e8)) | (p[3] << jnp.uint32(24))
    bc_hi = p[4] | (p[5] << e8) | (p[6] << (e8 + e8)) | (p[7] << jnp.uint32(24))

    kern = _bitap_kernel_factory(k, NL, TB)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, NL), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, NL), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, NL), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, NL), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, NL), lambda g: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k + 1, NL), jnp.uint32),
            pltpu.VMEM((k + 1, NL), jnp.uint32),
        ],
        interpret=interpret,
    )(match_lo, match_hi, bc_lo, bc_hi)


def _mask_planes_of(mask: np.ndarray) -> np.ndarray:
    mask_u = mask.astype(np.uint64)
    return np.stack(
        [((mask_u >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.float32) for b in range(8)]
    )


def _match_rows(m: int, NL: int):
    mbit = 1 << (m - 1)
    return (
        np.full((1, NL), mbit & 0xFFFFFFFF, dtype=np.uint32),
        np.full((1, NL), (mbit >> 32) & 0xFFFFFFFF, dtype=np.uint32),
    )


def bitap_hits_tpu(
    mask: np.ndarray, m: int, k: int, ids: np.ndarray, interpret: bool = False
) -> Optional[np.ndarray]:
    """Hit flags per end position (1 = some window of Levenshtein distance
    <= k ends at i+1), identical to the scalar scan. Returns None when the
    configuration doesn't fit the kernel. (Testing entry point; production
    uses :func:`bitap_anchors_tpu`.)"""
    A = len(mask)
    if A > 256 or k > 24 or not (1 <= m <= 63):
        return None
    n = len(ids)
    if n == 0:
        return np.zeros(0, dtype=np.int8)
    halo = m + k
    NL, TB, chunk, grid = _derive_layout(n, halo)
    rows = grid * TB

    buf = np.zeros(halo + NL * chunk + 1, dtype=np.uint8)
    buf[halo : halo + n] = np.ascontiguousarray(ids, dtype=np.uint8)
    view = np.lib.stride_tricks.as_strided(
        buf, shape=(halo + chunk, NL), strides=(1, chunk), writeable=False
    )
    lanes = np.zeros((rows, NL), dtype=np.uint8)
    lanes[: halo + chunk] = view

    match_lo, match_hi = _match_rows(m, NL)
    hits = _bitap_scan(
        jnp.asarray(_mask_planes_of(mask)), jnp.asarray(match_lo), jnp.asarray(match_hi),
        jnp.asarray(lanes), k, grid, interpret, A, NL, TB,
    )
    hits = np.asarray(hits)  # [rows, NL]
    flat = hits[halo : halo + chunk].T.reshape(-1)[:n]
    return flat.astype(np.int8)


@functools.partial(
    jax.jit, static_argnames=("k", "grid", "A", "chunk", "halo", "NL", "TB")
)
def _bitap_hits_stream(
    mask_planes, match_lo, match_hi, ids_pad, k, grid, A, chunk, halo, NL, TB
):
    """Stream-order ids [NL*chunk] uint8 -> hit flags [NL*chunk] int32, one
    dispatch per pattern.

    Builds the lane-major layout on-device (reshape + transpose + a one-lane
    shift for the halo rows — the host-side strided copy was the measured
    bottleneck) and runs the Pallas recurrence.
    """
    rows = grid * TB
    main = ids_pad.reshape(NL, chunk).T                      # [chunk, NL]
    tail = main[chunk - halo :, :]                           # [halo, NL]
    halo_blk = jnp.concatenate(
        [jnp.zeros((halo, 1), ids_pad.dtype), tail[:, :-1]], axis=1
    )                                                        # lane l gets lane l-1's tail
    lanes = jnp.concatenate([halo_blk, main], axis=0)        # [halo+chunk, NL]
    lanes = jnp.pad(lanes, ((0, rows - halo - chunk), (0, 0)))

    hits = _bitap_scan(mask_planes, match_lo, match_hi, lanes, k, grid, False, A, NL, TB)
    return hits[halo : halo + chunk].T.reshape(-1)


@functools.partial(jax.jit, static_argnames=("n", "span_pad", "KA"))
def _cover_extract(hits_flat, span, n, span_pad, KA):
    """Dilate OR'd hit flags into anchor coverage and compact the anchors.

    A hit at stream index j marks end position j+1 with anchors
    [j+1-span, j+1), so position i is covered iff any hit in [i, i+span) —
    computed with slice shifts of the prefix sum (XLA gathers measured 20x
    slower than slices on this path).
    """
    flat = hits_flat[:n]
    c = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(flat, dtype=jnp.int32)]
    )  # c[x] = hits in [0, x)
    cpad = jnp.concatenate([c, jnp.full(span_pad, c[n], jnp.int32)])
    hi = jax.lax.dynamic_slice(cpad, (span,), (n,))
    covered = (hi - c[:n]) > 0
    count = covered.sum(dtype=jnp.int32)
    anchors = jnp.argwhere(covered, size=KA, fill_value=-1).astype(jnp.int32)[:, 0]
    return count, anchors


def bitap_anchors_tpu(patterns_mk_masks, ids: np.ndarray) -> Optional[np.ndarray]:
    """Candidate anchor positions for a set of patterns, fully on-device.

    ``patterns_mk_masks``: list of (m, k, mask u64 array). Runs the Pallas
    shift-AND per pattern, ORs the dilated coverages on device, and reads
    back only the compacted anchor indices. Returns None when any pattern
    doesn't fit the kernel.
    """
    n = len(ids)
    if n == 0:
        return np.zeros(0, np.int32)
    for m, k, mask in patterns_mk_masks:
        A = len(mask)
        if A > 256 or k > 24 or not (1 <= m <= 63):
            return None

    halo = max(m + k for m, k, _ in patterns_mk_masks)
    NL, TB, chunk, grid = _derive_layout(n, halo)

    # Upload the stream once (uint8); the lane-major layout is built on
    # device inside the per-pattern dispatch.
    ids_pad = np.zeros(NL * chunk, dtype=np.uint8)
    ids_pad[:n] = ids
    ids_dev = jax.device_put(ids_pad)

    # OR the raw hit flags across patterns on device, then dilate once with
    # the maximum span (a conservative widening for shorter patterns — the
    # anchor set stays a superset, results unchanged).
    hits_any = None
    for m, k, mask in patterns_mk_masks:
        A = len(mask)
        match_lo, match_hi = _match_rows(m, NL)
        hits = _bitap_hits_stream(
            jnp.asarray(_mask_planes_of(mask)), jnp.asarray(match_lo),
            jnp.asarray(match_hi), ids_dev, k, grid, A, chunk, halo, NL, TB,
        )
        hits_any = hits if hits_any is None else (hits_any | hits)

    span_pad = 63 + 24 + 1
    KA = 1 << 15
    while True:
        count, anchors = _cover_extract(hits_any, np.int32(halo), n, span_pad, KA)
        count = int(count)
        if count <= KA:
            break
        KA = 1 << (count - 1).bit_length()
    return np.asarray(anchors[:count])
