"""Device-path throughput floor as a TEST (VERDICT r3 item 9).

The reference encodes a performance property as CI (a pathological search
must finish < 2 s, src/tests.rs:815-864); this is the TPU analog: on a real
chip, warm exact scan must sustain >= 1 GB/s and warm fuzzy-E1 >= 500 MB/s
on a 24 MiB corpus. Regressions fail here instead of surfacing in a driver
bench rounds later. Skipped off-TPU and outside FAC_FULL_TESTS (slow mark).

Run on hardware with::

    FAC_REAL_DEVICE=1 FAC_FULL_TESTS=1 python -m pytest tests/test_perf_floor.py -q

(conftest keeps the real accelerator visible under FAC_REAL_DEVICE=1; set
FAC_JAX_CACHE to reuse the repo's persistent compile cache.)
"""

import time

import numpy as np
import pytest

from fuzzy_aho_corasick_tpu import FuzzyAhoCorasickBuilder, FuzzyLimits


def _on_tpu() -> bool:
    import jax

    try:
        return "TPU" in str(jax.devices()[0])
    except Exception:
        return False


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not _on_tpu(), reason="throughput floor needs a real TPU"),
]

DICT = [
    "tincidunt", "phaetra", "sollicitudin", "venenatis", "fringilla",
    "ullamcorper", "pellentesque", "sagittis", "condimentum", "habitasse",
]


def _corpus(nbytes: int) -> str:
    rng = np.random.default_rng(42)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "porta", "orci"]
    parts, size = [], 0
    while size < nbytes:
        w = words[int(rng.integers(len(words)))]
        if rng.integers(997) == 0:
            w = DICT[int(rng.integers(len(DICT)))]
        parts.append(w)
        size += len(w) + 1
    return " ".join(parts)


def _best_bps(engine, hay: str, thr: float, reps: int = 3) -> float:
    engine.search_raw(hay, thr)
    engine.search_raw(hay, thr)  # capacity ratchet-down recompile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        engine.search_raw(hay, thr)
        best = min(best, time.perf_counter() - t0)
    return len(hay) / best


def test_device_throughput_floor():
    hay = _corpus(24 << 20)
    exact = FuzzyAhoCorasickBuilder.new().case_insensitive(True).build(DICT)
    exact.backend = "device"
    exact_bps = _best_bps(exact, hay, 0.5)

    fuzzy = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(DICT)
    )
    fuzzy.backend = "device"
    fuzzy_bps = _best_bps(fuzzy, hay, 0.8)

    # Floors at ~70% of the round-5 measured numbers (exact ~1.9-2.2 GB/s,
    # fuzzy-E1 ~1.1-1.4 GB/s; 24 MiB pays relatively more fixed dispatch
    # latency than the 96 MiB bench corpus) — sub-2x regressions fail loudly
    # (VERDICT r4 item 9) while best-of-3 absorbs link variance.
    assert exact_bps >= 1.4e9, f"exact scan regressed: {exact_bps/1e6:.0f} MB/s"
    assert fuzzy_bps >= 0.8e9, f"fuzzy-E1 scan regressed: {fuzzy_bps/1e6:.0f} MB/s"


def test_device_throughput_floor_more_lanes():
    """Floors for the lanes with driver history since r04: beams (ride the
    exact DP lanes), the mapped DP lane, and the 1k-pattern chunked lane."""
    hay = _corpus(24 << 20)

    beamed = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .beam_width(500)
        .build(DICT)
    )
    beamed.backend = "device"
    beam_bps = _best_bps(beamed, hay, 0.8)
    assert beam_bps >= 0.55e9, f"beam500 regressed: {beam_bps/1e6:.0f} MB/s"

    mapped = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .mapping("rn", "m")
        .build(DICT + ["modern"])
    )
    mapped.backend = "device"
    mapped_bps = _best_bps(mapped, hay, 0.8)
    assert mapped_bps >= 0.28e9, f"mapped lane regressed: {mapped_bps/1e6:.0f} MB/s"

    rng = np.random.default_rng(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    many = sorted({
        "".join(alphabet[i] for i in rng.integers(0, 26, size=int(m)))
        for m in rng.integers(6, 12, size=1000)
    })
    meng = (
        FuzzyAhoCorasickBuilder.new()
        .fuzzy(FuzzyLimits.new().edits(1))
        .case_insensitive(True)
        .build(many)
    )
    meng.backend = "device"
    many_bps = _best_bps(meng, hay, 0.82)
    # Floor ~70% of the round-5 folded-layout number (272 MB/s measured);
    # a fall back to the plain chunking (~90 MB/s) fails this loudly.
    assert meng.last_stats.get("folded") is True, meng.last_stats
    assert many_bps >= 180e6, f"many1k lane regressed: {many_bps/1e6:.0f} MB/s"
